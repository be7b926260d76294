"""Import reference (PyTorch) checkpoints into the Flax models.

The reference publishes pretrained checkpoints on Hugging Face
(README.md:28-32) consumed by the downstream ocrs engine; these mappers
convert a torch ``state_dict`` (as produced by the reference's
``save_checkpoint``, train_detection.py:198-206) into this package's
Flax variable trees with exact numerics, enabling the ≤1% CER/IoU parity
gate and zero-retrain migration.

Layout conventions:
- torch Conv2d weight ``[O, I/g, kh, kw]``  -> flax HWIO ``[kh, kw, I/g, O]``
- torch ConvTranspose2d weight ``[I, O, kh, kw]`` -> flax (with
  ``transpose_kernel=True``) ``[kh, kw, O, I]``
- torch Linear ``[O, I]`` -> flax ``[I, O]``
- torch GRU ``weight_{ih,hh}_l{k}[_reverse]`` ``[3H, F]`` -> ``[F, 3H]``
- torch BatchNorm weight/bias/running_mean/running_var -> flax
  scale/bias (params) + mean/var (batch_stats)

No torch import is required here: values may be torch CPU tensors, numpy
arrays, or anything ``np.asarray`` accepts.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv(sd: Mapping[str, Any], key: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _conv_transpose(sd: Mapping[str, Any], key: str) -> dict:
    # [I, O, kh, kw] -> [kh, kw, O, I] (flax transpose_kernel=True layout).
    return {
        "kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _dense(sd: Mapping[str, Any], key: str) -> dict:
    return {
        "kernel": _np(sd[f"{key}.weight"]).T,
        "bias": _np(sd[f"{key}.bias"]),
    }


def _bn(sd: Mapping[str, Any], key: str) -> tuple[dict, dict]:
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }
    return params, stats


def _depthwise_block(sd: Mapping[str, Any], key: str) -> tuple[dict, dict]:
    """Reference DepthwiseConv: .seq.0 3x3 grouped conv (no bias), .seq.1
    1x1 pointwise (no bias), .seq.2 BN. The flax block stores the depthwise
    kernel as HWIO [3,3,1,C] and the pointwise kernel as a [C, O] matrix."""
    bn_p, bn_s = _bn(sd, f"{key}.seq.2")
    pw = _np(sd[f"{key}.seq.1.weight"])  # [O, C, 1, 1]
    params = {
        "dw_kernel": _np(sd[f"{key}.seq.0.weight"]).transpose(2, 3, 1, 0),
        "pw_kernel": pw[:, :, 0, 0].T,
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def _double_conv(sd: Mapping[str, Any], key: str) -> tuple[dict, dict]:
    p0, s0 = _depthwise_block(sd, f"{key}.seq.0")
    p1, s1 = _depthwise_block(sd, f"{key}.seq.1")
    return {"conv0": p0, "conv1": p1}, {"conv0": s0, "conv1": s1}


def import_detection_state_dict(sd: Mapping[str, Any], n_levels: int = 6) -> dict:
    """Torch DetectionModel state_dict -> flax variables dict."""
    params: dict = {}
    stats: dict = {}
    params["in_conv"], stats["in_conv"] = _double_conv(sd, "in_conv")
    for i in range(n_levels):
        params[f"down_{i}"], stats[f"down_{i}"] = _double_conv(sd, f"down.{i}.seq.0")
        up_p, up_s = _double_conv(sd, f"up.{i}.contract")
        params[f"up_{i}"] = {
            "up": _conv_transpose(sd, f"up.{i}.up"),
            "contract": up_p,
        }
        stats[f"up_{i}"] = {"contract": up_s}
    params["out_conv"] = _conv(sd, "out_conv.0")
    return {"params": params, "batch_stats": stats}


_REC_CONVS = {
    "conv0": ("conv.0", True),
    "conv3": ("conv.3", False),
    "conv7": ("conv.7", True),
    "conv9": ("conv.9", False),
    "conv13": ("conv.13", True),
    "conv15": ("conv.15", False),
    "conv19": ("conv.19", False),
}
_REC_BNS = {"bn4": "conv.4", "bn10": "conv.10", "bn16": "conv.16", "bn20": "conv.20"}


def import_recognition_state_dict(sd: Mapping[str, Any], gru_layers: int = 2) -> dict:
    """Torch RecognitionModel state_dict -> flax variables dict."""
    params: dict = {}
    stats: dict = {}
    for name, (tkey, bias) in _REC_CONVS.items():
        params[name] = _conv(sd, tkey, bias=bias)
    for name, tkey in _REC_BNS.items():
        params[name], stats[name] = _bn(sd, tkey)

    gru: dict = {}
    for layer in range(gru_layers):
        lp = {}
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            lp[f"w_ih_{direction}"] = _np(sd[f"gru.weight_ih_l{layer}{suffix}"]).T
            lp[f"w_hh_{direction}"] = _np(sd[f"gru.weight_hh_l{layer}{suffix}"]).T
            lp[f"b_ih_{direction}"] = _np(sd[f"gru.bias_ih_l{layer}{suffix}"])
            lp[f"b_hh_{direction}"] = _np(sd[f"gru.bias_hh_l{layer}{suffix}"])
        gru[f"layer_{layer}"] = lp
    params["gru"] = gru
    params["output"] = _dense(sd, "output.0")
    return {"params": params, "batch_stats": stats}


def import_layout_state_dict(
    sd: Mapping[str, Any], n_layers: int = 6, pos_embedding: str = "sin"
) -> dict:
    """Torch LayoutModel state_dict -> flax variables dict."""
    params: dict = {}
    if pos_embedding == "mlp":
        params["embed0"] = _dense(sd, "embed.0")
        params["embed1"] = _dense(sd, "embed.2")
    for i in range(n_layers):
        base = f"encode.layers.{i}"
        params[f"layer_{i}"] = {
            "qkv_kernel": _np(sd[f"{base}.self_attn.in_proj_weight"]).T,
            "qkv_bias": _np(sd[f"{base}.self_attn.in_proj_bias"]),
            "out_proj": _dense(sd, f"{base}.self_attn.out_proj"),
            "linear1": _dense(sd, f"{base}.linear1"),
            "linear2": _dense(sd, f"{base}.linear2"),
            "norm1": {
                "scale": _np(sd[f"{base}.norm1.weight"]),
                "bias": _np(sd[f"{base}.norm1.bias"]),
            },
            "norm2": {
                "scale": _np(sd[f"{base}.norm2.weight"]),
                "bias": _np(sd[f"{base}.norm2.bias"]),
            },
        }
    params["classify"] = _dense(sd, "classify")
    return {"params": params}

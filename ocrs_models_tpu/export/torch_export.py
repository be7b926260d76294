"""Export Flax variables back to reference-format torch state_dicts.

The inverse of :mod:`torch_import`: checkpoints trained here can be handed
to the reference's own ONNX-export path (train_*.py ``--export``) and the
downstream ocrs/rten engine without retraining. Round-trip
(import -> export -> import) is identity, which the tests assert.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from .torch_import import _REC_BNS, _REC_CONVS


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _conv_out(p: Mapping[str, Any], key: str, out: dict, bias: bool = True) -> None:
    out[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if bias:
        out[f"{key}.bias"] = _np(p["bias"])


def _conv_transpose_out(p: Mapping[str, Any], key: str, out: dict) -> None:
    out[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    out[f"{key}.bias"] = _np(p["bias"])


def _dense_out(p: Mapping[str, Any], key: str, out: dict) -> None:
    out[f"{key}.weight"] = _np(p["kernel"]).T
    out[f"{key}.bias"] = _np(p["bias"])


def _bn_out(p: Mapping[str, Any], s: Mapping[str, Any], key: str, out: dict) -> None:
    out[f"{key}.weight"] = _np(p["scale"])
    out[f"{key}.bias"] = _np(p["bias"])
    out[f"{key}.running_mean"] = _np(s["mean"])
    out[f"{key}.running_var"] = _np(s["var"])
    out[f"{key}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _depthwise_out(p, s, key: str, out: dict) -> None:
    out[f"{key}.seq.0.weight"] = _np(p["dw_kernel"]).transpose(3, 2, 0, 1)
    out[f"{key}.seq.1.weight"] = _np(p["pw_kernel"]).T[:, :, None, None]
    _bn_out(p["bn"], s["bn"], f"{key}.seq.2", out)


def _double_conv_out(p, s, key: str, out: dict) -> None:
    _depthwise_out(p["conv0"], s["conv0"], f"{key}.seq.0", out)
    _depthwise_out(p["conv1"], s["conv1"], f"{key}.seq.1", out)


def export_detection_state_dict(variables: Mapping[str, Any], n_levels: int = 6) -> dict:
    p, s = variables["params"], variables["batch_stats"]
    out: dict = {}
    _double_conv_out(p["in_conv"], s["in_conv"], "in_conv", out)
    for i in range(n_levels):
        _double_conv_out(p[f"down_{i}"], s[f"down_{i}"], f"down.{i}.seq.0", out)
        _conv_transpose_out(p[f"up_{i}"]["up"], f"up.{i}.up", out)
        _double_conv_out(
            p[f"up_{i}"]["contract"], s[f"up_{i}"]["contract"], f"up.{i}.contract", out
        )
    _conv_out(p["out_conv"], "out_conv.0", out)
    return out


def export_recognition_state_dict(
    variables: Mapping[str, Any], gru_layers: int = 2
) -> dict:
    p, s = variables["params"], variables["batch_stats"]
    out: dict = {}
    for name, (tkey, bias) in _REC_CONVS.items():
        _conv_out(p[name], tkey, out, bias=bias)
    for name, tkey in _REC_BNS.items():
        _bn_out(p[name], s[name], tkey, out)
    for layer in range(gru_layers):
        lp = p["gru"][f"layer_{layer}"]
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            out[f"gru.weight_ih_l{layer}{suffix}"] = _np(lp[f"w_ih_{direction}"]).T
            out[f"gru.weight_hh_l{layer}{suffix}"] = _np(lp[f"w_hh_{direction}"]).T
            out[f"gru.bias_ih_l{layer}{suffix}"] = _np(lp[f"b_ih_{direction}"])
            out[f"gru.bias_hh_l{layer}{suffix}"] = _np(lp[f"b_hh_{direction}"])
    _dense_out(p["output"], "output.0", out)
    return out


def export_layout_state_dict(
    variables: Mapping[str, Any], n_layers: int = 6, pos_embedding: str = "sin"
) -> dict:
    p = variables["params"]
    out: dict = {}
    if pos_embedding == "mlp":
        _dense_out(p["embed0"], "embed.0", out)
        _dense_out(p["embed1"], "embed.2", out)
    for i in range(n_layers):
        lp = p[f"layer_{i}"]
        base = f"encode.layers.{i}"
        out[f"{base}.self_attn.in_proj_weight"] = _np(lp["qkv_kernel"]).T
        out[f"{base}.self_attn.in_proj_bias"] = _np(lp["qkv_bias"])
        _dense_out(lp["out_proj"], f"{base}.self_attn.out_proj", out)
        _dense_out(lp["linear1"], f"{base}.linear1", out)
        _dense_out(lp["linear2"], f"{base}.linear2", out)
        out[f"{base}.norm1.weight"] = _np(lp["norm1"]["scale"])
        out[f"{base}.norm1.bias"] = _np(lp["norm1"]["bias"])
        out[f"{base}.norm2.weight"] = _np(lp["norm2"]["scale"])
        out[f"{base}.norm2.bias"] = _np(lp["norm2"]["bias"])
    _dense_out(p["classify"], "classify", out)
    return out

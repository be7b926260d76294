"""U-Net text detection model.

Same capability as the reference's ``DetectionModel`` (models.py:93-143):
greyscale page in, per-pixel text probability out, depthwise-separable convs
with channel progression (8, 16, 32, 32, 64, 128, 256). Re-designed
TPU-first: optional bfloat16 compute (params and batch-norm statistics stay
float32), static shapes under jit, and a **layout policy**: TPU vector
lanes map to the trailing axis, so the high-resolution levels (8-32
channels — where NHWC would use 8/128 lanes) run channels-first with the
depthwise 3x3 expressed as nine shifted multiply-adds over full [H, W]
planes and the pointwise 1x1 as an einsum over channels; the deep levels
(64-256 channels) run standard NHWC convolutions. Both paths share one
parameter set (kernels stored in HWIO), so checkpoints are layout-agnostic
and reference imports are unaffected.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# Levels with at most this many channels run channels-first.
_CHANNELS_FIRST_MAX = 32


def _dw_init(key, shape, dtype=jnp.float32):
    # lecun_normal over the depthwise kernel's receptive field (fan_in = 9),
    # matching nn.Conv's default for grouped kernels.
    return nn.initializers.lecun_normal()(key, shape, dtype)


class BatchNormLite(nn.Module):
    """Batch norm with float32 statistics but activation-dtype traffic.

    ``nn.BatchNorm(dtype=float32)`` forces every normalize pass to move f32
    activations — at 800x600 that traffic dominates the detection step.
    Here the batch statistics (and running stats, torch momentum/eps
    semantics) are computed in f32 from the bf16 activations, but the
    normalize/affine math runs in the activation dtype. Parameter and
    batch-stats tree structure matches nn.BatchNorm (scale/bias, mean/var)
    so checkpoints are interchangeable.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis: int = -1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray | None,
        use_running_average: bool,
        moments: tuple[jnp.ndarray, jnp.ndarray, int] | None = None,
    ):
        """Normalize ``x`` — or, when ``moments=(s1, s2, count)`` is given
        (per-channel sums of the pre-BN tensor and its square over `count`
        elements, as emitted by the fused conv-chain kernel), update the
        running stats and return the fold scalars ``(inv, bias')`` f32
        ``[C]`` such that ``bn(x) = x * inv + bias'`` — applied downstream
        by the next kernel's prologue or an XLA elementwise pass."""
        if moments is not None:
            c = moments[0].shape[0]
        else:
            ax = self.axis % x.ndim
            c = x.shape[ax]
            reduce_axes = tuple(i for i in range(x.ndim) if i != ax)
            shape = tuple(c if i == ax else 1 for i in range(x.ndim))

        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if moments is not None:
                s1, s2, n = moments
                mean = s1 / n
                var = s2 / n - jnp.square(mean)
            else:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
                n = np.prod([x.shape[i] for i in reduce_axes])
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        if moments is not None:
            return inv, bias - mean * inv
        # Fold the f32 scalars, then apply in the activation dtype: the big
        # tensors never round-trip through f32 HBM traffic.
        inv_c = inv.reshape(shape).astype(x.dtype)
        bias_c = (bias - mean * inv).reshape(shape).astype(x.dtype)
        return x * inv_c + bias_c


class DepthwiseConv(nn.Module):
    """3x3 depthwise conv + 1x1 pointwise conv + batch norm + ReLU
    (capability parity: reference models.py:7-28).

    Input/output layout is NHWC when ``channels_first=False``, NCHW when
    True. Parameters are identical either way.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    channels_first: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool,
    ):
        cf = self.channels_first
        in_ch = x.shape[1] if cf else x.shape[-1]
        dw_kernel = self.param("dw_kernel", _dw_init, (3, 3, 1, in_ch))
        pw_kernel = self.param(
            "pw_kernel", nn.initializers.lecun_normal(), (in_ch, self.features)
        )
        dt = self.dtype
        xc = x.astype(dt)
        wd = dw_kernel.astype(dt)
        wp = pw_kernel.astype(dt)

        if cf:
            n, c, h, w = xc.shape
            # Depthwise 3x3 as nine shifted multiply-adds over [H, W]
            # planes (full lane utilization at any channel count).
            # Measured best XLA formulation: a real NCHW grouped conv is
            # 1.6x slower and moves 1.7x the bytes in the train step
            # (docs/det_perf.md).
            xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    term = xp[:, :, dy : dy + h, dx : dx + w] * wd[dy, dx, 0][
                        None, :, None, None
                    ]
                    out = term if out is None else out + term
            # Pointwise over the channel axis; spatial stays on lanes.
            xc = jnp.einsum(
                "nchw,co->nohw", out, wp, preferred_element_type=jnp.float32
            ).astype(dt)
            bn_axis = 1
        else:
            xc = jax.lax.conv_general_dilated(
                xc,
                wd,
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                feature_group_count=in_ch,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            xc = jnp.einsum(
                "nhwc,co->nhwo", xc, wp, preferred_element_type=jnp.float32
            ).astype(dt)
            bn_axis = -1

        xc = BatchNormLite(momentum=0.9, epsilon=1e-5, axis=bn_axis, name="bn")(
            xc, use_running_average=not train
        )
        return nn.relu(xc)



class DoubleConv(nn.Module):
    """Two stacked depthwise-separable conv blocks (reference models.py:31-41).

    (The split-BN fused conv-chain Pallas path that once hung off this
    module lost its A/B to XLA's own fusions at all detection channel
    counts and was deleted — measurements in docs/det_perf.md, code in
    git history.)"""

    features: int
    dtype: jnp.dtype = jnp.float32
    channels_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv0 = DepthwiseConv(
            self.features, self.dtype, self.channels_first, name="conv0"
        )
        conv1 = DepthwiseConv(
            self.features, self.dtype, self.channels_first, name="conv1"
        )
        x = conv0(x, train)
        return conv1(x, train)


def _to_cf(x):  # NHWC -> NCHW
    return jnp.transpose(x, (0, 3, 1, 2))


def _to_cl(x):  # NCHW -> NHWC
    return jnp.transpose(x, (0, 2, 3, 1))


def _max_pool(x, channels_first: bool):
    if channels_first:
        n, c, h, w = x.shape
        # Floor-truncate odd dims (torch MaxPool2d semantics), then a
        # reshape-max — differentiable and layout-preserving.
        x = x[:, :, : h - h % 2, : w - w % 2]
        x = x.reshape(n, c, h // 2, 2, w // 2, 2)
        return jnp.max(x, axis=(3, 5))
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class Up(nn.Module):
    """Upscale + skip-concat + contract (reference models.py:61-90).

    ``channels_first`` applies to the contract blocks and the skip/concat;
    the transpose conv itself always runs NHWC (it sits at low utilization
    for one op only, and XLA's conv-transpose path needs NHWC).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    channels_first: bool = False

    @nn.compact
    def __call__(self, x_up: jnp.ndarray, x_skip: jnp.ndarray, train: bool, up_cf: bool) -> jnp.ndarray:
        # x_up arrives NCHW if up_cf else NHWC; x_skip matches
        # self.channels_first.
        if up_cf:
            x_up = _to_cl(x_up)
        up = nn.ConvTranspose(
            self.features,
            (3, 3),
            strides=(2, 2),
            padding="VALID",
            transpose_kernel=True,
            dtype=self.dtype,
            name="up",
        )(x_up.astype(self.dtype))
        if self.channels_first:
            up = _to_cf(up)
            # Trim the 1px overhang to the skip's spatial size
            # (reference models.py:84-88).
            up = up[:, :, : x_skip.shape[2], : x_skip.shape[3]]
            combined = jnp.concatenate([up, x_skip.astype(up.dtype)], axis=1)
        else:
            up = up[:, : x_skip.shape[1], : x_skip.shape[2], :]
            combined = jnp.concatenate([up, x_skip.astype(up.dtype)], axis=-1)
        return DoubleConv(self.features, self.dtype, self.channels_first, name="contract")(
            combined, train
        )


class DetectionModel(nn.Module):
    """U-Net over greyscale pages -> text-probability mask.

    Input ``[N, H, W, 1]`` float in [-0.5, 0.5]; output ``[N, H, W, 1]``
    probabilities. H and W must survive 6 rounds of 2x pooling (the
    canonical training size is 800x600).
    """

    depth_scale: Sequence[int] = (8, 16, 32, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ds = self.depth_scale

        def cf(level: int) -> bool:
            return ds[level] <= _CHANNELS_FIRST_MAX

        x = x.astype(self.dtype)
        if cf(0):
            x = _to_cf(x)
        x = DoubleConv(ds[0], self.dtype, cf(0), name="in_conv")(x, train)

        skips = [x]  # skip i is in layout cf(i)
        h = x
        h_cf = cf(0)
        for i in range(len(ds) - 1):
            want_cf = cf(i + 1)
            if h_cf != want_cf:
                h = _to_cf(h) if want_cf else _to_cl(h)
                h_cf = want_cf
            h = DoubleConv(ds[i + 1], self.dtype, want_cf, name=f"down_{i}")(h, train)
            h = _max_pool(h, want_cf)
            skips.append(h)

        out = skips[-1]
        out_cf = cf(len(ds) - 1)
        for i in reversed(range(len(ds) - 1)):
            out = Up(ds[i], self.dtype, cf(i), name=f"up_{i}")(
                out, skips[i], train, up_cf=out_cf
            )
            out_cf = cf(i)

        if out_cf:
            out = _to_cl(out)
        out = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv")(
            out.astype(jnp.float32)
        )
        return nn.sigmoid(out)

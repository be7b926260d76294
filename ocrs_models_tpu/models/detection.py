"""U-Net text detection model.

Same capability as the reference's ``DetectionModel`` (models.py:93-143):
greyscale page in, per-pixel text probability out, depthwise-separable convs
with channel progression (8, 16, 32, 32, 64, 128, 256). Re-designed
TPU-first: NHWC layout, optional bfloat16 compute (params and batch-norm
statistics stay float32), shapes static under jit. Each
depthwise-conv -> pointwise-conv -> batchnorm -> relu block is expressed so
XLA fuses the normalization and activation into the convolution epilogue.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class DepthwiseConv(nn.Module):
    """3x3 depthwise conv + 1x1 pointwise conv + batch norm + ReLU
    (capability parity: reference models.py:7-28)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (3, 3),
            padding=((1, 1), (1, 1)),
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="dw",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pw"
        )(x)
        # Batch norm in float32 (torch autocast pins norms to fp32 too);
        # momentum/eps match torch BatchNorm2d defaults.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x).astype(self.dtype)


class DoubleConv(nn.Module):
    """Two stacked depthwise-separable conv blocks (reference models.py:31-41)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = DepthwiseConv(self.features, self.dtype, name="conv0")(x, train)
        return DepthwiseConv(self.features, self.dtype, name="conv1")(x, train)


class Up(nn.Module):
    """Upscale + skip-concat + contract (reference models.py:61-90)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_up: jnp.ndarray, x_skip: jnp.ndarray, train: bool) -> jnp.ndarray:
        up = nn.ConvTranspose(
            self.features,
            (3, 3),
            strides=(2, 2),
            padding="VALID",
            transpose_kernel=True,
            dtype=self.dtype,
            name="up",
        )(x_up)
        # The transpose conv output is 1px taller/wider than the skip path;
        # trim bottom/right to match (reference models.py:84-88).
        up = up[:, : x_skip.shape[1], : x_skip.shape[2], :]
        combined = jnp.concatenate([up, x_skip.astype(up.dtype)], axis=-1)
        return DoubleConv(self.features, self.dtype, name="contract")(combined, train)


class DetectionModel(nn.Module):
    """U-Net over greyscale pages -> text-probability mask.

    Input ``[N, H, W, 1]`` float in [-0.5, 0.5]; output ``[N, H, W, 1]``
    probabilities. H and W must be divisible enough to survive 6 rounds of
    2x pooling (the canonical training size is 800x600).
    """

    depth_scale: Sequence[int] = (8, 16, 32, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ds = self.depth_scale
        x = x.astype(self.dtype)
        x = DoubleConv(ds[0], self.dtype, name="in_conv")(x, train)

        skips = [x]
        h = x
        for i in range(len(ds) - 1):
            h = DoubleConv(ds[i + 1], self.dtype, name=f"down_{i}")(h, train)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            skips.append(h)

        out = skips[-1]
        for i in reversed(range(len(ds) - 1)):
            out = Up(ds[i], self.dtype, name=f"up_{i}")(out, skips[i], train)

        out = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv")(
            out.astype(jnp.float32)
        )
        return nn.sigmoid(out)

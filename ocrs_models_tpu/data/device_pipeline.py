"""Device-side batched preprocessing.

The reference does all preprocessing on CPU dataloader workers
(torchvision resize/jitter, hiertext.py:288-294). Here the per-sample host
work stops at decode + crop; the batched, shape-static stages — resize to
model resolution, normalization, photometric augmentation — run jitted on
the accelerator, overlapping HBM prefetch with compute
(BASELINE.json north star: "device-side preprocessing with HBM prefetch").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def batch_resize(images: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear-resize a batch ``[N, H, W, C]`` to ``[N, out_h, out_w, C]``."""
    n, _, _, c = images.shape
    return jax.image.resize(
        images.astype(jnp.float32), (n, out_h, out_w, c), method="bilinear"
    )


@jax.jit
def normalize_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 batch -> float32 in [-0.5, 0.5] (the model pixel convention)."""
    return images.astype(jnp.float32) / 255.0 - 0.5


@jax.jit
def photometric_augment(
    images: jnp.ndarray, rng: jax.Array, strength: float = 0.1
) -> jnp.ndarray:
    """Per-sample brightness/contrast jitter on device, p=0.5 per sample
    (the photometric half of the reference's augmentation menu)."""
    n = images.shape[0]
    k_apply, k_b, k_c = jax.random.split(rng, 3)
    apply = jax.random.uniform(k_apply, (n, 1, 1, 1)) < 0.5
    b = jax.random.uniform(k_b, (n, 1, 1, 1), minval=1 - strength, maxval=1 + strength)
    c = jax.random.uniform(k_c, (n, 1, 1, 1), minval=1 - strength, maxval=1 + strength)
    x = images + 0.5
    x = x * b
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * c + mean
    out = jnp.clip(x, 0.0, 1.0) - 0.5
    return jnp.where(apply, out, images)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def prepare_line_crops(
    crops_uint8: jnp.ndarray, out_h: int, max_w: int, min_w: int = 10
) -> jnp.ndarray:
    """Batched recognition preprocessing: uint8 line crops (already padded to
    one width on host) -> normalized, height-``out_h`` resized batch."""
    x = normalize_uint8(crops_uint8)
    n, h, w, c = x.shape
    aspect_w = max(min_w, min(max_w, int(round(out_h * w / h))))
    return batch_resize(x, out_h, aspect_w)

"""Transformer text-layout model.

Capability parity with the reference's ``LayoutModel`` (models.py:340-406):
word bounding boxes ``[N, W, 4]`` in, per-word (line_start, line_end)
logits/probabilities out. 6-layer post-LN transformer encoder (d_model 256,
4 heads, FF 1024) over sinusoidal coordinate encodings.

TPU-first notes: the reference builds a positional-encoding *table* sized
by the batch's max coordinate and gathers from it (models.py:298-318) — a
dynamic shape. Here the sinusoids are evaluated directly at the (rounded)
coordinates, which is algebraically identical at integer coordinates and
keeps every shape static under jit.

Deliberate behavioral fix: the reference feeds ``[N, W, d]`` activations
into a torch ``TransformerEncoder`` left at its seq-first default
(``batch_first=False``), so its attention actually mixes *across the batch
axis* rather than across the words of one page (models.py:385-401 — a
latent bug in the WIP layout model; at batch size 1 its attention is an
identity mix). This implementation attends over the words of each sample,
which is the intended semantics of the model.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def sinusoidal_bbox_encoding(boxes: jnp.ndarray, size: int) -> jnp.ndarray:
    """Encode box coordinates as interleaved sin/cos features.

    :param boxes: ``[N, W, D]`` coordinates.
    :param size: encoding dims per coordinate (must be even).
    :return: ``[N, W, D * size]``.
    """
    depth = size // 2
    coords = jnp.round(boxes).astype(jnp.float32)[..., None]  # [N, W, D, 1]
    rates = 1.0 / (10_000.0 ** (jnp.arange(depth, dtype=jnp.float32) / depth))
    angles = coords * rates  # [N, W, D, depth]
    enc = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    n, w, d, s = enc.shape
    return enc.reshape(n, w, d * s)


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch ``TransformerEncoderLayer``
    default semantics: self-attn -> add&norm -> FF(relu) -> add&norm)."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d, h = self.d_model, self.n_heads
        dh = d // h
        n, w, _ = x.shape
        xc = x.astype(self.dtype)

        qkv_w = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(), (d, 3 * d)
        )
        qkv_b = self.param("qkv_bias", nn.initializers.zeros, (3 * d,))
        qkv = xc @ qkv_w.astype(self.dtype) + qkv_b.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, w, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(n, w, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(n, w, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(dh))
        attn = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(self.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(n, w, d)
        ctx = nn.Dense(d, dtype=self.dtype, name="out_proj")(ctx)
        ctx = nn.Dropout(self.dropout, deterministic=not train)(ctx)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
            x + ctx.astype(x.dtype)
        )

        ff = nn.Dense(self.d_ff, dtype=self.dtype, name="linear1")(
            x.astype(self.dtype)
        )
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(d, dtype=self.dtype, name="linear2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            x + ff.astype(x.dtype)
        )


class LayoutModel(nn.Module):
    """Word-box sequence -> per-word (line_start, line_end) predictions."""

    n_classes: int = 2
    d_model: int = 256
    n_layers: int = 6
    n_heads: int = 4
    d_ff: int = 1024
    pos_embedding: str = "sin"  # "sin" | "mlp"
    return_probs: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.pos_embedding == "sin":
            x = sinusoidal_bbox_encoding(boxes, self.d_model // boxes.shape[-1])
        elif self.pos_embedding == "mlp":
            x = nn.Dense(64, dtype=self.dtype, name="embed0")(
                boxes.astype(self.dtype)
            )
            x = nn.relu(x)
            x = nn.Dense(self.d_model, dtype=self.dtype, name="embed1")(x)
            x = nn.relu(x)
        else:
            raise ValueError(f"Unknown pos_embedding {self.pos_embedding!r}")

        x = x.astype(jnp.float32)
        for i in range(self.n_layers):
            x = EncoderLayer(
                self.d_model,
                self.n_heads,
                self.d_ff,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, train)

        x = nn.Dense(self.n_classes, dtype=jnp.float32, name="classify")(x)
        if self.return_probs:
            return nn.sigmoid(x)
        return x

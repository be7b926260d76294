"""Fused recognition stage-2 Pallas kernel: pool statistics for BN + 2x2 maxpool + ReLU.

Why: stage 2's BN + pool + ReLU passes over the [N, 32, W/2, 64] conv
output cost 6.96 ms fwd+bwd isolated (tools/rec_stage2_probe.py) — ~5x
their traffic roofline. The C=64 minor dim wastes half the vector lanes
on every elementwise pass, the BN apply round-trips 512 MB at the wide
bucket, and the pool backward lowers to select_and_scatter. Every
XLA-level reformulation measured worse (docs/rec_perf.md).

This kernel family reduces the whole block to ONE read of the conv
output per direction by *reassociating pool and BN*:

- ``bnpool_stats`` (forward) emits the pooled 2x2-window **max and min
  of the raw conv output** plus the per-channel sums ``s1 = sum(y)``,
  ``s2 = sum(y^2)`` in one HBM pass. A per-channel affine is monotone
  (direction given by the sign of its scale), so
  ``pool(bn(y)) = where(inv >= 0, inv * pmax + b, inv * pmin + b)``
  exactly — the tiny XLA epilogue (``bnpool_apply``) finalizes the BN
  scalars from (s1, s2) and applies affine + ReLU on the 4x-smaller
  pooled tensor.
- the backward is a custom VJP of ``bnpool_stats`` ONLY: XLA autodiffs
  the epilogue (producing the pooled cotangents d_pmax/d_pmin — the
  ReLU gate and ``inv`` factor included — and the stats cotangents
  ds1/ds2, i.e. the whole BN-statistics chain), and the kernel emits
  ``dy = route(d_pmax) + route(d_pmin) + ds1 + 2 * ds2 * y`` in one
  pass, with first-match tie routing in select_and_scatter scan order
  ((h0,w0),(h0,w1),(h1,w0),(h1,w1)).

Layout: y [N, H, W, C] is viewed as [N, H/2, 2, W/2, 2C] — a free
row-major reshape that puts the pool's H phases on an untiled outer dim
and fuses W pairs into a full 128-lane minor dim (C=64). The W-phase
fold is a lane-half slice + max; the backward's cross-half mask
projections use lane rolls, and the 64->2C pooled-operand expansion
rides the otherwise-idle MXU via a [C, 2C] duplication matrix.

Replaces (capability): the reference recognizer's stage-2 norm + pool
(/root/reference/ocrs_models/models.py:181-186: BatchNorm2d(64) +
MaxPool2d(2, 2) after conv3), reassociated as pool-then-affine; the
model applies the affine in the activation dtype exactly like
``BatchNormLite`` (whose ``moments=`` path consumes this kernel's
(s1, s2)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The backward's per-step working set (y view block + dy block + four
# pooled operands + expansions) tops Mosaic's 16 MB scoped-vmem default
# at the wide-bucket shape; v5e has 128 MB of VMEM.
_VMEM_LIMIT = 64 * 1024 * 1024


def _roll(x, shift, interpret):
    """Lane rotation along the minor axis (axis 1 of a 2-D tile)."""
    if interpret:
        return jnp.roll(x, shift, axis=1)
    # pltpu.roll rejects negative shifts; rotation is modular.
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _fwd_kernel(y_ref, pmax_ref, pmin_ref, s1_ref, s2_ref, *, hp, c):
    """One batch element: pooled max/min + per-lane sums.

    y_ref block [1, hp, 2, rows, 2c]; pooled outputs [1, hp, rows, c];
    s1/s2 per-n partials [1, 1, 2c] f32 (lane k<c = channel k of the
    even W phase, lane c+k = channel k of the odd phase).
    """
    l = 2 * c
    a1 = jnp.zeros((1, l), jnp.float32)
    a2 = jnp.zeros((1, l), jnp.float32)
    for h in range(hp):
        y0 = y_ref[0, h, 0].astype(jnp.float32)  # [rows, 2c]
        y1 = y_ref[0, h, 1].astype(jnp.float32)
        a1 = a1 + jnp.sum(y0 + y1, axis=0, keepdims=True)
        a2 = a2 + jnp.sum(y0 * y0 + y1 * y1, axis=0, keepdims=True)
        hmx = jnp.maximum(y0, y1)
        hmn = jnp.minimum(y0, y1)
        pmax_ref[0, h] = jnp.maximum(hmx[:, :c], hmx[:, c:]).astype(
            pmax_ref.dtype
        )
        pmin_ref[0, h] = jnp.minimum(hmn[:, :c], hmn[:, c:]).astype(
            pmin_ref.dtype
        )
    s1_ref[0] = a1
    s2_ref[0] = a2


def _bwd_kernel(
    y_ref,
    pmax_ref,
    pmin_ref,
    dmax_ref,
    dmin_ref,
    ds_ref,
    dmat_ref,
    dy_ref,
    *,
    hp,
    c,
    interpret,
):
    """dy = route(dmax) + route(dmin) + ds1 + 2*ds2*y, one pass.

    ds_ref [2, 2c] f32: row 0 = ds1 duplicated across the two W phases,
    row 1 = 2*ds2 duplicated. dmat_ref [c, 2c] f32 = [I | I] expands a
    pooled [rows, c] operand to both lane halves on the MXU.
    """
    l = 2 * c
    dmat = dmat_ref[...]
    ds1 = ds_ref[0:1, :]
    ds2x2 = ds_ref[1:2, :]
    rows = dy_ref.shape[3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, l), 1)
    low = jnp.where(lane < c, 1.0, 0.0).astype(jnp.float32)
    high = 1.0 - low

    def expand(p):  # [rows, c] -> [rows, 2c]
        return jax.lax.dot_general(
            p.astype(jnp.float32),
            dmat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for h in range(hp):
        y0 = y_ref[0, h, 0].astype(jnp.float32)
        y1 = y_ref[0, h, 1].astype(jnp.float32)
        g0 = ds1 + ds2x2 * y0
        g1 = ds1 + ds2x2 * y1
        for p_ref, d_ref in ((pmax_ref, dmax_ref), (pmin_ref, dmin_ref)):
            p_b = expand(p_ref[0, h])
            d_b = expand(d_ref[0, h])
            c0 = jnp.where(y0 == p_b, 1.0, 0.0)
            c1 = jnp.where(y1 == p_b, 1.0, 0.0)
            # First-match priority in select_and_scatter scan order;
            # `taken` is projected to both lane halves after each phase.
            m1 = c0 * low
            taken = m1 + _roll(m1, c, interpret)
            m2 = c0 * high * (1.0 - taken)
            taken = taken + m2 + _roll(m2, -c, interpret)
            m3 = c1 * low * (1.0 - taken)
            taken = taken + m3 + _roll(m3, c, interpret)
            m4 = c1 * high * (1.0 - taken)
            g0 = g0 + (m1 + m2) * d_b
            g1 = g1 + (m3 + m4) * d_b
        dy_ref[0, h, 0] = g0.astype(dy_ref.dtype)
        dy_ref[0, h, 1] = g1.astype(dy_ref.dtype)


def _view(y):
    n, h, w, c = y.shape
    return y.reshape(n, h // 2, 2, w // 2, 2 * c)


def _fwd_call(y, *, interpret):
    n, h, w, c = y.shape
    hp, rows, l = h // 2, w // 2, 2 * c
    pmax, pmin, p1, p2 = pl.pallas_call(
        functools.partial(_fwd_kernel, hp=hp, c=c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, 2, rows, l), lambda i: (i, 0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hp, rows, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hp, rows, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hp, rows, c), y.dtype),
            jax.ShapeDtypeStruct((n, hp, rows, c), y.dtype),
            jax.ShapeDtypeStruct((n, 1, l), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, l), jnp.float32),
        ],
        interpret=interpret,
    )(_view(y))
    s1 = p1.sum(axis=(0, 1))
    s2 = p2.sum(axis=(0, 1))
    return pmax, pmin, s1[:c] + s1[c:], s2[:c] + s2[c:]


def _bwd_call(y, pmax, pmin, dmax, dmin, ds1, ds2, *, interpret):
    n, h, w, c = y.shape
    hp, rows, l = h // 2, w // 2, 2 * c
    ds = jnp.stack(
        [
            jnp.concatenate([ds1, ds1]),
            2.0 * jnp.concatenate([ds2, ds2]),
        ]
    ).astype(jnp.float32)
    dmat = jnp.concatenate(
        [jnp.eye(c, dtype=jnp.float32), jnp.eye(c, dtype=jnp.float32)], axis=1
    )
    pooled = pl.BlockSpec((1, hp, rows, c), lambda i: (i, 0, 0, 0))
    dy = pl.pallas_call(
        functools.partial(_bwd_kernel, hp=hp, c=c, interpret=interpret),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, 2, rows, l), lambda i: (i, 0, 0, 0, 0)),
            pooled,
            pooled,
            pooled,
            pooled,
            pl.BlockSpec((2, l), lambda i: (0, 0)),
            pl.BlockSpec((c, l), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp, 2, rows, l), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, 2, rows, l), y.dtype),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(_view(y), pmax, pmin, dmax, dmin, ds, dmat)
    return dy.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def bnpool_stats(y, interpret=False):
    """Pooled 2x2-window max/min of ``y`` plus per-channel (s1, s2).

    :param y: [N, H, W, C] with H, W even (the stage-2 conv output).
    :return: ``(pmax, pmin, s1, s2)`` — pooled extrema [N, H/2, W/2, C]
        in ``y.dtype``; per-channel f32 sums of y and y^2 over (N, H, W).
    """
    return _fwd_call(y, interpret=interpret)


def _vjp_fwd(y, interpret):
    out = _fwd_call(y, interpret=interpret)
    pmax, pmin = out[0], out[1]
    return out, (y, pmax, pmin)


def _vjp_bwd(interpret, res, cts):
    y, pmax, pmin = res
    dmax, dmin, ds1, ds2 = cts
    dy = _bwd_call(
        y, pmax, pmin, dmax, dmin, ds1, ds2, interpret=interpret
    )
    return (dy,)


bnpool_stats.defvjp(_vjp_fwd, _vjp_bwd)


def bnpool_apply(pmax, pmin, inv, shift):
    """BN affine + ReLU on the selected pooled extremum (XLA epilogue).

    ``inv``/``shift`` are BatchNormLite's f32 fold scalars; the affine is
    applied in the activation dtype, matching its non-fused apply path.
    """
    dt = pmax.dtype
    sel = jnp.where(inv >= 0.0, pmax, pmin)
    return jax.nn.relu(sel * inv.astype(dt) + shift.astype(dt))


def reference_bnpool(y, gamma, beta, eps=1e-5):
    """XLA reference of the full fused block (training-mode BN), for
    tests and A/B probes: bn -> 2x2 maxpool -> relu with BatchNormLite's
    f32-stats/activation-dtype-apply semantics."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps) * gamma
    z = y * inv.astype(y.dtype) + (beta - mean * inv).astype(y.dtype)
    p = jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return jax.nn.relu(p)


def fused_bnpool(y, gamma, beta, eps=1e-5, interpret=False):
    """Training-mode fused block (stats from the batch), for tests/A-B:
    numerically matches :func:`reference_bnpool` up to pool/affine
    reassociation rounding."""
    n, h, w, _ = y.shape
    pmax, pmin, s1, s2 = bnpool_stats(y, interpret)
    m = n * h * w
    mean = s1 / m
    var = s2 / m - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps) * gamma
    return bnpool_apply(pmax, pmin, inv, beta - mean * inv)

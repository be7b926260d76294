"""Fused recognition stage-2 Pallas kernel: pool statistics for BN + 2x2 maxpool + ReLU.

Why: stage 2's BN + pool + ReLU passes over the [N, 32, W/2, 64] conv
output cost 6.96 ms fwd+bwd isolated (tools/rec_stage2_probe.py) — ~5x
their traffic roofline: the C=64 minor dim wastes half the vector lanes
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
  the epilogue (producing the pooled cotangents d_pmax/d_pmin — ReLU
  gate and ``inv`` factor included — and the stats cotangents ds1/ds2,
  i.e. the whole BN-statistics chain), and the kernel emits
  ``dy = route(d_pmax) + route(d_pmin) + ds1 + 2 * ds2 * y`` in one
  pass, with first-match tie routing in select_and_scatter scan order
  ((h0,w0),(h0,w1),(h1,w0),(h1,w1)).

Layout (second design — the first, a [N,H/2,2,W/2,2C] lane-fused view,
measured 4.3 ms fwd: the "free" reshape is a real 1.6 ms relayout on
TPU and its lane-half folds are VPU-relayout-bound): y stays in native
NHWC, blocks are H-pair rows [1, 2, W, C] with W on the sublanes, and
the pool's W-phase split is an MXU contraction with one-hot selection
matrices ``E = S_e @ y`` / ``O = S_o @ y`` — the stage-1 kernel's
polyphase trick. The extracted phases arrive as f32 dot outputs, so the
max/min trees need no bf16 compare (unsupported on this rig) and no
lane shuffles exist anywhere. The backward's scatter is the transposed
selection contraction. Equality routing compares dot outputs against
the stored max of those same dot outputs, so it is robust to MXU
rounding (an earlier design compared y against a dot-expanded copy;
f32 operands round on the MXU and every equality missed —
tools/bnpool_debug2.py).

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The backward's working set is ~1 MB/block, but the default 16 MB
# scoped-vmem cap is tight once Mosaic stacks double-buffered blocks and
# the selection matrices; v5e has 128 MB of VMEM.
_VMEM_LIMIT = 64 * 1024 * 1024


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _phases(y_ref, se, so):
    """Extract the four pool-window candidates for one H-pair block.

    Returns f32 [W/2, C] arrays (E0, O0, E1, O1) in select_and_scatter
    scan order: (h0, w even), (h0, w odd), (h1, w even), (h1, w odd).
    """
    y0 = y_ref[0, 0]
    y1 = y_ref[0, 1]
    return _dot(se, y0), _dot(so, y0), _dot(se, y1), _dot(so, y1), y0, y1


def _fwd_kernel(y_ref, se_ref, so_ref, pmax_ref, pmin_ref, s1_ref, s2_ref):
    e0, o0, e1, o1, y0, y1 = _phases(y_ref, se_ref[...], so_ref[...])
    mx = jnp.maximum(jnp.maximum(e0, o0), jnp.maximum(e1, o1))
    mn = jnp.minimum(jnp.minimum(e0, o0), jnp.minimum(e1, o1))
    pmax_ref[0, 0] = mx.astype(pmax_ref.dtype)
    pmin_ref[0, 0] = mn.astype(pmin_ref.dtype)
    y0f = y0.astype(jnp.float32)
    y1f = y1.astype(jnp.float32)
    s1_ref[0, 0] = jnp.sum(y0f + y1f, axis=0, keepdims=True)
    s2_ref[0, 0] = jnp.sum(y0f * y0f + y1f * y1f, axis=0, keepdims=True)


def _bwd_kernel(
    y_ref,
    se_ref,
    so_ref,
    set_ref,
    sot_ref,
    pmax_ref,
    pmin_ref,
    dmax_ref,
    dmin_ref,
    ds_ref,
    dy_ref,
):
    dt = dy_ref.dtype
    e0, o0, e1, o1, y0, y1 = _phases(y_ref, se_ref[...], so_ref[...])
    y0f = y0.astype(jnp.float32)
    y1f = y1.astype(jnp.float32)
    # Routed pooled cotangents, accumulated over the max and min chains.
    r = [0.0, 0.0, 0.0, 0.0]
    for p_ref, d_ref in ((pmax_ref, dmax_ref), (pmin_ref, dmin_ref)):
        p = p_ref[0, 0].astype(jnp.float32)
        d = d_ref[0, 0].astype(jnp.float32)
        m0 = jnp.where(e0 == p, 1.0, 0.0)
        m1 = jnp.where(o0 == p, 1.0, 0.0) * (1.0 - m0)
        m2 = jnp.where(e1 == p, 1.0, 0.0) * (1.0 - m0 - m1)
        m3 = jnp.where(o1 == p, 1.0, 0.0) * (1.0 - m0 - m1 - m2)
        for i, m in enumerate((m0, m1, m2, m3)):
            r[i] = r[i] + m * d
    # Scatter back to full W via the transposed selection contraction;
    # the per-channel stats terms ride along (ds row 0 = ds1, row 1 =
    # 2*ds2, broadcast across sublanes).
    ds1 = ds_ref[0:1, :]
    ds2x2 = ds_ref[1:2, :]
    set_ = set_ref[...]
    sot = sot_ref[...]
    dy0 = _dot(set_, r[0].astype(dt)) + _dot(sot, r[1].astype(dt))
    dy1 = _dot(set_, r[2].astype(dt)) + _dot(sot, r[3].astype(dt))
    dy_ref[0, 0] = (dy0 + ds1 + ds2x2 * y0f).astype(dt)
    dy_ref[0, 1] = (dy1 + ds1 + ds2x2 * y1f).astype(dt)


def _selection(w, dtype):
    """One-hot W-phase selection matrices S_e, S_o [W/2, W]."""
    wp = w // 2
    rows = np.arange(wp)
    se = np.zeros((wp, w), np.float32)
    so = np.zeros((wp, w), np.float32)
    se[rows, 2 * rows] = 1.0
    so[rows, 2 * rows + 1] = 1.0
    return jnp.asarray(se, dtype), jnp.asarray(so, dtype)


def _fwd_call(y, *, interpret):
    n, h, w, c = y.shape
    hp, wp = h // 2, w // 2
    se, so = _selection(w, y.dtype)
    hpair = pl.BlockSpec((1, 2, w, c), lambda i, j: (i, j, 0, 0))
    pooled = pl.BlockSpec((1, 1, wp, c), lambda i, j: (i, j, 0, 0))
    pmax, pmin, p1, p2 = pl.pallas_call(
        _fwd_kernel,
        grid=(n, hp),
        in_specs=[
            hpair,
            pl.BlockSpec((wp, w), lambda i, j: (0, 0)),
            pl.BlockSpec((wp, w), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pooled,
            pooled,
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hp, wp, c), y.dtype),
            jax.ShapeDtypeStruct((n, hp, wp, c), y.dtype),
            jax.ShapeDtypeStruct((n, hp, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, hp, 1, c), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y, se, so)
    return pmax, pmin, p1.sum(axis=(0, 1, 2)), p2.sum(axis=(0, 1, 2))


def _bwd_call(y, pmax, pmin, dmax, dmin, ds1, ds2, *, interpret):
    n, h, w, c = y.shape
    hp, wp = h // 2, w // 2
    se, so = _selection(w, y.dtype)
    ds = jnp.stack([ds1, 2.0 * ds2]).astype(jnp.float32)
    hpair = pl.BlockSpec((1, 2, w, c), lambda i, j: (i, j, 0, 0))
    pooled = pl.BlockSpec((1, 1, wp, c), lambda i, j: (i, j, 0, 0))
    whole = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    dy = pl.pallas_call(
        _bwd_kernel,
        grid=(n, hp),
        in_specs=[
            hpair,
            whole((wp, w)),
            whole((wp, w)),
            whole((w, wp)),
            whole((w, wp)),
            pooled,
            pooled,
            pooled,
            pooled,
            whole((2, c)),
        ],
        out_specs=hpair,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), y.dtype),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y, se, so, se.T, so.T, pmax, pmin, dmax, dmin, ds)
    return dy


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
    dy = _bwd_call(y, pmax, pmin, dmax, dmin, ds1, ds2, interpret=interpret)
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

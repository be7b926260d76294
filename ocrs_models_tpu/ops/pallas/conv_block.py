"""Fused depthwise-separable conv block as a Pallas TPU kernel, take 2.

Replaces ops/pallas/conv_kernel.py's manual-halo-DMA design (which this
rig's remote Mosaic compiler rejects) with plain BlockSpec tiling: the
3x3 stencil's row halo comes from passing the SAME padded input twice —
a main band of ``th`` rows plus a thin 16-row halo band starting exactly
where the main band ends — and assembling the ``th+2``-row window in
VMEM scratch. No ``pltpu.ANY`` refs, no ``make_async_copy``; the same
construct family as the working GRU kernel (gru_kernel.py).

Forward contract (channels-first, matching models/detection.py):
    x:  [N, C, H, W]   bf16/f32
    wd: [C, 3, 3]      depthwise taps (f32)
    wp: [C, O]         pointwise mix (f32)
    y = pointwise(depthwise3x3(x)): [N, O, H, W] float32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HB = 16  # halo band rows (sublane tile for bf16; multiple of the f32 tile)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _tile_rows(h: int, max_rows: int = 80) -> int:
    """Row-band height: a multiple of _HB (so the halo block index lands
    exactly at the band end); bands may overhang h — callers pad rows up
    to ``n_tiles * th`` and slice the output back to h."""
    return min(_round_up(h, _HB), max_rows)


def _fwd_kernel(xm_ref, xh_ref, wd_ref, wp_ref, y_ref, win_s, *, th, w_out):
    # Assemble the (th+2)-row window in scratch: main band + halo rows.
    win_s[:, 0:th, :] = xm_ref[0]
    win_s[:, th : th + _HB, :] = xh_ref[0]
    win = win_s[...]
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = win[:, dy : dy + th, dx : dx + w_out].astype(jnp.float32)
            wgt = wd_ref[:, dy * 3 + dx : dy * 3 + dx + 1].astype(jnp.float32)
            term = tap * wgt[:, :, None]
            acc = term if acc is None else acc + term
    c = acc.shape[0]
    y = jax.lax.dot_general(
        wp_ref[...].astype(jnp.float32),
        acc.reshape(c, th * w_out),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_ref[0] = y.reshape(-1, th, w_out)


def fused_dwsep_fwd(x, wd, wp, *, interpret=False):
    """pointwise(depthwise3x3(x)) in one HBM pass per row band."""
    n, c, h, w = x.shape
    o = wp.shape[1]
    th = _tile_rows(h)
    n_tiles = -(-h // th)
    h_tiled = n_tiles * th
    w_out = _round_up(w, 128)
    w_pad = _round_up(w_out + 2, 128)
    # xp rows: 1 top pad + h + bottom pad to h_tiled + _HB halo slack, so
    # every band's main and halo blocks stay in range.
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (1, h_tiled - h + _HB - 1), (1, w_pad - w - 1))
    )
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, w_out=w_out),
        grid=(n, n_tiles),
        in_specs=[
            # main band: xp rows [j*th, (j+1)*th)
            pl.BlockSpec((1, c, th, w_pad), lambda i, j: (i, 0, j, 0)),
            # halo band: xp rows [(j+1)*th, (j+1)*th + _HB)
            pl.BlockSpec(
                (1, c, _HB, w_pad),
                lambda i, j: (i, 0, (j + 1) * (th // _HB), 0),
            ),
            pl.BlockSpec((c, 9), lambda i, j: (0, 0)),
            pl.BlockSpec((c, o), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, o, th, w_out), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, o, h_tiled, w_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, th + _HB, w_pad), x.dtype)],
        interpret=interpret,
    )(xp, xp, wd.reshape(c, 9), wp)
    return y[:, :, :h, :w]


def fused_dwsep_fwd_reference(x, wd, wp):
    """Pure-JAX oracle (same contract)."""
    n, c, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            term = xp[:, :, dy : dy + h, dx : dx + w].astype(jnp.float32) * wd[
                None, :, dy, dx, None, None
            ].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return jnp.einsum(
        "nchw,co->nohw",
        acc,
        wp.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

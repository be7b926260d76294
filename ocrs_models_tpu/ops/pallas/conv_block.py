"""Fused depthwise-separable conv block as a Pallas TPU kernel, take 2.

Replaces ops/pallas/conv_kernel.py's manual-halo-DMA design (which this
rig's remote Mosaic compiler rejects) with plain BlockSpec tiling: the
3x3 stencil's row halo comes from passing the SAME padded input twice —
a main band of ``th`` rows plus a thin 16-row halo band starting exactly
where the main band ends — and assembling the ``th+2``-row window in
VMEM scratch. No ``pltpu.ANY`` refs, no ``make_async_copy``; the same
construct family as the working GRU kernel (gru_kernel.py). Tile height
is capped at 32 rows: this rig's Mosaic compiles th<=32 for every
production geometry in seconds, while th=80 with C>=16 crashes it and
th=16 takes minutes (docs/det_perf.md).

Forward contract (channels-first, matching models/detection.py):
    x:  [N, C, H, W]   bf16/f32
    wd: [C, 3, 3]      depthwise taps (f32)
    wp: [C, O]         pointwise mix (f32)
    y = pointwise(depthwise3x3(x)): [N, O, H, W] in x.dtype
        (float32 MXU accumulation, one rounding at the output)

``fused_dwsep`` carries a ``jax.custom_vjp``. The backward currently
lowers to the same XLA ops autodiff would produce for the unfused
formulation (transposed stencil + einsum grads), so wiring the forward
kernel never changes gradient numerics; a fused backward kernel is the
follow-up (see _bwd_xla).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HB = 16  # halo band rows (sublane tile for bf16; multiple of the f32 tile)
_MAX_TH = 32  # larger tiles crash this rig's Mosaic at C>=16


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _tile_rows(h: int) -> int:
    """Row-band height: a multiple of _HB (so the halo block index lands
    exactly at the band end); bands may overhang h — the output is padded
    to ``n_tiles * th`` rows and sliced back."""
    return min(_round_up(h, _HB), _MAX_TH)


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
    y_ref[0] = y.reshape(-1, th, w_out).astype(y_ref.dtype)


def _fwd_call(x, wd, wp, interpret):
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
        out_shape=jax.ShapeDtypeStruct((n, o, h_tiled, w_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((c, th + _HB, w_pad), x.dtype)],
        interpret=interpret,
    )(xp, xp, wd.reshape(c, 9), wp)
    return y[:, :, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dwsep(x, wd, wp, interpret=False):
    """``pointwise(depthwise3x3(x))`` fused into one HBM pass per row band.

    :param x: ``[N, C, H, W]``; :param wd: ``[C, 3, 3]``; :param wp:
        ``[C, O]``. Returns ``[N, O, H, W]`` in ``x.dtype``.
    """
    return _fwd_call(x, wd, wp, interpret)


def _bwd_xla(x, dy, wd, wp):
    """XLA backward, numerically identical to autodiff of the unfused
    9-shift + einsum formulation (models/detection.py cf path)."""
    n, c, h, w = x.shape
    dyf = dy.astype(jnp.float32)
    wdf = wd.astype(jnp.float32)
    wpf = wp.astype(jnp.float32)

    # g = dY backprojected through the pointwise mix: [N, C, H, W].
    g = jnp.einsum("nohw,co->nchw", dyf, wpf, preferred_element_type=jnp.float32)

    # dX: transposed 3x3 stencil over g.
    gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (1, 1)))
    dx = None
    for ky in range(3):
        for kx in range(3):
            term = gp[:, :, 2 - ky : 2 - ky + h, 2 - kx : 2 - kx + w] * wdf[
                None, :, ky, kx, None, None
            ]
            dx = term if dx is None else dx + term

    # dwd[c, ky, kx] = sum x[c, r+ky-1, s+kx-1] * g[c, r, s].
    xf = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (0, 0), (1, 1), (1, 1))
    )
    dwd = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.sum(xf[:, :, ky : ky + h, kx : kx + w] * g, axis=(0, 2, 3))
                    for kx in range(3)
                ],
                axis=-1,
            )
            for ky in range(3)
        ],
        axis=-2,
    )  # [C, 3, 3]

    # dwp[c, o] = sum acc[c, ...] * dY[o, ...] with acc = depthwise(x).
    acc = None
    for ky in range(3):
        for kx in range(3):
            term = xf[:, :, ky : ky + h, kx : kx + w] * wdf[None, :, ky, kx, None, None]
            acc = term if acc is None else acc + term
    dwp = jnp.einsum("nchw,nohw->co", acc, dyf, preferred_element_type=jnp.float32)
    return dx.astype(x.dtype), dwd.astype(wd.dtype), dwp.astype(wp.dtype)


def _vjp_fwd(x, wd, wp, interpret):
    return _fwd_call(x, wd, wp, interpret), (x, wd, wp)


def _vjp_bwd(interpret, res, dy):
    x, wd, wp = res
    return _bwd_xla(x, dy, wd, wp)


fused_dwsep.defvjp(_vjp_fwd, _vjp_bwd)


def shapes_supported(c: int, h: int, w: int, o: int, itemsize: int = 2) -> bool:
    """Geometry gate for the forward kernel. C > 32 overflows Mosaic's
    16 MB scoped-VMEM stack at th=32 (measured: C=64 at 100x76 needs
    16.8 MB) — those are the small deep levels where XLA's lowering is
    cheap anyway. All C <= 32 production geometries compile and win."""
    if c > 32 or o > 32:
        return False
    th = _tile_rows(h)
    w_out = _round_up(w, 128)
    w_pad = _round_up(w_out + 2, 128)
    win = c * (th + _HB) * w_pad * itemsize
    blocks = 2 * c * (th + _HB) * w_pad * itemsize  # main+halo, double-buffered
    acc = c * th * w_out * 4
    out = o * th * w_out * itemsize * 2
    return win + blocks + acc + out < 10 * 1024 * 1024


def fused_dwsep_fwd_reference(x, wd, wp):
    """Pure-JAX oracle (same contract, float32 output)."""
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

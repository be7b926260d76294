"""Fused depthwise-separable convolution as a Pallas TPU kernel.

STATUS: experimental groundwork, NOT yet wired into DetectionModel. The
kernels are numerically exact against the pure-JAX reference in interpret
mode (tests/test_pallas_conv.py) and individual constructs compile on TPU,
but this rig's remote Mosaic compiler crashes (opaque HTTP 500, diagnostics
hidden) on the combined backward kernel and on some forward geometries;
profiling also showed XLA's own lowering of the 9-shift formulation is
already within ~3x of the bandwidth bound, so the expected win is modest.
Revisit on an environment with visible Mosaic errors.

The intent: the detection U-Net's high-resolution levels are bound by HBM
passes; in XLA, the channels-first depthwise 3x3 (nine shifted
multiply-adds) plus the pointwise 1x1 einsum re-reads/writes the activation
several times. This kernel computes ``pointwise(depthwise(x))`` in ONE pass
per tile: a row band of the (pre-padded) input is resident in VMEM, the
nine taps accumulate there, and the pointwise contraction runs on the MXU
before a single output write.

The backward pass is a second kernel implementing the hand-derived VJP
(input gradient via the transposed stencil over the pointwise-backprojected
cotangent; both weight gradients accumulated in VMEM across the sequential
grid), wired with ``jax.custom_vjp``.

Mosaic constraints shape the implementation (discovered empirically):
- in-kernel reshapes require the lane (last) dim to be a multiple of 128,
  so all widths that feed the MXU contractions are padded to ``ACC_W =
  round_up(W + 2, 128)`` and sliced back outside the kernel;
- 1D gathers like ``wd_ref[:, dy, dx]`` crash the lowering, so the
  depthwise taps live in a 2D ``[C, 9]`` layout and are read as 2D column
  slices.

Layout contract (channels-first, matching models/detection.py's
high-res path):
    x:  [N, C, H, W]  (bf16 or f32)
    wd: [C, 3, 3]     depthwise taps
    wp: [C, O]        pointwise mixing matrix
    y:  [N, O, H, W]  float32 (pre-batchnorm activations)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target rows per tile; H is split into equal bands of at most this many
# rows (the largest divisor of H that fits).
_MAX_TILE_ROWS = 64
# VMEM budget guard for the auto backend choice (bytes, rough).
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _tile_rows(h: int) -> int:
    for t in range(min(h, _MAX_TILE_ROWS), 0, -1):
        if h % t == 0:
            return t
    return h


def _row_tiles(x: jnp.ndarray, th: int, n_tiles: int) -> jnp.ndarray:
    """[N, C, H, W'] -> [N, n_tiles, C, th, W'] disjoint row bands."""
    n, c, h, w = x.shape
    return x.reshape(n, c, n_tiles, th, w).transpose(0, 2, 1, 3, 4)


def _tap_weight(wd_ref, dy, dx):
    # wd is passed as [C, 9]; a 2D column slice keeps Mosaic happy (1D
    # gathers like wd_ref[:, dy, dx] crash its lowering).
    k = dy * 3 + dx
    return wd_ref[:, k : k + 1].astype(jnp.float32)[:, :, None]  # [C,1,1]


def _dw_taps(x, wd_ref, th, width):
    """Nine shifted multiply-adds over a halo band -> [C, th, width]."""
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = x[:, dy : dy + th, dx : dx + width].astype(jnp.float32)
            term = tap * _tap_weight(wd_ref, dy, dx)
            acc = term if acc is None else acc + term
    return acc


def _fwd_kernel(x_hbm, wd_ref, wp_ref, y_ref, x_vmem, sem, *, th, acc_w):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Manually DMA the overlapping (halo) row band from HBM — halo reads
    # can't be expressed as disjoint BlockSpec blocks. The copied region is
    # tile-aligned (rows x16, lanes x128; Mosaic rejects unaligned DMAs),
    # covering the th+2 rows actually used plus zero margin.
    copy = pltpu.make_async_copy(
        x_hbm.at[i, :, pl.ds(j * th, x_vmem.shape[1]), :], x_vmem, sem
    )
    copy.start()
    copy.wait()
    x = x_vmem[...]  # [C, rows_dma, X_W]
    acc = _dw_taps(x, wd_ref, th, acc_w)  # [C, th, ACC_W]
    c = acc.shape[0]
    y = jax.lax.dot_general(
        wp_ref[...].astype(jnp.float32),
        acc.reshape(c, th * acc_w),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [O, th*ACC_W]
    y_ref[0, 0] = y.reshape(-1, th, acc_w)


def _bwd_kernel(
    x_hbm, dyh_hbm, dyi_ref, wd_ref, wp_ref,
    dx_ref, dwd_ref, dwp_ref,
    x_vmem, dyh_vmem, sems, dwd_acc, dwp_acc,
    *, th, w_valid, acc_w,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * pl.num_programs(1) + j

    @pl.when(step == 0)
    def _():
        dwd_acc[...] = jnp.zeros_like(dwd_acc)
        dwp_acc[...] = jnp.zeros_like(dwp_acc)

    cx = pltpu.make_async_copy(
        x_hbm.at[i, :, pl.ds(j * th, x_vmem.shape[1]), :], x_vmem, sems.at[0]
    )
    cg = pltpu.make_async_copy(
        dyh_hbm.at[i, :, pl.ds(j * th, dyh_vmem.shape[1]), :], dyh_vmem, sems.at[1]
    )
    cx.start()
    cg.start()
    cx.wait()
    cg.wait()
    x = x_vmem[...]  # [C, rows_dma, X_W]
    dy_halo = dyh_vmem[...]  # [O, rows_dma, ACC_W] (1-left/1-top shifted)
    dy_inner = dyi_ref[0, 0]  # [O, th, ACC_W] (unshifted, 0-pad)
    o = dy_halo.shape[0]
    c = x.shape[0]
    rows_dma = dy_halo.shape[1]

    # Backproject cotangent through the pointwise mix:
    # g[c] = sum_o wp[c, o] * dY[o], over the halo band.
    g_flat = jax.lax.dot_general(
        wp_ref[...].astype(jnp.float32),
        dy_halo.astype(jnp.float32).reshape(o, rows_dma * acc_w),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = g_flat.reshape(c, rows_dma, acc_w)

    # dX: transposed stencil — tap (dy, dx) pulls g shifted by (2-dy, 2-dx).
    out_w = dx_ref.shape[-1]
    dx_acc = None
    for dy in range(3):
        for dx in range(3):
            tap = g[:, 2 - dy : 2 - dy + th, 2 - dx : 2 - dx + out_w]
            term = tap * _tap_weight(wd_ref, dy, dx)
            dx_acc = term if dx_acc is None else dx_acc + term
    dx_ref[0, 0] = dx_acc.astype(dx_ref.dtype)

    # dwd[c, k] = sum_hw x[c, h+dy, w+dx] * g_inner[c, h, w]. g beyond the
    # valid width is zero (zero-padded cotangent), so the padded tails
    # contribute nothing. All nine taps concatenate into one [C, 9] update
    # (sliced scratch writes at odd lane offsets upset Mosaic).
    g_inner = g[:, 1 : 1 + th, 1 : 1 + w_valid]
    reds = []
    for dy in range(3):
        for dx in range(3):
            tap = x[:, dy : dy + th, dx : dx + w_valid].astype(jnp.float32)
            reds.append(
                jnp.sum(jnp.sum(tap * g_inner, axis=2), axis=1, keepdims=True)
            )
    dwd_acc[...] += jnp.concatenate(reds, axis=1)
    # dwp[c, o] = sum_hw acc[c, hw] * dY[o, hw], recomputed flash-style; the
    # zero-padded dy_inner kills the out-of-range acc columns.
    acc = _dw_taps(x, wd_ref, th, acc_w)
    dwp_acc[...] += jax.lax.dot_general(
        acc.reshape(c, th * acc_w),
        dy_inner.astype(jnp.float32).reshape(o, th * acc_w),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(step == pl.num_programs(0) * pl.num_programs(1) - 1)
    def _():
        dwd_ref[...] = dwd_acc[...]
        dwp_ref[...] = dwp_acc[...]


def _pad_cols(x, left: int, total: int):
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (left, total - x.shape[-1] - left)))


def _geometry(h: int, w: int, itemsize: int):
    """Tile geometry: rows per band, aligned DMA row count, padded widths."""
    th = _tile_rows(h)
    n_tiles = h // th
    acc_w = _round_up(w + 2, 128)
    sub = 32 // itemsize  # sublane multiple for aligned DMA (16 bf16 / 8 f32)
    rows_dma = _round_up(th + 2, sub)
    x_w = _round_up(acc_w + 2, 128)
    rows_pad = (n_tiles - 1) * th + rows_dma  # so the last band DMA is in range
    return th, n_tiles, acc_w, rows_dma, x_w, rows_pad


def _fwd_call(x, wd, wp, *, interpret):
    n, c, h, w = x.shape
    o = wp.shape[1]
    itemsize = jnp.dtype(x.dtype).itemsize
    th, n_tiles, acc_w, rows_dma, x_w, rows_pad = _geometry(h, w, itemsize)
    x_pad = _pad_cols(
        jnp.pad(x, ((0, 0), (0, 0), (1, rows_pad - h - 1), (0, 0))), 1, x_w
    )
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, acc_w=acc_w),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; halo DMA
            pl.BlockSpec((c, 9), lambda i, j: (0, 0)),
            pl.BlockSpec((c, o), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, o, th, acc_w), lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, o, th, acc_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, rows_dma, x_w), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_pad, wd.reshape(c, 9), wp)
    y = y.swapaxes(1, 2).reshape(n, o, h, acc_w)
    return y[..., :w]


def _bwd_call(x, dy, wd, wp, *, interpret):
    n, c, h, w = x.shape
    o = wp.shape[1]
    itemsize = jnp.dtype(x.dtype).itemsize
    th, n_tiles, acc_w, rows_dma, x_w, rows_pad = _geometry(h, w, itemsize)
    # dY tiles are f32; use the stricter (larger) row alignment of both.
    rows_dma = _round_up(rows_dma, 16)
    rows_pad = (n_tiles - 1) * th + rows_dma

    x_pad = _pad_cols(
        jnp.pad(x, ((0, 0), (0, 0), (1, rows_pad - h - 1), (0, 0))), 1, x_w
    )
    dy_h = _pad_cols(
        jnp.pad(dy, ((0, 0), (0, 0), (1, rows_pad - h - 1), (0, 0))), 1, acc_w
    )
    dy_i = _pad_cols(dy, 0, acc_w)
    dyi_tiles = _row_tiles(dy_i, th, n_tiles)

    out_w = acc_w - 2  # dX computed over a width that keeps taps in range

    dx, dwd, dwp = pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, w_valid=w, acc_w=acc_w),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x in HBM; halo DMA
            pl.BlockSpec(memory_space=pltpu.ANY),  # dY (halo view) in HBM
            pl.BlockSpec((1, 1, o, th, acc_w), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((c, 9), lambda i, j: (0, 0)),
            pl.BlockSpec((c, o), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c, th, out_w), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((c, 9), lambda i, j: (0, 0)),
            pl.BlockSpec((c, o), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n_tiles, c, th, out_w), x.dtype),
            jax.ShapeDtypeStruct((c, 9), jnp.float32),
            jax.ShapeDtypeStruct((c, o), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, rows_dma, x_w), x.dtype),
            pltpu.VMEM((o, rows_dma, acc_w), dy.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((c, 9), jnp.float32),
            pltpu.VMEM((c, o), jnp.float32),
        ],
        interpret=interpret,
    )(x_pad, dy_h, dyi_tiles, wd.reshape(c, 9), wp)
    dx = dx.swapaxes(1, 2).reshape(n, c, h, out_w)[..., :w]
    return dx, dwd.reshape(c, 3, 3), dwp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dwsep_conv(x, wd, wp, interpret=False):
    """``pointwise(depthwise3x3(x))`` fused in one HBM pass per tile.

    :param x: ``[N, C, H, W]``; :param wd: ``[C, 3, 3]``; :param wp:
        ``[C, O]``. Returns ``[N, O, H, W]`` float32.
    """
    return _fwd_call(x, wd, wp, interpret=interpret)


def _vjp_fwd(x, wd, wp, interpret):
    return _fwd_call(x, wd, wp, interpret=interpret), (x, wd, wp)


def _vjp_bwd(interpret, res, dy):
    x, wd, wp = res
    dx, dwd, dwp = _bwd_call(x, dy, wd, wp, interpret=interpret)
    return dx, dwd.astype(wd.dtype), dwp.astype(wp.dtype)


fused_dwsep_conv.defvjp(_vjp_fwd, _vjp_bwd)


def fused_dwsep_conv_reference(x, wd, wp):
    """Pure-JAX reference implementation of the same contract."""
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
        "nchw,co->nohw", acc, wp.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def shapes_supported(c: int, h: int, w: int, o: int, itemsize: int = 2) -> bool:
    """Whether the fused kernel's tiles fit the VMEM budget."""
    th = _tile_rows(h)
    acc_w = _round_up(w + 2, 128)
    in_tile = c * (th + 2) * (acc_w + 2) * itemsize
    dy_tiles = o * (2 * th + 2) * acc_w * 4
    out_tile = max(o, c) * th * acc_w * 4
    work = c * th * acc_w * 4 * 2
    return (in_tile + dy_tiles + out_tile) * 2 + work < _VMEM_BUDGET
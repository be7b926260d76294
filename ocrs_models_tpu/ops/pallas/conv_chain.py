"""Fused BN->ReLU->dw3x3->pw conv-chain kernel for the detection U-Net.

The detection train step is bandwidth-bound ~20x above "touch every
tensor once" traffic (docs/det_perf.md): XLA cannot fuse the 9-shift
depthwise stencil, the pointwise contraction, the BatchNorm statistics
reduction, and the normalize+ReLU epilogue — every stage re-reads and
re-writes full-resolution tensors. This kernel collapses one
DepthwiseConv block (reference models.py:7-28) into a single HBM pass
per row band using a *split-BN* protocol:

    K(x, fold) = [mask / BN-apply+ReLU prologue] -> dw3x3 -> pw(MXU)
                 -> write y_pre, emit per-band stat partials (sum, sumsq)

BatchNorm's batch statistics are a global reduction, so they cannot live
inside one band-local kernel; instead each kernel *emits* partial moments
of its own pre-BN output (tiny, [O] per band) and *applies* the previous
block's normalize+ReLU as its prologue, with the fold scalars
``inv = scale * rsqrt(var + eps)`` / ``bias' = bias - mean * inv``
computed between kernels by XLA from those moments. Chaining two calls
reproduces DoubleConv (models/detection.py) with the intermediate tensor
touched exactly twice (one write, one read).

The depthwise+pointwise pair runs on the MXU as nine small contractions
with pre-folded weights ``wq[k][o, c] = wd[c, k] * wp[c, o]`` — exact
because ``pw(dw(x))`` is linear: ``y[o] = sum_{c,k} wd[c,k] wp[c,o]
a_k[c]``. This kills the VPU-bound tap math that made the round-1
elementwise kernel formulation lose in the full model.

The prologue is ALSO a matmul: per-channel elementwise broadcasts of the
fold scalars crash this rig's Mosaic compiler in every tested layout
(docs/det_perf.md), so the window carries an extra validity-mask channel
(synthesized in scratch, never materialized in HBM) and the affine runs
as ``z = [diag(inv) | bias] @ [x; mask]`` on the MXU: ``inv*x + bias``
inside the image and exactly 0 outside, which restores the conv's
zero-padding semantics with no per-channel broadcasts.

Band I/O is zero-copy (v2): the kernels read the raw ``[N, C, H, W]``
tensors through three clamped row blocks (prev-halo / main / next-halo —
this rig's Mosaic rejects manual halo DMA), zero garbage rows in the
per-section stores, keep window data at a +1 column offset between
zeroed strips so the three tap columns slice in-bounds, and store
exact-shape outputs — no XLA pad/concat/slice passes surround the
calls.

The op carries a ``jax.custom_vjp``; the backward is a second fused
kernel (``_bwd_kernel``) emitting dx (transposed stencil through the
folded weights, gated through the recomputed prologue), the per-tap
folded weight grads and the fold-scalar grads in one HBM pass per band,
validated against XLA autodiff of the pure-JAX reference.

Measured outcome and construct-by-construct Mosaic findings:
docs/det_perf.md — the pair is correct and compiles at every production
geometry but is RETIRED as a performance path: refuted at the detection
U-Net's C<=32 (round 2) and at the recognition stack's C>=64 (round 3,
2.4-3x slower than XLA's dense conv fwd+bwd at every supported shape).
Kept behind ``OCRS_TPU_FUSED_CONV`` as the split-BN protocol exemplar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HB = 16  # halo band rows; also the row-band quantum (bf16 sublane tile x2)
_MAX_TH = 64  # VMEM-gated per geometry (_pick_th); halo is 2*_HB rows/band

_TAPS = tuple((dy, dx) for dy in range(3) for dx in range(3))


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# Per-kernel scoped-vmem cap, raised from Mosaic's 16 MB default (v5e has
# 128 MB of VMEM; half of it leaves ample room for the runtime's buffers).
_SCOPED_VMEM_LIMIT = 64 * 1024 * 1024
# Geometry budget against that cap, with margin for lowering transients
# the estimate cannot see (measured: real allocation runs up to ~1.4x the
# estimate on this rig's compile helper).
_VMEM_BUDGET = 38 * 1024 * 1024


def _vmem_estimate(c: int, o: int, h: int, w: int, th: int, itemsize: int) -> int:
    """Scoped-VMEM estimate for the *backward* kernel (the larger of the
    pair): x/dyt/activation window scratches, double-buffered row blocks,
    the transient f32 prologue, grad intermediates, and dx out blocks."""
    w_out = _round_up(w, 128)
    w_in = _round_up(w_out + 2, 128)
    ca = c + 1
    rows = th + 2 * _HB
    wins = (ca + o + c) * rows * w_in * itemsize
    in_blocks = 2 * (c + o) * rows * w_out * itemsize
    z = c * rows * w_in * 4  # transient prologue dot result
    grads = 3 * c * th * w_out * 4  # da + dz + x_band (f32)
    out = 2 * c * th * w_out * itemsize
    return wins + in_blocks + z + grads + out


def _pick_th(c: int, o: int, h: int, w: int, itemsize: int = 2) -> int | None:
    """Largest row-band height (multiple of _HB, <= _MAX_TH) whose
    backward fits the VMEM budget; None if even th=_HB does not."""
    tried = set()
    for th in range(_MAX_TH, 0, -_HB):
        th_eff = min(_round_up(h, _HB), th)
        if th_eff in tried:
            continue
        tried.add(th_eff)
        if _vmem_estimate(c, o, h, w, th_eff, itemsize) < _VMEM_BUDGET:
            return th_eff
    return None


def fold_weights(wd: jnp.ndarray, wp: jnp.ndarray) -> jnp.ndarray:
    """``wq[k, o, c] = wd[c, k] * wp[c, o]`` — the dw+pw pair as nine
    rank-C contractions. wd: [C, 3, 3]; wp: [C, O] -> wq: [9, O, C]."""
    c = wd.shape[0]
    return jnp.einsum(
        "ck,co->koc", wd.reshape(c, 9).astype(jnp.float32), wp.astype(jnp.float32)
    )


def _store_masked_sections(win_s, refs, j, th, h, w, c_in):
    """Assemble the window from the three row blocks, zeroing garbage
    rows at store time (clamped edge blocks / block overhang): window row
    ``r`` holds original row ``j*th - _HB + r``; a row is valid iff that
    index is inside ``[0, h)``. Masking the small per-section stores
    avoids materializing a second full-window value (scoped VMEM is the
    binding constraint)."""
    pv_ref, m_ref, nx_ref = refs
    for ref, r0, nrows in [
        (pv_ref, 0, _HB),
        (m_ref, _HB, th),
        (nx_ref, _HB + th, _HB),
    ]:
        val = ref[0]
        win_s[0:c_in, r0 : r0 + nrows, 1 : w + 1] = val
        # Rows can only be invalid at the edges: the prev section at the
        # first band, the main/next sections once the band reaches the
        # image bottom. Re-store masked only there (interior bands — the
        # vast majority — skip the iota/select entirely).
        first_row = j * th - _HB + r0
        edge = (first_row < 0) if r0 == 0 else (first_row + nrows > h)

        @pl.when(edge)
        def _(val=val, r0=r0, nrows=nrows):
            rows_g = (
                jax.lax.broadcasted_iota(jnp.int32, (c_in, nrows, w), 1)
                + j * th
                - _HB
                + r0
            )
            win_s[0:c_in, r0 : r0 + nrows, 1 : w + 1] = jnp.where(
                (rows_g >= 0) & (rows_g < h), val, 0
            )


def _chain_kernel(
    xpv_ref, xm_ref, xnx_ref, daug_ref, wq3_ref, y_ref, s1_ref, s2_ref,
    win_s, a3_s, s1_s, s2_s, *, th, w_out, h, w, bn_relu,
):
    """v2 band kernel: raw (unpadded) inputs via three clamped row blocks.

    Window scratch layout: rows ``[prev _HB][main th][next _HB]`` so that
    window row ``r`` holds original row ``j*th - _HB + r``; columns carry
    a +1 offset (data in ``[1, w+1)``) so the three tap columns slice
    in-bounds. The whole scratch is zeroed once at the first grid step;
    per-step stores only touch the data region, so the strips stay zero.
    Clamped edge blocks and block overhang bring garbage rows — one
    row-validity ``where`` over the window restores zero-padding
    semantics (and the bn_relu mask channel is synthesized from the same
    predicate, never materialized in HBM).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        win_s[...] = jnp.zeros_like(win_s)
        s1_s[...] = jnp.zeros_like(s1_s)
        s2_s[...] = jnp.zeros_like(s2_s)

    c_in = xm_ref.shape[1]
    _store_masked_sections(win_s, (xpv_ref, xm_ref, xnx_ref), j, th, h, w, c_in)

    if bn_relu:
        # Synthesize the validity-mask channel in place (bias router for
        # the matmul prologue; see _daug).
        # 2D (no leading singleton: that i1 shape trips a Mosaic relayout
        # bug) mask-channel synthesis.
        rows_m = jax.lax.broadcasted_iota(
            jnp.int32, (th + 2 * _HB, w), 0
        ) + j * th - _HB
        # Select in f32 (the compare's native layout), then convert: an
        # i1 select with bf16 operands trips a Mosaic relayout bug.
        win_s[c_in, :, 1 : w + 1] = jnp.where(
            (rows_m >= 0) & (rows_m < h), 1.0, 0.0
        ).astype(win_s.dtype)
        win = win_s[...]
        cc = c_in + 1
        z = jax.lax.dot_general(
            daug_ref[...].astype(win.dtype),
            win.reshape(cc, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        win_s[0:c_in, :, :] = (
            jnp.maximum(z, 0).astype(win.dtype).reshape(c_in, *win.shape[1:])
        )
    # Taps grouped by lane shift: three rotated copies into a3_s, then
    # three K=3C contractions over row (sublane) offsets — 3 instead of 9
    # lane-rotated operand materializations, 3x the MXU K-efficiency.
    for dx in range(3):
        a3_s[dx * c_in : (dx + 1) * c_in, :, :] = win_s[
            0:c_in, :, dx : dx + w_out
        ]
    acc = None  # [O, th * w_out] f32
    for dy in range(3):
        tap = a3_s[:, _HB - 1 + dy : _HB - 1 + dy + th, :].reshape(
            3 * c_in, th * w_out
        )
        term = jax.lax.dot_general(
            wq3_ref[dy].astype(win_s.dtype),
            tap,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    # Mask out-of-image output positions (edge rows/cols pick up border
    # data through their taps) before the stat sums; the store then
    # slices the exact width.
    rows_o = jax.lax.broadcasted_iota(jnp.int32, (th, w_out), 0) + j * th
    cols_o = jax.lax.broadcasted_iota(jnp.int32, (th, w_out), 1)
    omask = ((rows_o < h) & (cols_o < w)).astype(jnp.float32).reshape(1, th * w_out)
    acc = acc * omask
    y_ref[0] = acc.reshape(-1, th, w_out)[:, :, 0:w].astype(y_ref.dtype)
    s1_s[...] += jnp.sum(acc, axis=1)[None, :]
    s2_s[...] += jnp.sum(acc * acc, axis=1)[None, :]

    @pl.when(
        jnp.logical_and(i == pl.num_programs(0) - 1, j == pl.num_programs(1) - 1)
    )
    def _():
        s1_ref[...] = s1_s[...]
        s2_ref[...] = s2_s[...]


def _daug(inv, bias):
    """``[diag(inv) | bias]``: the BN fold as a ``[C, C+1]`` matrix over
    the mask-augmented channels."""
    return jnp.concatenate(
        [jnp.diag(inv.astype(jnp.float32)), bias.astype(jnp.float32)[:, None]],
        axis=1,
    )


def _row_specs(c, th, w, n_hb):
    """The three clamped row-block specs (prev-halo, main, next-halo).
    Clamping only ever triggers when every row the section would cover is
    outside the image, so the row-validity mask makes it safe."""
    r = th // _HB
    return [
        pl.BlockSpec(
            (1, c, _HB, w), lambda i, j: (i, 0, jnp.maximum(j * r - 1, 0), 0)
        ),
        pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0)),
        pl.BlockSpec(
            (1, c, _HB, w),
            lambda i, j: (i, 0, jnp.minimum((j + 1) * r, n_hb - 1), 0),
        ),
    ]


def _fwd_call(x, inv, bias, wq, bn_relu, interpret):
    n, c, h, w = x.shape
    o = wq.shape[1]
    th = _pick_th(c, o, h, w, jnp.dtype(x.dtype).itemsize)
    if th is None:
        raise ValueError(
            f"conv_chain: geometry C={c} O={o} {h}x{w} ({x.dtype}) exceeds "
            "the kernel's VMEM budget — gate calls with "
            "chain_shapes_supported()"
        )
    n_tiles = -(-h // th)
    n_hb = -(-h // _HB)
    w_out = _round_up(w, 128)
    w_in = _round_up(w_out + 2, 128)
    ca = c + 1 if bn_relu else c
    daug = _daug(inv, bias) if bn_relu else jnp.zeros((c, c + 1), jnp.float32)
    wq3 = (
        wq.reshape(3, 3, o, c).transpose(0, 2, 1, 3).reshape(3, o, 3 * c)
    )
    y, s1, s2 = pl.pallas_call(
        functools.partial(
            _chain_kernel, th=th, w_out=w_out, h=h, w=w, bn_relu=bn_relu
        ),
        grid=(n, n_tiles),
        in_specs=_row_specs(c, th, w, n_hb)
        + [
            pl.BlockSpec((c, c + 1), lambda i, j: (0, 0)),
            pl.BlockSpec((3, o, 3 * c), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, o, th, w), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, o), lambda i, j: (0, 0)),
            pl.BlockSpec((1, o), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, o, h, w), x.dtype),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ca, th + 2 * _HB, w_in), x.dtype),
            pltpu.VMEM((3 * c, th + 2 * _HB, w_out), x.dtype),
            pltpu.VMEM((1, o), jnp.float32),
            pltpu.VMEM((1, o), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_LIMIT
        ),
        interpret=interpret,
    )(x, x, x, daug, wq3)
    return y, s1[0], s2[0]


def conv_chain_wq_reference(x, inv, bias, wq, bn_relu):
    """Pure-JAX oracle with the kernel's dtype policy: prologue in the
    activation dtype, taps in x.dtype with f32 accumulation.
    Returns (y in x.dtype, s1 [O] f32, s2 [O] f32)."""
    n, c, h, w = x.shape
    if bn_relu:
        a = jnp.maximum(
            x * inv[None, :, None, None].astype(x.dtype)
            + bias[None, :, None, None].astype(x.dtype),
            0,
        )
    else:
        a = x
    ap = jnp.pad(a, ((0, 0), (0, 0), (1, 1), (1, 1)))
    wq = wq.astype(x.dtype)  # [9, O, C]
    acc = None
    for k, (dy, dx) in enumerate(_TAPS):
        tap = ap[:, :, dy : dy + h, dx : dx + w]
        term = jnp.einsum(
            "oc,nchw->nohw", wq[k], tap, preferred_element_type=jnp.float32
        )
        acc = term if acc is None else acc + term
    s1 = jnp.sum(acc, axis=(0, 2, 3))
    s2 = jnp.sum(acc * acc, axis=(0, 2, 3))
    return acc.astype(x.dtype), s1, s2


def conv_chain_reference(x, inv, bias, wd, wp, bn_relu):
    """Depthwise-separable oracle (wq folded from wd/wp)."""
    return conv_chain_wq_reference(x, inv, bias, fold_weights(wd, wp), bn_relu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv_chain_wq(x, inv, bias, wq, bn_relu=True, interpret=False):
    """One fused conv-block pass (split-BN protocol) over per-tap weights.

    ``wq[k][o, c]`` is the 3x3 conv expressed as nine rank-C
    contractions — an arbitrary dense 3x3 conv (``wq[k] = W[ky, kx].T``)
    or a folded depthwise-separable pair (:func:`fold_weights`; see
    :func:`conv_chain`).

    :param x: ``[N, C, H, W]`` — the previous block's *pre-BN* output (or
        an already-activated / raw tensor when ``bn_relu=False``).
    :param inv: ``[C]`` f32 fold scale (ignored when ``bn_relu=False``).
    :param bias: ``[C]`` f32 fold shift (ignored when ``bn_relu=False``).
    :return: ``(y_pre [N, O, H, W] in x.dtype, s1 [O] f32, s2 [O] f32)``
        where s1/s2 are sums of y_pre and y_pre**2 over (N, H, W).
    """
    return _fwd_call(x, inv, bias, wq, bn_relu, interpret)


def conv_chain(x, inv, bias, wd, wp, bn_relu=True, interpret=False):
    """Fused DepthwiseConv block pass: ``conv_chain_wq`` over the folded
    weights; wd/wp grads flow through :func:`fold_weights` by autodiff."""
    return conv_chain_wq(x, inv, bias, fold_weights(wd, wp), bn_relu, interpret)


def _bwd_kernel(
    xpv_ref, xm_ref, xnx_ref, gpv_ref, gm_ref, gnx_ref, daug_ref, wq_ref,
    dx_ref, dwq_ref, dinv_ref, dbias_ref,
    xwin_s, gwin_s, a_s, dwq_s, dinv_s, dbias_s,
    *, th, w_out, h, w, bn_relu,
):
    """v2 fused backward: raw inputs via clamped row blocks (see
    _chain_kernel for the window layout), one HBM pass per band.

    Emits dx (transposed stencil through the folded weights, gated
    through the recomputed prologue), per-tap weight grads and the
    fold-scalar grads, accumulated in VMEM scratch across the sequential
    grid and written at the last step.

    Mosaic construct notes (bisected on the rig): the relu gate compares
    in f32 (no bf16 compare on this target) on the 3D activation slice
    (reshaping the i1 gate crashes the compiler); the fold-grad
    reductions run 2D with lane-axis sums (3D outer-dim reductions also
    crash); converts happen before reshapes (type-mismatched
    vector.broadcast otherwise).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        xwin_s[...] = jnp.zeros_like(xwin_s)
        gwin_s[...] = jnp.zeros_like(gwin_s)
        dwq_s[...] = jnp.zeros_like(dwq_s)
        dinv_s[...] = jnp.zeros_like(dinv_s)
        dbias_s[...] = jnp.zeros_like(dbias_s)

    c = xm_ref.shape[1]
    o = gm_ref.shape[1]
    _store_masked_sections(xwin_s, (xpv_ref, xm_ref, xnx_ref), j, th, h, w, c)
    _store_masked_sections(gwin_s, (gpv_ref, gm_ref, gnx_ref), j, th, h, w, o)

    if bn_relu:
        rows_m = jax.lax.broadcasted_iota(
            jnp.int32, (th + 2 * _HB, w), 0
        ) + j * th - _HB
        # Select in f32 (the compare's native layout), then convert: an
        # i1 select with bf16 operands trips a Mosaic relayout bug.
        xwin_s[c, :, 1 : w + 1] = jnp.where(
            (rows_m >= 0) & (rows_m < h), 1.0, 0.0
        ).astype(xwin_s.dtype)
        xw = xwin_s[...]
        z = jax.lax.dot_general(
            daug_ref[...].astype(xw.dtype),
            xw.reshape(c + 1, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a_s[...] = jnp.maximum(z, 0).astype(xw.dtype).reshape(c, *xw.shape[1:])
        a_ref = a_s
    else:
        a_ref = xwin_s  # channels [0:c]; garbage rows zeroed at store

    # da = transposed stencil of dyt through the folded weights.
    da = None  # [C, th * w_out] f32
    for k, (dy, dx) in enumerate(_TAPS):
        g_k = gwin_s[
            :, _HB + 1 - dy : _HB + 1 - dy + th, 2 - dx : 2 - dx + w_out
        ].reshape(o, th * w_out)
        term = jax.lax.dot_general(
            wq_ref[k].astype(gwin_s.dtype),
            g_k,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = term if da is None else da + term

    # Weight grads: pair dyt's band with the tap-shifted activations.
    g_band = gwin_s[:, _HB : _HB + th, 1 : 1 + w_out].reshape(o, th * w_out)
    for k, (dy, dx) in enumerate(_TAPS):
        a_k = a_ref[
            0:c, _HB - 1 + dy : _HB - 1 + dy + th, dx : dx + w_out
        ].reshape(c, th * w_out)
        dwq_s[k] += jax.lax.dot_general(
            g_band,
            a_k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if bn_relu:
        gate = a_s[0:c, _HB : _HB + th, 1 : 1 + w_out].astype(jnp.float32) > 0
        dz3 = jnp.where(gate, da.reshape(c, th, w_out), 0)
        dz = dz3.reshape(c, th * w_out)
        x_band = (
            xwin_s[0:c, _HB : _HB + th, 1 : 1 + w_out]
            .astype(jnp.float32)
            .reshape(c, th * w_out)
        )
        dinv_s[...] += jnp.sum(dz * x_band, axis=1)[None, :]
        dbias_s[...] += jnp.sum(dz, axis=1)[None, :]
        # dx = inv * dz, again on the MXU (daug[:, :C] is diag(inv)).
        dx = jax.lax.dot_general(
            daug_ref[:, 0:c].astype(dz.dtype),
            dz,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        dx = da
    dx_ref[0] = dx.reshape(c, th, w_out)[:, :, 0:w].astype(dx_ref.dtype)

    @pl.when(
        jnp.logical_and(i == pl.num_programs(0) - 1, j == pl.num_programs(1) - 1)
    )
    def _():
        dwq_ref[...] = dwq_s[...]
        dinv_ref[...] = dinv_s[...]
        dbias_ref[...] = dbias_s[...]


def _bwd_call(x, dyt, inv, bias, wq, bn_relu, interpret):
    n, c, h, w = x.shape
    o = wq.shape[1]
    th = _pick_th(c, o, h, w, jnp.dtype(x.dtype).itemsize)
    if th is None:
        raise ValueError(
            f"conv_chain: geometry C={c} O={o} {h}x{w} ({x.dtype}) exceeds "
            "the kernel's VMEM budget — gate calls with "
            "chain_shapes_supported()"
        )
    n_tiles = -(-h // th)
    n_hb = -(-h // _HB)
    w_out = _round_up(w, 128)
    w_in = _round_up(w_out + 2, 128)
    ca = c + 1 if bn_relu else c
    daug = _daug(inv, bias) if bn_relu else jnp.zeros((c, c + 1), jnp.float32)
    dx, dwq, dinv, dbias = pl.pallas_call(
        functools.partial(
            _bwd_kernel, th=th, w_out=w_out, h=h, w=w, bn_relu=bn_relu
        ),
        grid=(n, n_tiles),
        in_specs=_row_specs(c, th, w, n_hb)
        + _row_specs(o, th, w, n_hb)
        + [
            pl.BlockSpec((c, c + 1), lambda i, j: (0, 0)),
            pl.BlockSpec((9, o, c), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((9, o, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, h, w), x.dtype),
            jax.ShapeDtypeStruct((9, o, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ca, th + 2 * _HB, w_in), x.dtype),
            pltpu.VMEM((o, th + 2 * _HB, w_in), x.dtype),
            pltpu.VMEM((c if bn_relu else 1, th + 2 * _HB, w_in), x.dtype),
            pltpu.VMEM((9, o, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_LIMIT
        ),
        interpret=interpret,
    )(x, x, x, dyt, dyt, dyt, daug, wq)
    return dx, dwq, dinv[0], dbias[0]


def _vjp_fwd(bn_relu, interpret, x, inv, bias, wq):
    y, s1, s2 = _fwd_call(x, inv, bias, wq, bn_relu, interpret)
    return (y, s1, s2), (x, y, inv, bias, wq)


def _vjp_bwd(bn_relu, interpret, res, cot):
    x, y, inv, bias, wq = res
    dy, ds1, ds2 = cot
    # Total cotangent on the pre-BN output, folding the moment outputs'
    # grads in one XLA elementwise pass (zero outside the image by
    # construction: y and dy are exact-sized).
    dyt = (
        dy.astype(jnp.float32)
        + ds1[None, :, None, None]
        + 2.0 * y.astype(jnp.float32) * ds2[None, :, None, None]
    ).astype(x.dtype)
    dx, dwq, dinv, dbias = _bwd_call(x, dyt, inv, bias, wq, bn_relu, interpret)
    if not bn_relu:
        dinv = jnp.zeros_like(inv)
        dbias = jnp.zeros_like(bias)
    return (
        dx,
        dinv.astype(inv.dtype),
        dbias.astype(bias.dtype),
        dwq.astype(wq.dtype),
    )


conv_chain_wq.defvjp(
    lambda x, inv, bias, wq, bn_relu, interpret: _vjp_fwd(
        bn_relu, interpret, x, inv, bias, wq
    ),
    _vjp_bwd,
)


def chain_shapes_supported(c: int, o: int, h: int, w: int, itemsize: int = 2) -> bool:
    """Geometry gate for the chain kernel pair."""
    if c < 8:
        # C=1 (the image-input block) makes the weight-grad contraction a
        # degenerate [O, C=1] matvec whose Mosaic lowering hits a
        # type-mismatched vector.broadcast bug at wide geometries; the
        # standard XLA path is cheap there anyway.
        return False
    return _pick_th(c, o, h, w, itemsize) is not None

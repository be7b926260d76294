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
(docs/det_perf.md), so the input carries an extra validity-mask channel
(1 inside the image — zero-padding makes it 0 everywhere else) and the
affine runs as ``z = [diag(inv) | bias] @ [x; mask]`` on the MXU:
``inv*x + bias`` inside the image and exactly 0 outside, which restores
the conv's zero-padding semantics with no in-kernel masking.

Row-halo handling is a BlockSpec two-band trick (this rig's Mosaic
rejects manual halo DMA): the same padded input is
passed twice, a ``th``-row main band plus a ``_HB``-row halo band
starting exactly at the band end, assembled into a ``(th+2)``-row window
in VMEM scratch.

The op carries a ``jax.custom_vjp``; the backward is a second fused
kernel (``_bwd_kernel``) emitting dx (transposed stencil through the
folded weights, gated through the recomputed prologue), the per-tap
folded weight grads and the fold-scalar grads in one HBM pass per band,
validated against XLA autodiff of the pure-JAX reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HB = 16  # halo band rows; also the row-band quantum (bf16 sublane tile x2)
_MAX_TH = 32  # larger row bands crash this rig's Mosaic at C>=16

_TAPS = tuple((dy, dx) for dy in range(3) for dx in range(3))


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# Per-kernel scoped-vmem cap, raised from Mosaic's 16 MB default (v5e has
# 128 MB of VMEM; 32 MB leaves ample room for the runtime's own buffers).
_SCOPED_VMEM_LIMIT = 32 * 1024 * 1024
# Geometry budget against that cap, with margin for lowering transients
# the estimate cannot see (measured: real allocation runs up to ~1.4x the
# estimate on this rig's compile helper).
_VMEM_BUDGET = 22 * 1024 * 1024


def _vmem_estimate(c: int, o: int, h: int, w: int, th: int, itemsize: int) -> int:
    """Scoped-VMEM estimate for the *backward* kernel (the larger of the
    pair): x/dyt/activation window scratches, double-buffered in blocks,
    the transient f32 prologue, grad intermediates, and dx out blocks."""
    w_out = _round_up(w, 128)
    w_pad = _round_up(w_out + 2, 128)
    ca = c + 1
    rows = th + _HB
    wins = (ca + o + c) * rows * w_pad * itemsize
    in_blocks = 2 * (ca + o) * rows * w_pad * itemsize
    z = c * rows * w_pad * 4  # transient prologue dot result
    grads = 3 * c * th * w_out * 4  # da + dz + x_band (f32)
    out = 2 * c * th * w_out * itemsize
    return wins + in_blocks + z + grads + out


def _pick_th(c: int, o: int, h: int, w: int, itemsize: int = 2) -> int | None:
    """Largest row-band height (multiple of _HB, <= _MAX_TH) whose
    backward fits the VMEM budget; None if even th=_HB does not."""
    for th in range(_MAX_TH, 0, -_HB):
        th_eff = min(_round_up(h, _HB), th)
        if _vmem_estimate(c, o, h, w, th_eff, itemsize) < _VMEM_BUDGET:
            return th_eff
        if th_eff < th:
            break
    return None


def fold_weights(wd: jnp.ndarray, wp: jnp.ndarray) -> jnp.ndarray:
    """``wq[k, o, c] = wd[c, k] * wp[c, o]`` — the dw+pw pair as nine
    rank-C contractions. wd: [C, 3, 3]; wp: [C, O] -> wq: [9, O, C]."""
    c = wd.shape[0]
    return jnp.einsum(
        "ck,co->koc", wd.reshape(c, 9).astype(jnp.float32), wp.astype(jnp.float32)
    )


def _chain_kernel(
    xm_ref, xh_ref, daug_ref, wq_ref, y_ref, s1_ref, s2_ref, win_s, s1_s, s2_s,
    *, th, w_out, h, w, bn_relu,
):
    win_s[:, 0:th, :] = xm_ref[0]
    win_s[:, th : th + _HB, :] = xh_ref[0]
    win = win_s[...]  # [C(+1), th+_HB, w_pad]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        s1_s[...] = jnp.zeros_like(s1_s)
        s2_s[...] = jnp.zeros_like(s2_s)

    if bn_relu:
        # Matmul prologue: per-channel elementwise broadcasts of the fold
        # scalars crash this rig's Mosaic compiler in every layout, so the
        # affine runs on the MXU instead. The input carries an extra
        # validity-mask channel (1 inside the image, 0 in padding) and
        # daug = [diag(inv) | bias] so that
        #   z = daug @ [x; mask] = inv*x + bias inside, exactly 0 outside
        # — which also restores the conv's zero-padding semantics with no
        # in-kernel iota masking.
        cc = win.shape[0]  # C + 1
        win2 = win.reshape(cc, -1)
        z = jax.lax.dot_general(
            daug_ref[...].astype(win.dtype),
            win2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Store the activations back into the (now dead) window scratch
        # instead of a second buffer — scoped VMEM is the binding
        # constraint at the big geometries.
        win_s[0 : cc - 1, :, :] = (
            jnp.maximum(z, 0).astype(win.dtype).reshape(-1, *win.shape[1:])
        )
        a = win_s[0 : cc - 1, :, :]
    else:
        # Padding in xp is already zero; rows beyond h / cols beyond w too.
        a = win

    acc = None  # [O, th * w_out] f32
    for k, (dy, dx) in enumerate(_TAPS):
        tap = a[:, dy : dy + th, dx : dx + w_out].reshape(a.shape[0], th * w_out)
        term = jax.lax.dot_general(
            wq_ref[k].astype(a.dtype),
            tap,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    # Mask out-of-image output positions: they are NOT all zero (the conv
    # at a row/col just past the edge still sees border data through its
    # upper taps) and must not pollute the batch-stat sums.
    rows_o = jax.lax.broadcasted_iota(jnp.int32, (th, w_out), 0) + j * th
    cols_o = jax.lax.broadcasted_iota(jnp.int32, (th, w_out), 1)
    omask = ((rows_o < h) & (cols_o < w)).astype(jnp.float32).reshape(1, th * w_out)
    acc = acc * omask
    y_ref[0] = acc.reshape(-1, th, w_out).astype(y_ref.dtype)
    # Batch-stat moments accumulate in VMEM scratch across the whole
    # (sequential) grid; written out once at the final step. Partial
    # per-band output blocks would violate the TPU (8, 128) block tiling
    # rule — whole-array blocks are exempt.
    s1_s[...] += jnp.sum(acc, axis=1)[None, :]
    s2_s[...] += jnp.sum(acc * acc, axis=1)[None, :]

    @pl.when(
        jnp.logical_and(i == pl.num_programs(0) - 1, j == pl.num_programs(1) - 1)
    )
    def _():
        s1_ref[...] = s1_s[...]
        s2_ref[...] = s2_s[...]


def _augment(x):
    """Append the validity-mask channel (1 inside the image; the later
    zero-padding makes it 0 everywhere else)."""
    n, c, h, w = x.shape
    return jnp.concatenate([x, jnp.ones((n, 1, h, w), x.dtype)], axis=1)


def _daug(inv, bias):
    """``[diag(inv) | bias]``: the BN fold as a ``[C, C+1]`` matrix over
    the mask-augmented channels."""
    return jnp.concatenate(
        [jnp.diag(inv.astype(jnp.float32)), bias.astype(jnp.float32)[:, None]],
        axis=1,
    )


def _fwd_call(x, inv, bias, wq, bn_relu, interpret):
    n, c, h, w = x.shape
    o = wq.shape[1]
    th = _pick_th(c, o, h, w, jnp.dtype(x.dtype).itemsize)
    n_tiles = -(-h // th)
    h_tiled = n_tiles * th
    w_out = _round_up(w, 128)
    w_pad = _round_up(w_out + 2, 128)
    xa = _augment(x) if bn_relu else x
    ca = xa.shape[1]
    xp = jnp.pad(
        xa, ((0, 0), (0, 0), (1, h_tiled - h + _HB - 1), (1, w_pad - w - 1))
    )
    daug = _daug(inv, bias) if bn_relu else jnp.zeros((c, c + 1), jnp.float32)
    y, s1, s2 = pl.pallas_call(
        functools.partial(
            _chain_kernel, th=th, w_out=w_out, h=h, w=w, bn_relu=bn_relu
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, ca, th, w_pad), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec(
                (1, ca, _HB, w_pad), lambda i, j: (i, 0, (j + 1) * (th // _HB), 0)
            ),
            pl.BlockSpec((c, c + 1), lambda i, j: (0, 0)),
            pl.BlockSpec((9, o, c), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, o, th, w_out), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, o), lambda i, j: (0, 0)),
            pl.BlockSpec((1, o), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, o, h_tiled, w_out), x.dtype),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ca, th + _HB, w_pad), x.dtype),
            pltpu.VMEM((1, o), jnp.float32),
            pltpu.VMEM((1, o), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_LIMIT
        ),
        interpret=interpret,
    )(xp, xp, daug, wq)
    return y[:, :, :h, :w], s1[0], s2[0]


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
    xm_ref, xh_ref, gm_ref, gh_ref, daug_ref, wq_ref,
    dx_ref, dwq_ref, dinv_ref, dbias_ref,
    xwin_s, gwin_s, a_s, dwq_s, dinv_s, dbias_s,
    *, th, w_out, h, w, bn_relu,
):
    """Fused backward: one HBM pass per row band.

    Reads the saved input band ``x`` and the precomputed total output
    cotangent ``dyt`` (both with halo), recomputes the prologue
    activations flash-style, and emits: ``dx`` (transposed stencil via 9
    MXU contractions, gated through the prologue), per-tap folded weight
    grads ``dwq`` and the fold-scalar grads, accumulated in VMEM scratch
    across the sequential grid and written at the last step.

    Index geometry: window row ``r`` is original row ``band_start + r - 1``
    (both padded arrays carry one top pad row). ``da``'s band row ``p``
    reads ``dyt`` window row ``p + 2 - dy``; weight-grad tap ``k`` pairs
    ``dyt``'s band (window rows ``1..1+th``) with ``a`` window rows
    ``dy..dy+th``.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dwq_s[...] = jnp.zeros_like(dwq_s)
        dinv_s[...] = jnp.zeros_like(dinv_s)
        dbias_s[...] = jnp.zeros_like(dbias_s)

    xwin_s[:, 0:th, :] = xm_ref[0]
    xwin_s[:, th : th + _HB, :] = xh_ref[0]
    gwin_s[:, 0:th, :] = gm_ref[0]
    gwin_s[:, th : th + _HB, :] = gh_ref[0]
    xwin = xwin_s[...]  # [C(+1), th+_HB, w_pad]
    gwin = gwin_s[...]  # [O, th+_HB, w_pad]; zero outside the valid image

    o = gwin.shape[0]
    if bn_relu:
        # Matmul prologue over the mask-augmented channels (see
        # _chain_kernel): z is inv*x + bias inside the image, exactly 0
        # outside; the strict relu gate therefore also zeroes padding.
        # Activations land in their own scratch so the f32 z is never
        # retained (scoped VMEM is the binding constraint), and the gate
        # below uses a > 0 — identical to z > 0 through the relu.
        c = xwin.shape[0] - 1
        z = jax.lax.dot_general(
            daug_ref[...].astype(xwin.dtype),
            xwin.reshape(c + 1, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, (th+_HB)*w_pad] f32
        a_s[...] = jnp.maximum(z, 0).astype(xwin.dtype).reshape(
            c, *xwin.shape[1:]
        )
        a = a_s[...]
    else:
        c = xwin.shape[0]
        a = xwin

    # da = transposed stencil of dyt through the folded weights.
    da = None  # [C, th * w_out] f32
    for k, (dy, dx) in enumerate(_TAPS):
        g_k = gwin[:, 2 - dy : 2 - dy + th, 2 - dx : 2 - dx + w_out].reshape(
            o, th * w_out
        )
        term = jax.lax.dot_general(
            wq_ref[k].astype(gwin.dtype),
            g_k,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = term if da is None else da + term

    # Weight grads: pair dyt's band with the tap-shifted activations.
    g_band = gwin[:, 1 : 1 + th, 1 : 1 + w_out].reshape(o, th * w_out)
    for k, (dy, dx) in enumerate(_TAPS):
        a_k = a[:, dy : dy + th, dx : dx + w_out].reshape(c, th * w_out)
        dwq_s[k] += jax.lax.dot_general(
            g_band,
            a_k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if bn_relu:
        # Mosaic construct notes (bisected on the rig): the relu gate must
        # be applied as a 3D `where` (reshaping the i1 gate crashes the
        # compiler), while the fold-grad reductions must run 2D with
        # lane-axis sums (3D reductions to the outer dim also crash; the
        # 2D form is what the forward's stat sums already proved out).
        # f32 compare: the VPU has no bf16 comparison ("Target does not
        # support this comparison") — likely also why every bf16
        # elementwise-affine prologue variant crashed the helper.
        gate = a[:, 1 : 1 + th, 1 : 1 + w_out].astype(jnp.float32) > 0
        dz3 = jnp.where(gate, da.reshape(c, th, w_out), 0)
        dz = dz3.reshape(c, th * w_out)
        # Convert BEFORE the reshape: convert-after-slice-reshape lowers
        # to a type-mismatched vector.broadcast (Mosaic verifier bug).
        x_band = (
            xwin[:c, 1 : 1 + th, 1 : 1 + w_out]
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
    dx_ref[0] = dx.reshape(c, th, w_out).astype(dx_ref.dtype)

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
    n_tiles = -(-h // th)
    h_tiled = n_tiles * th
    w_out = _round_up(w, 128)
    w_pad = _round_up(w_out + 2, 128)
    pad = ((0, 0), (0, 0), (1, h_tiled - h + _HB - 1), (1, w_pad - w - 1))
    xa = _augment(x) if bn_relu else x
    ca = xa.shape[1]
    xp = jnp.pad(xa, pad)
    gp = jnp.pad(dyt, pad)
    daug = _daug(inv, bias) if bn_relu else jnp.zeros((c, c + 1), jnp.float32)
    dx, dwq, dinv, dbias = pl.pallas_call(
        functools.partial(
            _bwd_kernel, th=th, w_out=w_out, h=h, w=w, bn_relu=bn_relu
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, ca, th, w_pad), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec(
                (1, ca, _HB, w_pad), lambda i, j: (i, 0, (j + 1) * (th // _HB), 0)
            ),
            pl.BlockSpec((1, o, th, w_pad), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec(
                (1, o, _HB, w_pad), lambda i, j: (i, 0, (j + 1) * (th // _HB), 0)
            ),
            pl.BlockSpec((c, c + 1), lambda i, j: (0, 0)),
            pl.BlockSpec((9, o, c), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, th, w_out), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((9, o, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, h_tiled, w_out), x.dtype),
            jax.ShapeDtypeStruct((9, o, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ca, th + _HB, w_pad), x.dtype),
            pltpu.VMEM((o, th + _HB, w_pad), x.dtype),
            pltpu.VMEM((c, th + _HB, w_pad), x.dtype),
            pltpu.VMEM((9, o, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_LIMIT
        ),
        interpret=interpret,
    )(xp, xp, gp, gp, daug, wq)
    return dx[:, :, :h, :w], dwq, dinv[0], dbias[0]


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

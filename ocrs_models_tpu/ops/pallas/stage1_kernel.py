"""Fused recognition stage-1 Pallas kernel: conv(1->C) + bias + ReLU + 2x2 maxpool.

Why: the recognition conv stack's stage 1 (3x3 conv over [N, 64, W, 1],
C_in=1) costs 8.7 ms fwd+bwd of the 32 ms wide-bucket step under XLA —
~7x its traffic roofline. The C=1 input defeats XLA's conv tiling, the
C=32 minor dim wastes 3/4 of the vector lanes on every elementwise/pool
pass over the 512 MB intermediate, and every alternative XLA formulation
measured worse (tools/rec_stage_probe*.py: channels-first shifts 3x
slower, slice/reshape pools 2-4x slower). This kernel runs the whole
stage in ONE HBM pass per direction with W on the lanes.

Design:
- **Polyphase W split**: the caller splits x into even/odd W phases (and
  zero-pads both axes), so the 2x2 pool window becomes 4 MXU dot
  segments and the pool is a pure elementwise max — no strided lane
  access anywhere in the kernel.
- **Conv as one MXU contraction per pooled row**: the 9 taps + bias form
  a [C, 10] weight matrix contracted with a [10, 4*W'] patch matrix
  (tap rows are plain shifted slices of the phase slabs; the 10th row is
  ones, folding the bias into the dot — the Mosaic-safe affine-prologue
  trick, per-channel lane broadcasts crash this rig's compiler).
- **Training backward needs NO dx**: stage 1's input is the image (a
  leaf), so the custom VJP computes only dW/db — a second kernel that
  rebuilds the patches, recomputes the pre-activations, applies the
  first-max pool tie-break (XLA select-and-scatter order) and the ReLU
  gate, and accumulates dW10 = d_y4 @ P^T in VMEM scratch across the
  batch grid. dx (needed only if someone differentiates w.r.t. the
  image) falls back to an XLA reference VJP that DCE's away in training.

Replaces (capability): the first conv stage of the reference recognizer
(/root/reference/ocrs_models/models.py:168-180: Conv2d(1,32,3,pad=1) +
ReLU + MaxPool2d(2,2)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16

# Slab index per (parity q, dx tap). The four slabs are the pre-shifted
# phase views (E1, E2, O0, O1) materialized by the caller at lane offset
# 0 — Mosaic cannot concatenate vectors whose sublane rows carry
# different lane offsets, so the dx shifts happen in XLA, not in-kernel.
_TAP_SRC = {
    0: [2, 0, 3],  # even output positions w = 2w':  O0, E1, O1
    1: [0, 3, 1],  # odd output positions  w = 2w'+1: E1, O1, E2
}


def _build_patches(slabs4, wp, dt):
    """Patch matrix [10, 4*W'] for one pooled row.

    :param slabs4: four [4, W'] slab groups (E1, E2, O0, O1) covering conv
        rows 2r-1..2r+2.
    :param wp: pooled width W'.
    Phase order (c, q) = (0,0),(0,1),(1,0),(1,1) — row-major within the
    2x2 window, matching select-and-scatter's first-max scan order.
    """
    phases = []
    for c in (0, 1):
        for q in (0, 1):
            rows = []
            for dy in range(3):
                for dx in range(3):
                    s = slabs4[_TAP_SRC[q][dx]]
                    rows.append(s[c + dy : c + dy + 1, :])
            rows.append(jnp.ones((1, wp), dt))
            phases.append(jnp.concatenate(rows, axis=0))  # [10, W']
    return jnp.concatenate(phases, axis=1)  # [10, 4W']


def _dot(a, b, contract=((1,), (0,))):
    # Pin HIGHEST when the operands are f32 so the checkpoint-parity path
    # (compute_dtype=float32) does not silently run at the MXU's default
    # bf16-operand precision — mirrors gru_kernel4._dot.
    prec = jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        a,
        b,
        (contract, ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def _pool4(r4, wp):
    m01 = jnp.maximum(r4[:, :wp], r4[:, wp : 2 * wp])
    m23 = jnp.maximum(r4[:, 2 * wp : 3 * wp], r4[:, 3 * wp :])
    return jnp.maximum(m01, m23)


def _fwd_kernel(e1_ref, e2_ref, o0_ref, o1_ref, w_ref, out_ref, *, hp, wp, dt):
    # Mosaic constraints shape this loop: dynamic SUBLANE indices must be
    # provable multiples of 8, so input rows load in aligned 24-row groups
    # (start 16g) with static in-group slicing; the output's pooled-row
    # axis is a LEADING (non-tiled) dim of the [1, hp, C, W'] block, so
    # per-row dynamic stores need no alignment and no shape cast.
    w_bf = w_ref[...].astype(dt)  # [C, 10]

    def body(g, _):
        g24 = [
            r[0, pl.ds(16 * g, 24), :]
            for r in (e1_ref, e2_ref, o0_ref, o1_ref)
        ]
        for rl in range(8):
            slabs4 = [a[2 * rl : 2 * rl + 4] for a in g24]
            patches = _build_patches(slabs4, wp, dt)  # [10, 4W']
            y4 = _dot(w_bf, patches)  # [C, 4W'] f32
            m = _pool4(jnp.maximum(y4, 0.0), wp)
            out_ref[0, pl.ds(8 * g + rl, 1), :, :] = m.astype(out_ref.dtype)[
                None
            ]
        return 0

    jax.lax.fori_loop(0, hp // 8, body, 0)


def _bwd_kernel(
    e1_ref, e2_ref, o0_ref, o1_ref, w_ref, dy_ref, dw_ref, dw_s, *, hp, wp, dt
):
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        dw_s[...] = jnp.zeros_like(dw_s)

    w_bf = w_ref[...].astype(dt)

    def body(g, _):
        g24 = [
            r[0, pl.ds(16 * g, 24), :]
            for r in (e1_ref, e2_ref, o0_ref, o1_ref)
        ]
        dy8 = dy_ref[0, pl.ds(8 * g, 8), :, :].astype(jnp.float32)  # [8,C,W']
        for rl in range(8):
            slabs4 = [a[2 * rl : 2 * rl + 4] for a in g24]
            patches = _build_patches(slabs4, wp, dt)
            y4 = _dot(w_bf, patches)  # [C, 4W'] f32
            r4 = jnp.maximum(y4, 0.0)
            m = _pool4(r4, wp)
            dy = dy8[rl]  # [C, W']

            # First-max tie-break in phase order + ReLU gate (grad 0 at
            # y==0).
            taken = jnp.zeros_like(m)
            parts = []
            for p in range(4):
                seg = slice(p * wp, (p + 1) * wp)
                eq = jnp.where(r4[:, seg] == m, 1.0, 0.0) * (1.0 - taken)
                taken = taken + eq
                gate = jnp.where(y4[:, seg] > 0.0, 1.0, 0.0)
                parts.append(dy * eq * gate)
            d4 = jnp.concatenate(parts, axis=1)  # [C, 4W'] f32
            dw_s[...] += _dot(
                d4.astype(dt), patches, contract=((1,), (1,))
            )  # [C, 10]
        return 0

    jax.lax.fori_loop(0, hp // 8, body, 0)

    @pl.when(n == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = dw_s[...]


def _prep(x, kernel, bias, dt):
    """x [N, H, W, 1] -> four pre-shifted phase slabs (E1, E2, O0, O1),
    each [N, H+8, W/2] in ``dt``, and the [C, 10] tap+bias weight matrix
    (tap order dy*3+dx). The dx shifts are materialized HERE (XLA) because
    Mosaic cannot concat in-kernel slices with mismatched lane offsets."""
    xb = x[..., 0].astype(dt)
    wp = xb.shape[2] // 2
    # Rows padded to h+8 (top 1, bottom 7): the kernel's aligned 24-row
    # group loads (start 16g, g < h/16) then end at h+8 exactly.
    pad = ((0, 0), (1, 7), (1, 1))
    e = jnp.pad(xb[:, :, 0::2], pad)
    o = jnp.pad(xb[:, :, 1::2], pad)
    slabs = (
        e[:, :, 1 : 1 + wp],   # E1: x_even[w']
        e[:, :, 2 : 2 + wp],   # E2: x_even[w'+1]
        o[:, :, 0:wp],         # O0: x_odd[w'-1]
        o[:, :, 1 : 1 + wp],   # O1: x_odd[w']
    )
    c = kernel.shape[-1]
    w10 = jnp.concatenate(
        [
            kernel[:, :, 0, :].reshape(9, c).T.astype(jnp.float32),
            bias.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [C, 10]
    return slabs, w10


def _fwd_call(x, kernel, bias, *, interpret, dt=DT):
    n, h, w, _ = x.shape
    c = kernel.shape[-1]
    hp, wp = h // 2, w // 2
    slabs, w10 = _prep(x, kernel, bias, dt)
    y_cf = pl.pallas_call(
        functools.partial(_fwd_kernel, hp=hp, wp=wp, dt=dt),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 10), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp, c, wp), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, c, wp), dt),
        interpret=interpret,
    )(*slabs, w10)
    return y_cf.transpose(0, 1, 3, 2)  # NHWC [N, H/2, W/2, C]


def _bwd_call(x, kernel, bias, dy_nhwc, *, interpret, dt=DT):
    n, h, w, _ = x.shape
    c = kernel.shape[-1]
    hp, wp = h // 2, w // 2
    slabs, w10 = _prep(x, kernel, bias, dt)
    dy_cf = dy_nhwc.transpose(0, 1, 3, 2)  # [N, H/2, C, W']
    dw10 = pl.pallas_call(
        functools.partial(_bwd_kernel, hp=hp, wp=wp, dt=dt),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h + 8, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 10), lambda i: (0, 0)),
            pl.BlockSpec((1, hp, c, wp), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c, 10), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((c, 10), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, 10), jnp.float32)],
        interpret=interpret,
    )(*slabs, w10, dy_cf)
    dkernel = dw10[:, :9].T.reshape(3, 3, 1, c).astype(kernel.dtype)
    dbias = dw10[:, 9].astype(bias.dtype)
    return dkernel, dbias


def _reference_stage1(x, kernel, bias, dt=DT):
    """XLA reference implementation (also the dx path of the VJP)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dt),
        kernel.astype(dt),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dt)
    y = jax.nn.relu(y)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def stage1_fused(x, kernel, bias, interpret=False, dt=DT):
    """Fused conv(1->C, 3x3, pad 1) + bias + ReLU + 2x2/2 maxpool.

    :param x: [N, H, W, 1] float (H, W even).
    :param kernel: [3, 3, 1, C] HWIO weights.
    :param bias: [C].
    :return: [N, H/2, W/2, C] in ``dt`` (NHWC, matching the XLA path).
    """
    return _fwd_call(x, kernel, bias, interpret=interpret, dt=dt)


def _vjp_fwd(x, kernel, bias, interpret, dt):
    y = _fwd_call(x, kernel, bias, interpret=interpret, dt=dt)
    return y, (x, kernel, bias)


def _vjp_bwd(interpret, dt, res, dy):
    x, kernel, bias = res
    dkernel, dbias = _bwd_call(x, kernel, bias, dy, interpret=interpret, dt=dt)
    # dx: XLA reference VJP — dead-code-eliminated whenever the caller does
    # not differentiate w.r.t. the image (always true in training).
    _, ref_vjp = jax.vjp(lambda xx: _reference_stage1(xx, kernel, bias, dt), x)
    (dx,) = ref_vjp(dy.astype(dt))
    return dx.astype(x.dtype), dkernel, dbias


stage1_fused.defvjp(_vjp_fwd, _vjp_bwd)

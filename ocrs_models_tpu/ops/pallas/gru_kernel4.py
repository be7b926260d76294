"""Zero-relayout bidirectional GRU recurrence — Pallas TPU kernel, v4.

v1 (gru_kernel.py) requires the caller to assemble ``px [T, 2, N, 3H]``:
time-reverse the sequence for the backward direction, stack both
directions, transpose to time-major — and to undo all of it on the output
(slice, transpose, un-reverse). Each of those passes moves a 100-200 MB
tensor through HBM, and their VJPs move it again.

v4 keeps v1's per-step math EXACTLY (same per-direction dots, no chunking
— chunking was refuted twice, see docs/rec_perf.md) but moves every
relayout into BlockSpec index maps, which are free:

- the two directions are separate ``[T, N, 3H]`` inputs in NATURAL time
  order; the backward direction's reversal is its index map ``i -> T-1-i``
- outputs are two ``[T, N, H]`` arrays, both written in natural time
  order (the backward direction writes through the reversed map)
- the VJP kernel walks the forward direction reverse-time and the
  backward direction forward-time simultaneously (their scan-transpose
  orders coincide per grid step), emitting ``dpx`` for both directions in
  natural order.

The caller does one [N,T,3H] -> [T,N,3H] transpose per direction (fused
into the projection matmul's output by XLA where possible) and NO stack,
NO reverse, NO output un-reverse.

Contract:
    px_f, px_b: [T, N, 3H] — x @ W_ih + b_ih per direction, both in
        natural time order; f32 or bf16 (the io dtype propagates to the
        ys outputs and dpx cotangents; gate math is always f32)
    w_hh: [2, H, 3H] f32 (torch gate order r, z, n; dir 0 = forward)
    b_hh: [2, 3H] f32
    returns (ys_f, ys_b): [T, N, H] f32, both in natural time order

Replaces (capability): the sequential core of torch ``nn.GRU`` used by
the reference recognizer (/root/reference/ocrs_models/models.py:245).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates1(px_t, ph, h_prev):
    """Single-direction gate math on [N, *] tensors."""
    xr, xz, xn = jnp.split(px_t, 3, axis=-1)
    hr, hz, hn = jnp.split(ph, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    c = jnp.tanh(xn + r * hn)
    new_h = (1.0 - z) * c + z * h_prev
    return r, z, c, new_h, hn


def _dot(a, b, compute_dtype, contract=((1,), (0,))):
    prec = None if compute_dtype != jnp.float32 else jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        (contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _fwd_kernel(pxf_ref, pxb_ref, w_ref, b_ref, ysf_ref, ysb_ref, h_s,
                *, compute_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)

    for d, (px_ref, ys_ref) in enumerate(((pxf_ref, ysf_ref), (pxb_ref, ysb_ref))):
        h = h_s[d]
        ph = _dot(h, w_ref[d], compute_dtype) + b_ref[d][None, :].astype(jnp.float32)
        _, _, _, new_h, _ = _gates1(px_ref[0].astype(jnp.float32), ph, h)
        h_s[d] = new_h
        ys_ref[0] = new_h.astype(ys_ref.dtype)


def _bwd_kernel(
    pxf_ref, pxb_ref, ysf_ref, ysfm1_ref, ysb_ref, ysbp1_ref,
    dyf_ref, dyb_ref, w_ref, b_ref,
    dpxf_ref, dpxb_ref, dw_ref, db_ref,
    dh_s, dw_s, db_s, *, compute_dtype,
):
    j = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        dh_s[...] = jnp.zeros_like(dh_s)
        dw_s[...] = jnp.zeros_like(dw_s)
        db_s[...] = jnp.zeros_like(db_s)

    # Both directions hit their scan-initial step at the LAST grid step:
    # forward dir at real t=0, backward dir at real t=T-1.
    is_first = j == n_steps - 1
    for d, (px_ref, ysm1_ref, dy_ref, dpx_ref) in enumerate((
        (pxf_ref, ysfm1_ref, dyf_ref, dpxf_ref),
        (pxb_ref, ysbp1_ref, dyb_ref, dpxb_ref),
    )):
        # h_prev in scan order: clamped index map + mask at the boundary.
        h_prev = jnp.where(is_first, 0.0, ysm1_ref[0].astype(jnp.float32))
        ph = _dot(h_prev, w_ref[d], compute_dtype) + b_ref[d][None, :].astype(
            jnp.float32
        )
        px_t = px_ref[0].astype(jnp.float32)
        r, z, c, _, hn = _gates1(px_t, ph, h_prev)

        dht = dh_s[d] + dy_ref[0].astype(jnp.float32)
        dc = dht * (1.0 - z)
        da_c = dc * (1.0 - c * c)
        dz = dht * (h_prev - c)
        da_z = dz * z * (1.0 - z)
        dhn = da_c * r
        dr = da_c * hn
        da_r = dr * r * (1.0 - r)

        dph = jnp.concatenate([da_r, da_z, dhn], axis=-1)  # [N, 3H]
        dpx_ref[0] = jnp.concatenate([da_r, da_z, da_c], axis=-1).astype(
            dpx_ref.dtype
        )

        back = _dot(dph, w_ref[d], compute_dtype, contract=((1,), (1,)))
        dh_s[d] = dht * z + back
        dw_s[d] += _dot(h_prev, dph, compute_dtype, contract=((0,), (0,)))
        db_s[d] += jnp.sum(dph, axis=0)

    @pl.when(j == n_steps - 1)
    def _():
        dw_ref[...] = dw_s[...]
        db_ref[...] = db_s[...]


def _fwd_call(px_f, px_b, w_hh, b_hh, *, compute_dtype, interpret):
    t, n, h3 = px_f.shape
    h = h3 // 3

    def nat(i):
        return (i, 0, 0)

    def rev(i):
        return (t - 1 - i, 0, 0)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n, h3), nat),
            pl.BlockSpec((1, n, h3), rev),
            pl.BlockSpec((2, h, h3), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, h3), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, h), nat),
            pl.BlockSpec((1, n, h), rev),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, n, h), px_f.dtype),
            jax.ShapeDtypeStruct((t, n, h), px_f.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, n, h), jnp.float32)],
        interpret=interpret,
    )(px_f, px_b, w_hh, b_hh)


def _bwd_call(px_f, px_b, ys_f, ys_b, dy_f, dy_b, w_hh, b_hh,
              *, compute_dtype, interpret):
    t, n, h3 = px_f.shape
    h = h3 // 3

    def f_t(j):  # forward dir: reverse-time walk
        return (t - 1 - j, 0, 0)

    def f_tm1(j):  # its scan-previous state (real t-1), clamped
        return (jnp.maximum(t - 2 - j, 0), 0, 0)

    def b_t(j):  # backward dir: forward-time walk
        return (j, 0, 0)

    def b_tp1(j):  # its scan-previous state (real t+1), clamped
        return (jnp.minimum(j + 1, t - 1), 0, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n, h3), f_t),
            pl.BlockSpec((1, n, h3), b_t),
            pl.BlockSpec((1, n, h), f_t),
            pl.BlockSpec((1, n, h), f_tm1),
            pl.BlockSpec((1, n, h), b_t),
            pl.BlockSpec((1, n, h), b_tp1),
            pl.BlockSpec((1, n, h), f_t),
            pl.BlockSpec((1, n, h), b_t),
            pl.BlockSpec((2, h, h3), lambda j: (0, 0, 0)),
            pl.BlockSpec((2, h3), lambda j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, h3), f_t),
            pl.BlockSpec((1, n, h3), b_t),
            pl.BlockSpec((2, h, h3), lambda j: (0, 0, 0)),
            pl.BlockSpec((2, h3), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, n, h3), px_f.dtype),
            jax.ShapeDtypeStruct((t, n, h3), px_f.dtype),
            jax.ShapeDtypeStruct((2, h, h3), jnp.float32),
            jax.ShapeDtypeStruct((2, h3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n, h), jnp.float32),
            pltpu.VMEM((2, h, h3), jnp.float32),
            pltpu.VMEM((2, h3), jnp.float32),
        ],
        interpret=interpret,
    )(px_f, px_b, ys_f, ys_f, ys_b, ys_b, dy_f, dy_b, w_hh, b_hh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_recurrence4(px_f, px_b, w_hh, b_hh, compute_dtype=jnp.bfloat16,
                    interpret=False):
    """v4 zero-relayout biGRU recurrence; returns ``(ys_f, ys_b)``."""
    return tuple(
        _fwd_call(px_f, px_b, w_hh, b_hh, compute_dtype=compute_dtype,
                  interpret=interpret)
    )


def _vjp_fwd(px_f, px_b, w_hh, b_hh, compute_dtype, interpret):
    ys_f, ys_b = _fwd_call(
        px_f, px_b, w_hh, b_hh, compute_dtype=compute_dtype, interpret=interpret
    )
    return (ys_f, ys_b), (px_f, px_b, ys_f, ys_b, w_hh, b_hh)


def _vjp_bwd(compute_dtype, interpret, res, dys):
    px_f, px_b, ys_f, ys_b, w_hh, b_hh = res
    dy_f, dy_b = dys
    dpx_f, dpx_b, dw, db = _bwd_call(
        px_f, px_b, ys_f, ys_b, dy_f, dy_b, w_hh, b_hh,
        compute_dtype=compute_dtype, interpret=interpret,
    )
    return dpx_f, dpx_b, dw, db


gru_recurrence4.defvjp(_vjp_fwd, _vjp_bwd)


def gru_recurrence_reference(px, w_hh, b_hh):
    """``lax.scan`` reference implementation of the stacked-direction
    recurrence contract (px [T, 2, N, 3H] -> ys [T, 2, N, H]) — the
    numerical oracle the kernel tests compare against."""

    def step(h, px_t):
        ph = (
            jnp.einsum("dnh,dhk->dnk", h, w_hh, preferred_element_type=jnp.float32)
            + b_hh[:, None, :]
        )
        _, _, _, new_h, _ = _gates1(px_t, ph, h)
        return new_h, new_h

    t, d, n, h3 = px.shape
    h0 = jnp.zeros((d, n, h3 // 3), jnp.float32)
    _, ys = jax.lax.scan(step, h0, px)
    return ys

"""Fused bidirectional GRU recurrence as a Pallas TPU kernel.

The ``lax.scan`` GRU (ops/gru.py) is latency-bound: 65-200 timesteps x 2
layers of tiny matmuls each dispatched as scan iterations. This kernel runs
the whole recurrence in ONE kernel launch: a sequential grid over time with
the hidden state held in VMEM scratch across grid steps, per-step input
projections streamed from HBM with automatic double buffering, and the
recurrent matmul on the MXU.

The backward pass is a second Pallas kernel implementing the hand-derived
GRU VJP (reverse-time grid, gates recomputed flash-style from the saved
hidden states, weight-gradient accumulation in VMEM), wired up via
``jax.custom_vjp``.

Both directions are fused into one kernel by stacking them on a leading
axis (the forward direction consumes the reversed sequence for the
backward direction, prepared by the caller).

Contract (see :func:`gru_recurrence`):
    px:   [T, 2, N, 3H] float32 — precomputed x @ W_ih + b_ih per direction
    w_hh: [2, H, 3H] float32    — recurrent weights (torch gate order r,z,n)
    b_hh: [2, 3H] float32
    ys:   [T, 2, N, H] float32  — hidden states for every step
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates(px_t, ph, h_prev):
    """Shared gate math: returns (r, z, c, new_h, hn)."""
    xr, xz, xn = jnp.split(px_t, 3, axis=-1)
    hr, hz, hn = jnp.split(ph, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    c = jnp.tanh(xn + r * hn)
    new_h = (1.0 - z) * c + z * h_prev
    return r, z, c, new_h, hn


def _recur_matmul(h, w_ref, b_ref, compute_dtype):
    """ph[d] = h[d] @ w[d] + b[d] for both directions, f32 accumulation."""
    outs = []
    for d in range(2):
        lhs = h[d].astype(compute_dtype)
        rhs = w_ref[d].astype(compute_dtype)
        prec = None if compute_dtype != jnp.float32 else jax.lax.Precision.HIGHEST
        outs.append(
            jnp.dot(lhs, rhs, preferred_element_type=jnp.float32, precision=prec)
        )
    ph = jnp.stack(outs)
    return ph + b_ref[...][:, None, :].astype(jnp.float32)


def _fwd_kernel(px_ref, w_ref, b_ref, ys_ref, h_s, *, compute_dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)

    h = h_s[...]
    ph = _recur_matmul(h, w_ref, b_ref, compute_dtype)
    _, _, _, new_h, _ = _gates(px_ref[0].astype(jnp.float32), ph, h)
    h_s[...] = new_h
    ys_ref[0] = new_h


def _bwd_kernel(
    px_ref, ys_ref, ysm1_ref, dy_ref, w_ref, b_ref,
    dpx_ref, dw_ref, db_ref,
    dh_s, dw_s, db_s, *, compute_dtype,
):
    i = pl.program_id(0)  # iterates 0..T-1; maps to t = T-1-i
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_s[...] = jnp.zeros_like(dh_s)
        dw_s[...] = jnp.zeros_like(dw_s)
        db_s[...] = jnp.zeros_like(db_s)

    is_t0 = i == n_steps - 1
    # h_{t-1}: ys[t-1], or zeros at t=0 (ysm1's index map clamps to 0 there,
    # so mask the bogus read).
    h_prev = jnp.where(is_t0, 0.0, ysm1_ref[0])
    px_t = px_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)

    ph = _recur_matmul(h_prev, w_ref, b_ref, compute_dtype)
    r, z, c, _, hn = _gates(px_t, ph, h_prev)

    dh = dh_s[...] + dy
    dc = dh * (1.0 - z)
    da_c = dc * (1.0 - c * c)
    dz = dh * (h_prev - c)
    da_z = dz * z * (1.0 - z)
    dhn = da_c * r
    dr = da_c * hn
    da_r = dr * r * (1.0 - r)

    dph = jnp.concatenate([da_r, da_z, dhn], axis=-1)  # [2, N, 3H]
    dpx_ref[0] = jnp.concatenate([da_r, da_z, da_c], axis=-1)

    # dh_prev = dh * z + dph @ w^T  (contract over the 3H axis, no transpose
    # materialization), and weight/bias grad accumulation on the MXU.
    prec = None if compute_dtype != jnp.float32 else jax.lax.Precision.HIGHEST
    new_dh = []
    for d in range(2):
        back = jax.lax.dot_general(
            dph[d].astype(compute_dtype),
            w_ref[d].astype(compute_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        new_dh.append(dh[d] * z[d] + back)
        dw_s[d] += jax.lax.dot_general(
            h_prev[d].astype(compute_dtype),
            dph[d].astype(compute_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    dh_s[...] = jnp.stack(new_dh)
    db_s[...] += jnp.sum(dph, axis=1)

    @pl.when(i == n_steps - 1)
    def _():
        dw_ref[...] = dw_s[...]
        db_ref[...] = db_s[...]


def _fwd_call(px, w_hh, b_hh, *, compute_dtype, interpret):
    t, d, n, h3 = px.shape
    h = h3 // 3
    return pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, d, n, h3), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((d, h, h3), lambda i: (0, 0, 0)),
            pl.BlockSpec((d, h3), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, n, h), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, d, n, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, n, h), jnp.float32)],
        interpret=interpret,
    )(px, w_hh, b_hh)


def _bwd_call(px, ys, dy, w_hh, b_hh, *, compute_dtype, interpret):
    t, d, n, h3 = px.shape
    h = h3 // 3

    def rev(i):
        return (t - 1 - i, 0, 0, 0)

    def rev_m1(i):
        return (jnp.maximum(t - 2 - i, 0), 0, 0, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, d, n, h3), rev),
            pl.BlockSpec((1, d, n, h), rev),
            pl.BlockSpec((1, d, n, h), rev_m1),
            pl.BlockSpec((1, d, n, h), rev),
            pl.BlockSpec((d, h, h3), lambda i: (0, 0, 0)),
            pl.BlockSpec((d, h3), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, n, h3), rev),
            pl.BlockSpec((d, h, h3), lambda i: (0, 0, 0)),
            pl.BlockSpec((d, h3), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, d, n, h3), jnp.float32),
            jax.ShapeDtypeStruct((d, h, h3), jnp.float32),
            jax.ShapeDtypeStruct((d, h3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, n, h), jnp.float32),
            pltpu.VMEM((d, h, h3), jnp.float32),
            pltpu.VMEM((d, h3), jnp.float32),
        ],
        interpret=interpret,
    )(px, ys, ys, dy, w_hh, b_hh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_recurrence(px, w_hh, b_hh, compute_dtype=jnp.bfloat16, interpret=False):
    """Run the bidirectional GRU recurrence over a full sequence.

    :param px: ``[T, 2, N, 3H]`` f32 precomputed input projections
        (direction 1 already time-reversed by the caller).
    :param w_hh: ``[2, H, 3H]`` f32 recurrent weights.
    :param b_hh: ``[2, 3H]`` f32 recurrent biases.
    :return: ``[T, 2, N, H]`` f32 hidden states.
    """
    return _fwd_call(
        px, w_hh, b_hh, compute_dtype=compute_dtype, interpret=interpret
    )


def _vjp_fwd(px, w_hh, b_hh, compute_dtype, interpret):
    ys = _fwd_call(px, w_hh, b_hh, compute_dtype=compute_dtype, interpret=interpret)
    return ys, (px, ys, w_hh, b_hh)


def _vjp_bwd(compute_dtype, interpret, res, dy):
    px, ys, w_hh, b_hh = res
    dpx, dw, db = _bwd_call(
        px, ys, dy, w_hh, b_hh, compute_dtype=compute_dtype, interpret=interpret
    )
    return dpx, dw, db


gru_recurrence.defvjp(_vjp_fwd, _vjp_bwd)


def gru_recurrence_reference(px, w_hh, b_hh):
    """lax.scan reference implementation of the same contract (used as the
    numerical oracle for the kernel and as the non-TPU fallback)."""

    def step(h, px_t):
        ph = (
            jnp.einsum("dnh,dhk->dnk", h, w_hh, preferred_element_type=jnp.float32)
            + b_hh[:, None, :]
        )
        _, _, _, new_h, _ = _gates(px_t, ph, h)
        return new_h, new_h

    t, d, n, h3 = px.shape
    h0 = jnp.zeros((d, n, h3 // 3), jnp.float32)
    _, ys = jax.lax.scan(step, h0, px)
    return ys

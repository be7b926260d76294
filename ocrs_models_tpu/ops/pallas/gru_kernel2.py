"""Chunked bidirectional GRU recurrence — Pallas TPU kernel, v2.

Improvements over gru_kernel.py (v1), which dispatches one grid step per
timestep with two small per-direction matmuls:

- **Direction fusion**: the two directions' hidden states stack along the
  row axis (``[2N, H]``, forward rows then backward rows) and the
  recurrent weights concatenate along columns (``[H, 6H]``), so each
  timestep runs ONE ``[2N, H] x [H, 6H]`` MXU matmul (M = 2N = 128 at the
  production batch — exactly the MXU's row count) instead of two M=64
  dots; the off-direction halves of the product are discarded. Twice the
  FLOPs, half the dot count — and these dots are pipeline-latency-bound,
  not FLOP-bound.
- **Time chunking**: the grid advances ``TC`` timesteps per step with the
  hidden state held in VMEM scratch, amortizing grid/DMA swap overhead
  ``TC``-fold. T is padded up to a chunk multiple (padded steps compute
  garbage hidden states that are sliced away; they never feed real ones
  in the forward direction of time... they do feed nothing because they
  come *after* every real step).

MEASURED OUTCOME (TPU v5e, T=257 N=64 H=256 bf16): numerically exact vs
v1 and the scan reference, but NOT faster — fwd 1.24 ms vs v1's 1.09, and
26.9 vs 23.7 ms on the full wide-bucket train step. v1's per-step grid
overhead was already negligible, and the direction-fused dot's gains are
eaten by the in-kernel select/expand data movement. Kept as a selectable
backend (``gru_backend="pallas2"``) and groundwork for future tuning; the
'auto' policy resolves to v1.

Contract matches v1 (``gru_recurrence``):
    px:   [T, 2, N, 3H] float32 — x @ W_ih + b_ih per direction
          (direction 1 consumes the time-reversed sequence)
    w_hh: [2, H, 3H] float32    — torch gate order (r, z, n)
    b_hh: [2, 3H] float32
    out:  [T, 2, N, H] float32  — hidden states for every step

The backward is the hand-derived GRU VJP with the same direction fusion:
one zero-quadrant-padded ``[2N, 6H]`` gate-grad matrix makes dh, dW and
db each a single dot per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _pick_tc(t: int, n2: int, h: int, bwd: bool) -> int:
    """Chunk length: bound the kernel's VMEM blocks (px/dpx chunks are the
    big ones) to a comfortable envelope."""
    budget = 6 * 1024 * 1024 if not bwd else 4 * 1024 * 1024
    per_step = n2 * 3 * h * 4  # px row bytes
    tc = max(1, budget // (2 * per_step))
    return int(min(tc, 16, t))


def _gates(px_t, ph, h_prev):
    xr, xz, xn = jnp.split(px_t, 3, axis=-1)
    hr, hz, hn = jnp.split(ph, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    c = jnp.tanh(xn + r * hn)
    new_h = (1.0 - z) * c + z * h_prev
    return r, z, c, new_h, hn


def _select_ph(ph_big, n):
    # [2N, 6H] -> [2N, 3H]: forward rows take cols [0, 3H), backward rows
    # take cols [3H, 6H).
    h3 = ph_big.shape[1] // 2
    return jnp.concatenate(
        [ph_big[0:n, 0:h3], ph_big[n : 2 * n, h3 : 2 * h3]], axis=0
    )


def _expand_dph(dph, n):
    # [2N, 3H] -> [2N, 6H] with zeros in the off-direction quadrants, the
    # adjoint of _select_ph.
    z = jnp.zeros_like(dph)
    top = jnp.concatenate([dph[0:n], z[0:n]], axis=1)
    bot = jnp.concatenate([z[n:], dph[n:]], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _dot(a, b, compute_dtype, contract=((1,), (0,))):
    prec = None if compute_dtype != jnp.float32 else jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        (contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _fwd_kernel(px_ref, w_ref, b_ref, ys_ref, h_s, *, tc, n, compute_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)

    h = h_s[...]
    w = w_ref[...]
    b = b_ref[...]
    for t in range(tc):
        ph_big = _dot(h, w, compute_dtype)  # [2N, 6H]
        ph = _select_ph(ph_big, n) + b
        _, _, _, h, _ = _gates(px_ref[t].astype(jnp.float32), ph, h)
        ys_ref[t] = h
    h_s[...] = h


def _bwd_kernel(
    px_ref, ys_ref, ysp_ref, dy_ref, w_ref, b_ref,
    dpx_ref, dw_ref, db_ref,
    dh_s, dw_s, db_s, *, tc, n, compute_dtype,
):
    k = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        dh_s[...] = jnp.zeros_like(dh_s)
        dw_s[...] = jnp.zeros_like(dw_s)
        db_s[...] = jnp.zeros_like(db_s)

    w = w_ref[...]
    b = b_ref[...]
    dh = dh_s[...]
    is_last_chunk = k == n_chunks - 1  # global t==0 lives here
    for i in range(tc):
        t = tc - 1 - i  # position inside this chunk
        if t == 0:
            # h_{-1} within the chunk: last row of the previous chunk, or
            # zeros at the global first step (the ysp index map clamps at
            # chunk 0, so mask the bogus read).
            h_prev = jnp.where(is_last_chunk, 0.0, ysp_ref[tc - 1])
        else:
            h_prev = ys_ref[t - 1]

        ph_big = _dot(h_prev, w, compute_dtype)
        ph = _select_ph(ph_big, n) + b
        px_t = px_ref[t].astype(jnp.float32)
        r, z, c, _, hn = _gates(px_t, ph, h_prev)

        dht = dh + dy_ref[t].astype(jnp.float32)
        dc = dht * (1.0 - z)
        da_c = dc * (1.0 - c * c)
        dz = dht * (h_prev - c)
        da_z = dz * z * (1.0 - z)
        dhn = da_c * r
        dr = da_c * hn
        da_r = dr * r * (1.0 - r)

        dph = jnp.concatenate([da_r, da_z, dhn], axis=-1)  # [2N, 3H]
        dpx_ref[t] = jnp.concatenate([da_r, da_z, da_c], axis=-1)

        dph_big = _expand_dph(dph, n)  # [2N, 6H], zero off-quadrants
        # dh_prev = dht * z + dph @ W^T (contract the 6H axis).
        back = _dot(dph_big, w, compute_dtype, contract=((1,), (1,)))
        dh = dht * z + back
        # dW += h_prev^T @ dph_big — zero quadrants kill cross-direction
        # terms, so one dot accumulates both directions' weight grads.
        dw_s[...] += _dot(h_prev, dph_big, compute_dtype, contract=((0,), (0,)))
        # Per-direction bias grads: forward rows into accumulator row 0,
        # backward rows into row 1 (rows 2-7 are tile padding).
        db_s[0:1, :] += jnp.sum(dph[0:n], axis=0, keepdims=True)
        db_s[1:2, :] += jnp.sum(dph[n:], axis=0, keepdims=True)

    dh_s[...] = dh

    @pl.when(k == n_chunks - 1)
    def _():
        dw_ref[...] = dw_s[...]
        db_ref[...] = db_s[...]


def _layout(px, w_hh, b_hh):
    t, d, n, h3 = px.shape
    h = h3 // 3
    px2 = px.reshape(t, d * n, h3)
    w_cat = jnp.concatenate([w_hh[0], w_hh[1]], axis=1)  # [H, 6H]
    b2 = jnp.concatenate(
        [
            jnp.broadcast_to(b_hh[0], (n, h3)),
            jnp.broadcast_to(b_hh[1], (n, h3)),
        ],
        axis=0,
    )  # [2N, 3H]
    return px2, w_cat, b2, t, n, h, h3


def _fwd_call(px, w_hh, b_hh, *, compute_dtype, interpret):
    px2, w_cat, b2, t, n, h, h3 = _layout(px, w_hh, b_hh)
    n2 = 2 * n
    tc = _pick_tc(t, n2, h, bwd=False)
    n_chunks = -(-t // tc)
    t_pad = n_chunks * tc
    if t_pad != t:
        px2 = jnp.pad(px2, ((0, t_pad - t), (0, 0), (0, 0)))
    ys2 = pl.pallas_call(
        functools.partial(_fwd_kernel, tc=tc, n=n, compute_dtype=compute_dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, n2, h3), lambda k: (k, 0, 0)),
            pl.BlockSpec((h, 2 * h3), lambda k: (0, 0)),
            pl.BlockSpec((n2, h3), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tc, n2, h), lambda k: (k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n2, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n2, h), jnp.float32)],
        interpret=interpret,
    )(px2, w_cat, b2)
    return ys2[:t].reshape(t, 2, n, h)


def _bwd_call(px, ys, dy, w_hh, b_hh, *, compute_dtype, interpret):
    px2, w_cat, b2, t, n, h, h3 = _layout(px, w_hh, b_hh)
    n2 = 2 * n
    ys2 = ys.reshape(t, n2, h)
    dy2 = dy.reshape(t, n2, h)
    tc = _pick_tc(t, n2, h, bwd=True)
    n_chunks = -(-t // tc)
    t_pad = n_chunks * tc
    if t_pad != t:
        # Pad at the BACK of time (like the forward): the padded steps are
        # processed first in the reversed grid with dh == 0 and dy == 0,
        # so every padded-step gradient is exactly zero — self-masking.
        px2 = jnp.pad(px2, ((0, t_pad - t), (0, 0), (0, 0)))
        ys2 = jnp.pad(ys2, ((0, t_pad - t), (0, 0), (0, 0)))
        dy2 = jnp.pad(dy2, ((0, t_pad - t), (0, 0), (0, 0)))

    def rev(k):
        return (pl.num_programs(0) - 1 - k, 0, 0)

    def rev_prev(k):
        kk = pl.num_programs(0) - 1 - k
        return (jnp.maximum(kk - 1, 0), 0, 0)

    dpx2, dw_cat, db_rows = pl.pallas_call(
        functools.partial(_bwd_kernel, tc=tc, n=n, compute_dtype=compute_dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, n2, h3), rev),
            pl.BlockSpec((tc, n2, h), rev),
            pl.BlockSpec((tc, n2, h), rev_prev),
            pl.BlockSpec((tc, n2, h), rev),
            pl.BlockSpec((h, 2 * h3), lambda k: (0, 0)),
            pl.BlockSpec((n2, h3), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tc, n2, h3), rev),
            pl.BlockSpec((h, 2 * h3), lambda k: (0, 0)),
            pl.BlockSpec((8, h3), lambda k: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, n2, h3), jnp.float32),
            jax.ShapeDtypeStruct((h, 2 * h3), jnp.float32),
            jax.ShapeDtypeStruct((8, h3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n2, h), jnp.float32),
            pltpu.VMEM((h, 2 * h3), jnp.float32),
            pltpu.VMEM((8, h3), jnp.float32),
        ],
        interpret=interpret,
    )(px2, ys2, ys2, dy2, w_cat, b2)

    dpx = dpx2[:t].reshape(t, 2, n, h3)
    dw = jnp.stack([dw_cat[:, :h3], dw_cat[:, h3:]])  # [2, H, 3H]
    db = db_rows[0:2]  # [2, 3H]
    return dpx, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_recurrence2(px, w_hh, b_hh, compute_dtype=jnp.bfloat16, interpret=False):
    """v2 chunked+fused biGRU recurrence (contract identical to v1)."""
    return _fwd_call(px, w_hh, b_hh, compute_dtype=compute_dtype, interpret=interpret)


def _vjp_fwd(px, w_hh, b_hh, compute_dtype, interpret):
    ys = _fwd_call(px, w_hh, b_hh, compute_dtype=compute_dtype, interpret=interpret)
    return ys, (px, ys, w_hh, b_hh)


def _vjp_bwd(compute_dtype, interpret, res, dy):
    px, ys, w_hh, b_hh = res
    dpx, dw, db = _bwd_call(
        px, ys, dy, w_hh, b_hh, compute_dtype=compute_dtype, interpret=interpret
    )
    return dpx, dw, db


gru_recurrence2.defvjp(_vjp_fwd, _vjp_bwd)

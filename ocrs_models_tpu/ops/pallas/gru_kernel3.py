"""Time-chunked bidirectional GRU recurrence — Pallas TPU kernel, v3.

v1 (gru_kernel.py) dispatches ONE grid step per timestep: per-step grid
sequencing + DMA-swap overhead is paid T times per sweep, and the wide
recognition bucket (T=257) runs four such sweeps per train step (2 layers
x fwd/bwd). v2 (gru_kernel2.py) amortized that overhead by chunking time
but also fused the two directions into one ``[2N, H] x [H, 6H]`` dot — and
the in-kernel select/expand data movement that fusion required ate the
chunking's gains (measured: v2 slower than v1 at every batch).

v3 keeps exactly v1's math and block layout — per-direction dots on
``[2, N, *]`` stacked arrays, no select, no expand, no zero-quadrant
padding — and adds ONLY the time chunking: the grid advances ``tc``
timesteps per step, with an in-kernel Python loop running the recurrence
inside the block and the hidden state held in VMEM scratch across grid
steps. Per-chunk blocks stream with automatic double buffering, so the
per-grid-step overhead is paid T/tc times instead of T.

T is padded up to a chunk multiple at the BACK of time:
- forward: padded steps compute garbage hidden states that are sliced
  away; they come after every real step so they never feed a real one.
- backward: the reversed grid processes the padded steps FIRST with
  ``dh == 0`` and ``dy == 0``, so every padded-step gradient is exactly
  zero — self-masking (same scheme as v2, re-verified in tests here).

Contract identical to v1 (``gru_recurrence``):
    px:   [T, 2, N, 3H] float32 — x @ W_ih + b_ih per direction
          (direction 1 consumes the time-reversed sequence)
    w_hh: [2, H, 3H] float32    — torch gate order (r, z, n)
    b_hh: [2, 3H] float32
    out:  [T, 2, N, H] float32  — hidden states for every step

Replaces (capability): the sequential core of torch ``nn.GRU`` used by the
reference recognizer (/root/reference/ocrs_models/models.py:245,264-266).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru_kernel import _gates, _recur_matmul

_VMEM_LIMIT = 100 * 1024 * 1024


def _pick_tc(t: int, d: int, n: int, h3: int, bwd: bool) -> int:
    """Chunk length. The dominant VMEM blocks are the px/dpx chunks
    ([tc, 2, N, 3H] f32, double-buffered); bound them to a budget that
    leaves room for the ys/dy blocks and the weight-grad scratch."""
    budget = (24 if not bwd else 16) * 1024 * 1024
    per_step = d * n * h3 * 4
    tc = max(1, budget // (2 * per_step))
    return int(min(tc, 8, t))


def _fwd_kernel(px_ref, w_ref, b_ref, ys_ref, h_s, *, tc, compute_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)

    h = h_s[...]
    for t in range(tc):
        ph = _recur_matmul(h, w_ref, b_ref, compute_dtype)
        _, _, _, h, _ = _gates(px_ref[t].astype(jnp.float32), ph, h)
        ys_ref[t] = h
    h_s[...] = h


def _bwd_kernel(
    px_ref, ys_ref, ysp_ref, dy_ref, w_ref, b_ref,
    dpx_ref, dw_ref, db_ref,
    dh_s, dw_s, db_s, *, tc, compute_dtype,
):
    k = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        dh_s[...] = jnp.zeros_like(dh_s)
        dw_s[...] = jnp.zeros_like(dw_s)
        db_s[...] = jnp.zeros_like(db_s)

    dh = dh_s[...]
    is_last_chunk = k == n_chunks - 1  # global t == 0 lives in this chunk
    prec = None if compute_dtype != jnp.float32 else jax.lax.Precision.HIGHEST
    for i in range(tc):
        t = tc - 1 - i
        if t == 0:
            # h_{t-1} across the chunk boundary: last row of the previous
            # chunk, or zeros at the global first step (ysp's index map
            # clamps at the last-processed chunk, so mask the bogus read).
            h_prev = jnp.where(is_last_chunk, 0.0, ysp_ref[tc - 1])
        else:
            h_prev = ys_ref[t - 1]

        ph = _recur_matmul(h_prev, w_ref, b_ref, compute_dtype)
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

        dph = jnp.concatenate([da_r, da_z, dhn], axis=-1)  # [2, N, 3H]
        dpx_ref[t] = jnp.concatenate([da_r, da_z, da_c], axis=-1)

        new_dh = []
        for d in range(2):
            back = jax.lax.dot_general(
                dph[d].astype(compute_dtype),
                w_ref[d].astype(compute_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            new_dh.append(dht[d] * z[d] + back)
            dw_s[d] += jax.lax.dot_general(
                h_prev[d].astype(compute_dtype),
                dph[d].astype(compute_dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        dh = jnp.stack(new_dh)
        db_s[...] += jnp.sum(dph, axis=1)

    dh_s[...] = dh

    @pl.when(k == n_chunks - 1)
    def _():
        dw_ref[...] = dw_s[...]
        db_ref[...] = db_s[...]


def _fwd_call(px, w_hh, b_hh, *, compute_dtype, interpret):
    t, d, n, h3 = px.shape
    h = h3 // 3
    tc = _pick_tc(t, d, n, h3, bwd=False)
    n_chunks = -(-t // tc)
    t_pad = n_chunks * tc
    if t_pad != t:
        px = jnp.pad(px, ((0, t_pad - t), (0, 0), (0, 0), (0, 0)))
    ys = pl.pallas_call(
        functools.partial(_fwd_kernel, tc=tc, compute_dtype=compute_dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, d, n, h3), lambda k: (k, 0, 0, 0)),
            pl.BlockSpec((d, h, h3), lambda k: (0, 0, 0)),
            pl.BlockSpec((d, h3), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tc, d, n, h), lambda k: (k, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, d, n, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, n, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(px, w_hh, b_hh)
    return ys[:t]


def _bwd_call(px, ys, dy, w_hh, b_hh, *, compute_dtype, interpret):
    t, d, n, h3 = px.shape
    h = h3 // 3
    tc = _pick_tc(t, d, n, h3, bwd=True)
    n_chunks = -(-t // tc)
    t_pad = n_chunks * tc
    if t_pad != t:
        pad = ((0, t_pad - t), (0, 0), (0, 0), (0, 0))
        px = jnp.pad(px, pad)
        ys = jnp.pad(ys, pad)
        dy = jnp.pad(dy, pad)

    def rev(k):
        return (pl.num_programs(0) - 1 - k, 0, 0, 0)

    def rev_prev(k):
        kk = pl.num_programs(0) - 1 - k
        return (jnp.maximum(kk - 1, 0), 0, 0, 0)

    dpx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, tc=tc, compute_dtype=compute_dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, d, n, h3), rev),
            pl.BlockSpec((tc, d, n, h), rev),
            pl.BlockSpec((tc, d, n, h), rev_prev),
            pl.BlockSpec((tc, d, n, h), rev),
            pl.BlockSpec((d, h, h3), lambda k: (0, 0, 0)),
            pl.BlockSpec((d, h3), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tc, d, n, h3), rev),
            pl.BlockSpec((d, h, h3), lambda k: (0, 0, 0)),
            pl.BlockSpec((d, h3), lambda k: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, d, n, h3), jnp.float32),
            jax.ShapeDtypeStruct((d, h, h3), jnp.float32),
            jax.ShapeDtypeStruct((d, h3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, n, h), jnp.float32),
            pltpu.VMEM((d, h, h3), jnp.float32),
            pltpu.VMEM((d, h3), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(px, ys, ys, dy, w_hh, b_hh)
    return dpx[:t], dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_recurrence3(px, w_hh, b_hh, compute_dtype=jnp.bfloat16, interpret=False):
    """v3 time-chunked biGRU recurrence (contract identical to v1)."""
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


gru_recurrence3.defvjp(_vjp_fwd, _vjp_bwd)

"""Fused CTC alpha/beta recurrences as Pallas TPU kernels.

The ``lax.scan`` CTC (ops/ctc.py) is latency-bound exactly like the GRU
was: T=65..257 sequential steps of tiny ``[N, S]`` elementwise updates,
several ms of a ~24 ms wide-bucket train step. This runs each recurrence
in ONE kernel launch with the state held in VMEM across a time grid,
mirroring ops/pallas/gru_kernel.py.

All per-sample gating is *additive* and precomputed by XLA so the kernel
body is pure f32 adds, lane-offset loads and log-sum-exp:

- ``emit_g[t] = where(t < input_len, emit[t], 0)``
- ``gate[t]  = where(t < input_len, 0, -inf)`` applied to the *shifted*
  transition terms only, so a frozen step reduces to ``state = state``
- ``skip[s]  = where(can_skip[s], 0, -inf)``

Shifted operands come from a state scratch with two extra lanes pinned
at ``-inf`` (shifts are lane-offset loads), and the backward's shifted
emission/skip variants are precomputed by XLA — the kernels contain no
pads, rolls, or broadcasts.

The backward runs the beta recurrence reverse-time over the saved
alphas and emits ``|demit|[t] = exp(alpha[t] + B[t])`` where ``B`` is
seeded from the magnitude of the final-state cotangent normalized by
``alpha[T-1]``; the caller applies the cotangent's (per-sample uniform)
sign. The custom_vjp wraps only the recurrence — the one-hot emission
matmul and the final log-likelihood reduction stay in XLA and autodiff
normally — and the public op returns only ``alpha[T-1]``, so the
"cotangent lives at the final step" structure holds by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def _alpha_kernel(
    emit_ref, gate_ref, skip_ref, alpha0_ref, alphas_ref, st_s, *, s
):
    # State layout: alpha for position p lives at scratch lane p + 2;
    # lanes 0..1 stay -inf so the p-1 / p-2 transitions are plain
    # lane-offset loads.
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        st_s[...] = jnp.full_like(st_s, NEG_INF)
        st_s[:, 2:] = alpha0_ref[...]

    @pl.when(t > 0)
    def _():
        stay = st_s[:, 2:]
        from1 = st_s[:, 1 : s + 1]
        from2 = st_s[:, 0:s]
        gate = gate_ref[0]
        new_alpha = (
            _lse3(stay, from1 + gate, from2 + skip_ref[...] + gate)
            + emit_ref[0]
        )
        st_s[:, 2:] = new_alpha

    alphas_ref[0] = st_s[:, 2:]


def _beta_kernel(
    emit_ref, emit1_ref, emit2_ref, gate_ref, skip2_ref, alphas_ref,
    seed_ref, demit_ref, st_s, *, s,
):
    """Reverse-time weighted-beta recurrence + gradient magnitudes.

    Iteration i handles t = T-1-i. The transition uses step t+1's
    emissions (the index maps feed this kernel t+1's tensors; alphas and
    demit index t):

        B[t, p] = lse( B[t+1, p]   + emit_g[t+1, p],
                       B[t+1, p+1] + emit_g[t+1, p+1] + gate[t+1],
                       B[t+1, p+2] + emit_g[t+1, p+2] + skip[p+2]
                                                      + gate[t+1] )

    State layout: B for position p at scratch lane p; lanes s..s+1 stay
    -inf for the p+1 / p+2 loads. At a frozen step (gate -inf, emit_g 0)
    this reduces to B[t] = B[t+1], which also realizes the per-sample
    variable-T seed exactly.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        st_s[...] = jnp.full_like(st_s, NEG_INF)
        st_s[:, 0:s] = seed_ref[...]

    @pl.when(i > 0)
    def _():
        gate = gate_ref[0]
        stay = st_s[:, 0:s] + emit_ref[0]
        from1 = st_s[:, 1 : s + 1] + emit1_ref[0] + gate
        from2 = st_s[:, 2 : s + 2] + emit2_ref[0] + skip2_ref[...] + gate
        st_s[:, 0:s] = _lse3(stay, from1, from2)

    demit_ref[0] = jnp.exp(alphas_ref[0] + st_s[:, 0:s])


def _alpha_call(emit_g, gate, skip, alpha0, interpret, final_only=False):
    """Run the alpha recurrence; ``final_only`` writes every step to the
    same single-block output (the grid is sequential, so it ends up
    holding ``alpha[T-1]``) instead of materializing all T steps — the
    no-grad path never pays the [T, N, S] HBM write."""
    t, n, s = emit_g.shape
    out = pl.pallas_call(
        functools.partial(_alpha_kernel, s=s),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((n, s), lambda i: (0, 0)),
            pl.BlockSpec((n, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, n, s),
            (lambda i: (0, 0, 0)) if final_only else (lambda i: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1 if final_only else t, n, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, s + 2), jnp.float32)],
        interpret=interpret,
    )(emit_g, gate, skip, alpha0)
    return out


def _beta_call(emit_g, emit1, emit2, gate, skip2, alphas, seed, interpret):
    t, n, s = emit_g.shape

    def rev(i):
        return (t - 1 - i, 0, 0)

    def rev_next(i):
        # Step t+1's tensors; clamped (and unused) at i=0 where the
        # kernel only seeds the state.
        return (jnp.minimum(t - i, t - 1), 0, 0)

    return pl.pallas_call(
        functools.partial(_beta_kernel, s=s),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n, s), rev_next),
            pl.BlockSpec((1, n, s), rev_next),
            pl.BlockSpec((1, n, s), rev_next),
            pl.BlockSpec((1, n, s), rev_next),
            pl.BlockSpec((n, s), lambda i: (0, 0)),
            pl.BlockSpec((1, n, s), rev),
            pl.BlockSpec((n, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, s), rev),
        out_shape=jax.ShapeDtypeStruct((t, n, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, s + 2), jnp.float32)],
        interpret=interpret,
    )(emit_g, emit1, emit2, gate, skip2, alphas, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_alpha_final(emit_g, gate, skip, alpha0, interpret=False):
    """Final CTC forward variables ``alpha[T-1]`` in one kernel launch.

    :param emit_g: ``[T, N, S]`` f32 extended-position emission
        log-probs, zeroed at frozen steps (``t >= input_len``); row 0 is
        unused (``alpha0`` already contains ``emit[0]``).
    :param gate: ``[T, N, S]`` f32 — 0 while active, ``-inf`` frozen.
    :param skip: ``[N, S]`` f32 — 0 where the p-2 transition is allowed.
    :param alpha0: ``[N, S]`` f32 initial state.
    :return: ``[N, S]`` f32 ``alpha[T-1]``.

    Returning only the final state makes the VJP's structure exact by
    construction; the one remaining requirement is a per-sample uniform
    cotangent sign (any log-likelihood reduction of ``alpha[T-1]``
    satisfies it — the cotangent is a scaled softmax).
    """
    return _alpha_call(emit_g, gate, skip, alpha0, interpret, final_only=True)[0]


def _vjp_fwd(emit_g, gate, skip, alpha0, interpret):
    alphas = _alpha_call(emit_g, gate, skip, alpha0, interpret)
    return alphas[emit_g.shape[0] - 1], (emit_g, gate, skip, alphas)


def _vjp_bwd(interpret, res, d_last):
    emit_g, gate, skip, alphas = res
    t, n, s = emit_g.shape
    mag = jnp.abs(d_last)
    sign = jnp.where(d_last < 0, -1.0, 1.0)
    # log(0) on the masked lanes yields -inf (not NaN) and the where
    # selects NEG_INF there, so no clamp is needed.
    seed = jnp.where(mag > 0, jnp.log(mag) - alphas[t - 1], NEG_INF)
    # Shifted emission / skip variants, precomputed so the kernel needs
    # no pads (position p+1 / p+2 operands at lane p).
    emit1 = jnp.pad(emit_g[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    emit2 = jnp.pad(emit_g[:, :, 2:], ((0, 0), (0, 0), (0, 2)))
    skip2 = jnp.pad(
        skip[:, 2:], ((0, 0), (0, 2)), constant_values=NEG_INF
    )
    demag = _beta_call(emit_g, emit1, emit2, gate, skip2, alphas, seed, interpret)
    # Per-sample uniform sign (uniformly non-positive for NLL losses).
    row_sign = jnp.min(sign, axis=1)[None, :, None]
    demit = demag * row_sign
    dalpha0 = demit[0]
    demit = demit.at[0].set(0.0)
    return demit, jnp.zeros_like(gate), jnp.zeros_like(skip), dalpha0


ctc_alpha_final.defvjp(_vjp_fwd, _vjp_bwd)

"""First-party CTC loss for TPU.

The reference trains with ``torch.nn.CTCLoss`` (train_rec.py:104,180, a
cuDNN kernel). This is a ground-up JAX implementation of the CTC forward
algorithm in log space as a ``lax.scan`` over timesteps, with static shapes
(extended label sequence length ``2*Lmax+1``) so it jits once per bucket
and differentiates via autodiff through the scan.

Conventions match the reference: class 0 is the blank, per-sample input
lengths may undercount the model's ``floor(W/4)+1`` output by one
(train_rec.py:110 passes ``W//4``), and the returned reduction is torch's
``mean``: per-sample negative log-likelihood divided by target length,
averaged over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .platform import is_single_chip_tpu

from .pallas.ctc_kernel import NEG_INF as _NEG_INF
from .pallas.ctc_kernel import _lse3


def _resolve_backend(backend: str) -> str:
    """'auto' -> 'pallas' on a single-device TPU process, else 'scan'
    (same policy as ops/gru.py: the fused-recurrence kernel is a
    per-device call and is what kills the T-step launch latency)."""
    if backend != "auto":
        return backend
    if is_single_chip_tpu():
        return "pallas"
    return "scan"


def ctc_loss_forward(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    backend: str = "auto",
) -> jnp.ndarray:
    """Per-sample CTC negative log-likelihood.

    :param log_probs: ``[N, T, C]`` log-probabilities (class 0 = blank).
    :param labels: ``[N, L]`` int labels, 0-padded.
    :param input_lengths: ``[N]`` valid timesteps per sample.
    :param label_lengths: ``[N]`` valid labels per sample.
    :param backend: ``"auto" | "pallas" | "pallas-interpret" | "scan"``
        — recurrence implementation (the surrounding math is shared).
    :return: ``[N]`` negative log-likelihoods.
    """
    n, t, c = log_probs.shape
    _, l = labels.shape
    s = 2 * l + 1

    # Extended label sequence: blank, l1, blank, l2, ..., lL, blank.
    ext = jnp.zeros((n, s), dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)

    # Positions allowed to skip from s-2: label != blank and != label[s-2].
    prev2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)))
    can_skip = (ext != 0) & (ext != prev2)

    # Emission log-probs for every (t, extended position) hoisted out of the
    # recurrence as one batched one-hot matmul (MXU-friendly; a per-step
    # take_along_axis gather is a slow generic gather on TPU).
    # Precision HIGHEST keeps the log-prob operand fp32 on the MXU (the
    # default would round it to bf16, a ~1e-3 absolute loss error — larger
    # than the plateau scheduler's 1e-4 relative threshold); the matmul is
    # tiny relative to the model so the fp32 passes are free.
    ext_onehot = jax.nn.one_hot(ext, c, dtype=log_probs.dtype)  # [N, S, C]
    emit = jnp.einsum(
        "ntc,nsc->tns", log_probs, ext_onehot,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [T, N, S]

    # alpha_0: only s=0 (blank) and s=1 (first label) are reachable.
    pos = jnp.arange(s)[None, :]
    alpha0 = jnp.where(pos <= 1, emit[0], _NEG_INF)
    # For empty labels, position 1 is a padded blank that must stay off the
    # legal path: positions beyond 2*label_len are unreachable at t=0 only
    # via pos<=1 (pos 1 invalid if label_len == 0).
    alpha0 = jnp.where((pos == 1) & (label_lengths[:, None] == 0), _NEG_INF, alpha0)

    resolved = _resolve_backend(backend)
    if resolved.startswith("pallas"):
        from .pallas.ctc_kernel import ctc_alpha_final

        active = (
            jnp.arange(t)[:, None] < input_lengths[None, :]
        )[:, :, None]  # [T, N, 1]
        emit_g = jnp.where(active, emit, 0.0)
        gate = jnp.where(active, 0.0, _NEG_INF) * jnp.ones((1, 1, s))
        skip_add = jnp.where(can_skip, 0.0, _NEG_INF)
        alpha_final = ctc_alpha_final(
            emit_g, gate, skip_add, alpha0, resolved == "pallas-interpret"
        )
    else:

        def step(alpha, inputs):
            emit_t, t_idx = inputs
            stay = alpha
            from1 = jnp.pad(
                alpha[:, :-1], ((0, 0), (1, 0)), constant_values=_NEG_INF
            )
            from2 = jnp.pad(
                alpha[:, :-2], ((0, 0), (2, 0)), constant_values=_NEG_INF
            )
            from2 = jnp.where(can_skip, from2, _NEG_INF)
            new_alpha = _lse3(stay, from1, from2) + emit_t
            # Freeze alpha past each sample's input length.
            active = (t_idx < input_lengths)[:, None]
            return jnp.where(active, new_alpha, alpha), None

        alpha_final, _ = jax.lax.scan(
            step, alpha0, (emit[1:], jnp.arange(1, t)), unroll=4
        )

    # Total log prob: last blank + last label positions.
    end = 2 * label_lengths
    a_end = jnp.take_along_axis(alpha_final, end[:, None], axis=1)[:, 0]
    a_end1 = jnp.take_along_axis(
        alpha_final, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_end1 = jnp.where(label_lengths > 0, a_end1, _NEG_INF)
    m = jnp.maximum(a_end, a_end1)
    m_safe = jnp.maximum(m, _NEG_INF)
    total = m_safe + jnp.log(jnp.exp(a_end - m_safe) + jnp.exp(a_end1 - m_safe))
    return -jnp.where(m <= _NEG_INF, _NEG_INF, total)


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    backend: str = "auto",
) -> jnp.ndarray:
    """CTC loss with torch's default ``mean`` reduction: per-sample NLL
    divided by target length (clamped to >=1), averaged over the batch."""
    nll = ctc_loss_forward(
        log_probs, labels, input_lengths, label_lengths, backend
    )
    denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
    return jnp.mean(nll / denom)

"""Loss functions.

``balanced_cross_entropy_loss`` reproduces the reference's class-balanced
BCE (train_detection.py:225-263) under XLA's static-shape constraint: the
reference takes ``topk`` of positive/negative pixel losses with a
data-dependent ``k = min(#pos, #neg)`` and ``.item()`` host syncs. Sorting
millions of pixel losses per step is prohibitive on TPU, so the sum of the
k largest entries is computed exactly via a fixed-trip binary search for
the k-th-value threshold — a handful of bandwidth-bound masked reductions
instead of an O(n log n) sort, fully on device inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def balanced_cross_entropy_loss(
    pred: jnp.ndarray, target: jnp.ndarray, sample_weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Balanced BCE between probability maps.

    :param pred: ``[N, ...]`` tensor of probabilities (sigmoid outputs).
    :param target: same-shape tensor of targets (approximately binary;
        augmentation can push values slightly outside [0, 1]).
    :param sample_weight: optional ``[N]`` per-sample 0/1 weights; zero rows
        (batch padding) contribute no pixels to either class pool.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    pos_mask = target > 0.5
    neg_mask = target < 0.5
    if sample_weight is not None:
        valid = (sample_weight > 0).reshape(
            (-1,) + (1,) * (target.ndim - 1)
        )
        pos_mask = pos_mask & valid
        neg_mask = neg_mask & valid
    target_c = jnp.clip(target, 0.0, 1.0)

    eps = 1e-12
    pixel_loss = -(
        target_c * jnp.log(jnp.maximum(pred, eps))
        + (1.0 - target_c) * jnp.log(jnp.maximum(1.0 - pred, eps))
    )
    # Fusion boundary: without it XLA producer-fuses the upstream network's
    # epilogue into each of the top-k selection's many reduction consumers,
    # and compilation of the joint train step never terminates.
    pixel_loss = jax.lax.optimization_barrier(pixel_loss)

    pos_loss = jnp.where(pos_mask, pixel_loss, 0.0).ravel()
    neg_loss = jnp.where(neg_mask, pixel_loss, 0.0).ravel()

    n_pos = jnp.count_nonzero(pos_mask)
    n_neg = jnp.count_nonzero(neg_mask)
    k = jnp.minimum(n_pos, n_neg)

    total = _top_k_sum(pos_loss, k) + _top_k_sum(neg_loss, k)
    return total / jnp.maximum(2 * k, 1).astype(jnp.float32)


def _top_k_sum(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Sum of the ``k`` largest entries of non-negative ``x`` with traced k.

    Exact (up to float-tie resolution): 32-iteration bisection finds the
    threshold tau with ``count(x > tau) <= k``; entries above tau sum
    directly and the remaining ``k - count`` slots come from the tie
    value just below tau. Gradient: entries above tau get weight 1; the
    remaining slots are split EQUALLY among the tied entries (weight
    ``residual / n_ties`` each) — the symmetric subgradient of the same
    function. torch's topk backward instead gives weight 1 to an
    arbitrary ``residual``-sized subset of the ties; both are valid
    subgradients with the same total mass, and they coincide whenever
    the k-th value is unique (float ties are rare in practice).
    """
    x = x.ravel()
    kf = k.astype(x.dtype)
    # The threshold search runs entirely on stopped values so reverse-mode AD
    # never linearizes through the 32-iteration loop (doing so blows up the
    # compile when composed with a large upstream network).
    xs = jax.lax.stop_gradient(x)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        too_many = jnp.sum(xs > mid) > k
        return jnp.where(too_many, mid, lo), jnp.where(too_many, hi, mid)

    lo0 = jnp.zeros((), xs.dtype)
    hi0 = jnp.max(xs) + jnp.asarray(1e-3, xs.dtype)
    _, tau = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    selected = xs > tau
    n_sel = jnp.sum(selected).astype(x.dtype)
    residual = jnp.maximum(kf - n_sel, 0.0)
    # Tie slots: the largest not-selected value stands in for tau (they
    # agree to bisection precision), taken through the LIVE x so the tie
    # elements receive gradient.
    neg_inf = jnp.asarray(-jnp.inf, xs.dtype)
    tie_val = jnp.max(jnp.where(selected, neg_inf, xs))
    ties = (~selected) & (xs == tie_val)
    n_ties = jnp.maximum(jnp.sum(ties).astype(x.dtype), 1.0)
    tie_sum = jnp.sum(jnp.where(ties, x, 0.0))
    return jnp.sum(jnp.where(selected, x, 0.0)) + (residual / n_ties) * tie_sum


def weighted_bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: float,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``BCEWithLogitsLoss(pos_weight=w)`` semantics (reference
    train_layout.py:94-97): the positive term is scaled by ``pos_weight``,
    mean reduction over all elements. ``sample_weight`` ([N] 0/1) excludes
    batch-padding rows from the mean."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # Numerically stable log-sigmoid formulation.
    log_sig = -jnp.logaddexp(0.0, -logits)
    log_one_minus_sig = -jnp.logaddexp(0.0, logits)
    loss = -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus_sig)
    if sample_weight is None:
        return jnp.mean(loss)
    w = sample_weight.reshape((-1,) + (1,) * (loss.ndim - 1))
    per_sample_els = np.prod(loss.shape[1:]) if loss.ndim > 1 else 1
    denom = jnp.maximum(jnp.sum(sample_weight) * per_sample_els, 1.0)
    return jnp.sum(loss * w) / denom

"""Loss functions.

``balanced_cross_entropy_loss`` reproduces the reference's class-balanced
BCE (train_detection.py:225-263) under XLA's static-shape constraint: the
reference takes ``topk`` of positive/negative pixel losses with a
data-dependent ``k = min(#pos, #neg)`` and ``.item()`` host syncs; here the
same quantity is computed with a full sort + rank mask, which is
loss-equivalent (mean of the k largest values of each side) and stays
entirely on device inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def balanced_cross_entropy_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Balanced BCE between probability maps.

    :param pred: ``[...]`` tensor of probabilities (sigmoid outputs).
    :param target: same-shape tensor of targets (approximately binary;
        augmentation can push values slightly outside [0, 1]).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    pos_mask = target > 0.5
    neg_mask = target < 0.5
    target_c = jnp.clip(target, 0.0, 1.0)

    eps = 1e-12
    pixel_loss = -(
        target_c * jnp.log(jnp.maximum(pred, eps))
        + (1.0 - target_c) * jnp.log(jnp.maximum(1.0 - pred, eps))
    )

    pos_loss = jnp.where(pos_mask, pixel_loss, 0.0).ravel()
    neg_loss = jnp.where(neg_mask, pixel_loss, 0.0).ravel()

    n_pos = jnp.count_nonzero(pos_mask)
    n_neg = jnp.count_nonzero(neg_mask)
    k = jnp.minimum(n_pos, n_neg)

    # Mean of the k largest entries of each side, with traced (dynamic) k:
    # sort descending once, then mask by rank. Masked-out pixels hold loss 0,
    # which sorts after any real BCE value, so ranks < k are exactly the
    # side's top-k as in the reference.
    rank = jnp.arange(pos_loss.shape[0])
    pos_top = jnp.where(rank < k, jnp.sort(pos_loss)[::-1], 0.0)
    neg_top = jnp.where(rank < k, jnp.sort(neg_loss)[::-1], 0.0)
    total = jnp.sum(pos_top) + jnp.sum(neg_top)
    return total / jnp.maximum(2 * k, 1).astype(jnp.float32)


def weighted_bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight: float
) -> jnp.ndarray:
    """``BCEWithLogitsLoss(pos_weight=w)`` semantics (reference
    train_layout.py:94-97): the positive term is scaled by ``pos_weight``,
    mean reduction over all elements."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # Numerically stable log-sigmoid formulation.
    log_sig = -jnp.logaddexp(0.0, -logits)
    log_one_minus_sig = -jnp.logaddexp(0.0, logits)
    loss = -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus_sig)
    return jnp.mean(loss)

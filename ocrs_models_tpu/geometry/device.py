"""On-device (batched, jitted) postprocessing passes.

The BASELINE.json north star calls for the mask -> word-box clustering to
be available as a batched on-device pass. This module provides jitted,
batch-parallel connected-component labeling via iterative label
propagation, plus per-component axis-aligned bounding boxes with a static
component bound. The exact oriented min-area rectangles remain on the host
C++ core (geometry/_native) — rotating calipers over dynamic-size hulls
does not map to static shapes; the device path covers the batched-
throughput case where AABBs suffice, and the label maps can feed either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def connected_components_device(masks: jnp.ndarray) -> jnp.ndarray:
    """Label 8-connected components of a batch of binary masks.

    :param masks: ``[N, H, W]`` (bool or 0/1).
    :return: ``[N, H, W]`` int32 labels; 0 = background. Labels are unique
        per component but NOT compacted (each component is labeled by the
        flat index of one of its pixels + 1).

    Iterative max-propagation: every pixel takes the max label in its
    3x3 neighborhood until a fixed point — O(component diameter) steps,
    batch-parallel on device.
    """
    masks = masks.astype(bool)
    n, h, w = masks.shape
    init = jnp.where(
        masks,
        jnp.arange(1, h * w + 1, dtype=jnp.int32).reshape(1, h, w),
        0,
    )

    def propagate(labels):
        p = jnp.pad(labels, ((0, 0), (1, 1), (1, 1)))
        neigh = jnp.max(
            jnp.stack(
                [
                    p[:, dy : dy + h, dx : dx + w]
                    for dy in range(3)
                    for dx in range(3)
                ]
            ),
            axis=0,
        )
        return jnp.where(masks, neigh, 0)

    def cond(state):
        labels, prev_changed = state
        return prev_changed

    def body(state):
        labels, _ = state
        new = propagate(labels)
        return (new, jnp.any(new != labels))

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.asarray(True)))
    return labels


@functools.partial(jax.jit, static_argnums=(1,))
def component_bounds_device(
    labels: jnp.ndarray, max_components: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Axis-aligned bounds of up to ``max_components`` components per mask.

    :param labels: ``[N, H, W]`` int32 from
        :func:`connected_components_device`.
    :return: ``(boxes, valid)`` where boxes is ``[N, max_components, 4]``
        (x0, y0, x1, y1 inclusive; zeros where invalid) and valid is
        ``[N, max_components]`` bool. Components are keyed by their label's
        rank among the distinct labels present (deterministic order).
    """
    n, h, w = labels.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)

    def per_mask(lab, ys_, xs_):
        flat = lab.ravel()
        # Distinct labels via sorted unique with a static bound.
        sorted_labels = jnp.sort(flat)
        is_new = jnp.concatenate(
            [sorted_labels[:1] > 0, sorted_labels[1:] != sorted_labels[:-1]]
        ) & (sorted_labels > 0)
        # Rank of each distinct label among distinct labels (0-based).
        new_rank = jnp.cumsum(is_new) - 1
        # Gather the distinct label values into a static-size table.
        table = jnp.zeros((max_components,), jnp.int32)
        idx = jnp.where(is_new, jnp.minimum(new_rank, max_components - 1), max_components)
        table = jnp.zeros((max_components + 1,), jnp.int32).at[idx].set(
            jnp.where(is_new, sorted_labels, 0)
        )[:max_components]
        valid = table > 0

        # For each component k: reduce bounds over pixels with that label.
        def bounds(label_val):
            sel = lab == label_val
            big = jnp.int32(1 << 30)
            x0 = jnp.min(jnp.where(sel, xs_, big))
            y0 = jnp.min(jnp.where(sel, ys_, big))
            x1 = jnp.max(jnp.where(sel, xs_, -1))
            y1 = jnp.max(jnp.where(sel, ys_, -1))
            return jnp.stack([x0, y0, x1, y1])

        boxes = jax.vmap(bounds)(table)
        boxes = jnp.where(valid[:, None], boxes, 0)
        return boxes, valid

    return jax.vmap(per_mask)(labels, ys, xs)

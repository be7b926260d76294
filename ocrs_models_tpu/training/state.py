"""Train state: parameters, batch-norm stats, optimizer state.

The optimizer is ``clip_by_global_norm (optional) -> scale_by_adam``; the
learning rate is *not* baked into the optax chain but passed into each step
as a scalar argument. This keeps host-driven schedules (reduce-on-plateau,
linear warmup — reference train_rec.py:383-385, train_layout.py:174-183)
out of the compiled graph: changing the LR never recompiles and needs no
optimizer-state surgery.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, lr: jnp.ndarray, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def make_optimizer(grad_clip_norm: Optional[float] = None) -> optax.GradientTransformation:
    """Adam direction (torch-default betas/eps) with optional global-norm
    clipping; the step size is applied by the caller (see TrainState)."""
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*parts)


def create_train_state(
    model,
    rng,
    example_input,
    grad_clip_norm: Optional[float] = None,
) -> TrainState:
    variables = model.init(rng, example_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(grad_clip_norm)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )

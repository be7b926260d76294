"""Tensor-parallel layout training step over a 2-D (data x model) mesh:
Megatron-style shardings produce the same loss and updated params as the
fully-replicated step (8 virtual CPU devices: 4 dp x 2 mp)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.data import SyntheticLayout, collate_layout
from ocrs_models_tpu.models import LayoutModel
from ocrs_models_tpu.parallel import (
    create_mesh,
    create_mesh_2d,
    layout_tp_state_shardings,
    replicate_tree,
    shard_batch,
    shard_tree,
)
from ocrs_models_tpu.training.state import create_train_state
from ocrs_models_tpu.training.steps import make_layout_steps


def _setup(n):
    model = LayoutModel()
    ds = SyntheticLayout(size=n, n_words=32)
    batch = collate_layout([ds[i] for i in range(n)], batch_multiple=n)
    batch.pop("n_valid", None)
    state = create_train_state(model, jax.random.key(2), jnp.zeros((1, 32, 4)))
    step, _ = make_layout_steps(model)
    return model, batch, state, step


@pytest.mark.slow
def test_tp_step_matches_replicated():
    n = 8
    model, batch, state, step = _setup(n)
    lr = jnp.float32(3e-4)
    key = jax.random.key(3)

    mesh_dp = create_mesh(num_devices=n)
    # Copy per branch: the train step donates its state buffers, and on
    # CPU device_put can alias rather than copy.
    s_ref = replicate_tree(jax.tree.map(jnp.copy, state), mesh_dp)
    s_ref, m_ref = step(s_ref, shard_batch(batch, mesh_dp), lr, key)

    mesh2 = create_mesh_2d(4, 2)
    shardings = layout_tp_state_shardings(state, mesh2)
    s_tp = shard_tree(jax.tree.map(jnp.copy, state), shardings)
    s_tp, m_tp = step(s_tp, shard_batch(batch, mesh2), lr, key)

    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    # Updated parameters agree leaf-wise up to reduction-order float
    # noise (atol well below the 3e-4 Adam step size).
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    tp_leaves = jax.tree_util.tree_leaves(s_tp.params)
    for a, b in zip(tp_leaves, ref_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )
    # The TP kernels really are distributed over the model axis.
    qkv = s_tp.params["layer_0"]["qkv_kernel"]
    assert len(qkv.sharding.device_set) == 8
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")

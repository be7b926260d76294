"""Model-level parity of the fused conv-chain path (interpret mode) vs
the standard XLA path: same params, same outputs/grads/batch-stats within
float32 tolerance. Exercises exactly the code the TPU runs with
``OCRS_TPU_FUSED_CONV=1`` (modulo interpret-mode execution)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.models.detection import DetectionModel


@pytest.fixture()
def setup(monkeypatch):
    monkeypatch.delenv("OCRS_TPU_FUSED_CONV", raising=False)
    model = DetectionModel()
    rng = np.random.default_rng(0)
    x = jnp.array(rng.uniform(-0.5, 0.5, size=(2, 64, 64, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def _loss_fn(model, variables, x):
    def f(params):
        out, updates = model.apply(
            {**variables, "params": params},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out**2), updates

    return f


@pytest.mark.parametrize("mode", ["interp", "interp-xf"])
def test_chain_forward_matches_standard(setup, monkeypatch, mode):
    # train=True: the chain is gated to the train step (eval keeps XLA).
    model, variables, x = setup
    y_std, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    monkeypatch.setenv("OCRS_TPU_FUSED_CONV", mode)
    y_chain, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_chain), np.asarray(y_std), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("mode", ["interp", "interp-xf"])
def test_chain_train_grads_and_stats_match_standard(setup, monkeypatch, mode):
    model, variables, x = setup
    f = _loss_fn(model, variables, x)
    (l_std, up_std), g_std = jax.value_and_grad(f, has_aux=True)(variables["params"])
    monkeypatch.setenv("OCRS_TPU_FUSED_CONV", mode)
    (l_ch, up_ch), g_ch = jax.value_and_grad(f, has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(l_ch), float(l_std), rtol=1e-4)
    flat_std = jax.tree_util.tree_leaves_with_path(g_std)
    flat_ch = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(g_ch)}
    for path, leaf in flat_std:
        key = jax.tree_util.keystr(path)
        ref = np.asarray(leaf)
        got = np.asarray(flat_ch[key])
        np.testing.assert_allclose(
            got, ref, rtol=2e-3, atol=2e-3 * (np.abs(ref).max() + 1), err_msg=key
        )

    s_std = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(up_std["batch_stats"])
    }
    for p, v in jax.tree_util.tree_leaves_with_path(up_ch["batch_stats"]):
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(v), s_std[key], rtol=1e-4, atol=1e-5, err_msg=key
        )

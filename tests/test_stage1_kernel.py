"""Fused stage-1 kernel (conv 1->C + bias + relu + 2x2 pool) vs the XLA
reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.models import RecognitionModel
from ocrs_models_tpu.ops.pallas.stage1_kernel import (
    _reference_stage1,
    stage1_fused,
)


def _case(n=2, h=16, w=16, c=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, c)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))
    return x, k, b


@pytest.mark.parametrize("shape", [(2, 16, 16), (1, 16, 8), (3, 32, 12)])
def test_forward_matches_reference_f32(shape):
    n, h, w = shape
    x, k, b = _case(n, h, w)
    y = stage1_fused(x, k, b, True, jnp.float32)
    yr = _reference_stage1(x, k, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=1e-6, atol=1e-6)


def test_weight_grads_match_reference():
    x, k, b = _case(seed=1)

    def loss_f(k, b):
        return (stage1_fused(x, k, b, True, jnp.float32).astype(jnp.float32) ** 2).sum()

    def loss_r(k, b):
        return (_reference_stage1(x, k, b, jnp.float32).astype(jnp.float32) ** 2).sum()

    gf = jax.grad(loss_f, argnums=(0, 1))(k, b)
    gr = jax.grad(loss_r, argnums=(0, 1))(k, b)
    for a, c in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4)


def test_image_grad_falls_back_to_reference():
    x, k, b = _case(seed=2)
    gx = jax.grad(
        lambda xx: (stage1_fused(xx, k, b, True, jnp.float32).astype(jnp.float32) ** 2).sum()
    )(x)
    gxr = jax.grad(
        lambda xx: (_reference_stage1(xx, k, b, jnp.float32).astype(jnp.float32) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr), rtol=1e-5, atol=1e-5)


def test_bf16_within_precision_noise():
    x, k, b = _case(seed=3)
    y = stage1_fused(x, k, b, True, jnp.bfloat16)
    yr = _reference_stage1(x, k, b, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), rtol=0.02, atol=0.02
    )


class TestModelIntegration:
    def test_fused_backend_matches_xla_in_model(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 64, 1)).astype(np.float32))
        m_x = RecognitionModel(n_classes=97, conv_backend="xla")
        m_f = RecognitionModel(n_classes=97, conv_backend="fused")
        v = m_x.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            m_f.init(jax.random.key(0), x)
        )
        yx = m_x.apply(v, x)
        yf = m_f.apply(v, x)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yx), rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_fused_backend_grads_match(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 64, 1)).astype(np.float32))
        m_x = RecognitionModel(n_classes=97, conv_backend="xla")
        m_f = RecognitionModel(n_classes=97, conv_backend="fused")
        v = m_x.init(jax.random.key(0), x)

        def loss(mdl, p):
            lp, _ = mdl.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return (lp.astype(jnp.float32) ** 2).mean()

        gx = jax.grad(lambda p: loss(m_x, p))(v["params"])
        gf = jax.grad(lambda p: loss(m_f, p))(v["params"])
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6
            )

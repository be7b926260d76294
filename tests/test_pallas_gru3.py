"""Time-chunked GRU kernel (v3) vs the lax.scan reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.ops.gru import BiGRU
from ocrs_models_tpu.ops.pallas.gru_kernel import gru_recurrence_reference
from ocrs_models_tpu.ops.pallas.gru_kernel3 import gru_recurrence3


def _case(t=7, n=8, h=16, seed=0):
    rng = np.random.default_rng(seed)
    px = jnp.array(rng.normal(size=(t, 2, n, 3 * h)).astype(np.float32))
    w = jnp.array((rng.normal(size=(2, h, 3 * h)) * 0.3).astype(np.float32))
    b = jnp.array((rng.normal(size=(2, 3 * h)) * 0.1).astype(np.float32))
    return px, w, b


@pytest.mark.parametrize("t", [1, 7, 16, 33])
def test_forward_matches_reference(t):
    # t values cover: single step, chunk remainder, exact chunk, multi-chunk
    # with a padded tail.
    px, w, b = _case(t=t)
    ys_ref = gru_recurrence_reference(px, w, b)
    ys_pal = gru_recurrence3(px, w, b, jnp.float32, True)
    np.testing.assert_allclose(
        np.asarray(ys_pal), np.asarray(ys_ref), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("t", [7, 16, 33])
def test_gradients_match_reference(t):
    px, w, b = _case(t=t, seed=1)

    def loss_ref(px, w, b):
        return (gru_recurrence_reference(px, w, b) ** 2).sum()

    def loss_pal(px, w, b):
        return (gru_recurrence3(px, w, b, jnp.float32, True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(px, w, b)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(px, w, b)
    for a, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_bigru_pallas3_backend_matches_scan():
    n, t, f, h = 4, 9, 12, 16
    x = jnp.array(np.random.default_rng(2).normal(size=(n, t, f)).astype(np.float32))
    model_scan = BiGRU(hidden=h, layers=2, backend="scan")
    model_p3 = BiGRU(hidden=h, layers=2, backend="pallas3")
    params = model_scan.init(jax.random.key(0), x)
    y_scan = model_scan.apply(params, x)
    y_p3 = model_p3.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_p3), np.asarray(y_scan), rtol=1e-5, atol=1e-5
    )

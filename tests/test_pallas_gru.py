"""Pallas GRU kernel vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.ops.gru import BiGRU
from ocrs_models_tpu.ops.pallas.gru_kernel import (
    gru_recurrence,
    gru_recurrence_reference,
)


def _case(t=7, n=8, h=16, seed=0):
    rng = np.random.default_rng(seed)
    px = jnp.array(rng.normal(size=(t, 2, n, 3 * h)).astype(np.float32))
    w = jnp.array((rng.normal(size=(2, h, 3 * h)) * 0.3).astype(np.float32))
    b = jnp.array((rng.normal(size=(2, 3 * h)) * 0.1).astype(np.float32))
    return px, w, b


def test_forward_matches_reference():
    px, w, b = _case()
    ys_ref = gru_recurrence_reference(px, w, b)
    ys_pal = gru_recurrence(px, w, b, jnp.float32, True)
    np.testing.assert_allclose(
        np.asarray(ys_pal), np.asarray(ys_ref), rtol=1e-6, atol=1e-6
    )


def test_gradients_match_reference():
    px, w, b = _case(seed=1)

    def loss_ref(px, w, b):
        return (gru_recurrence_reference(px, w, b) ** 2).sum()

    def loss_pal(px, w, b):
        return (gru_recurrence(px, w, b, jnp.float32, True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(px, w, b)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(px, w, b)
    for a, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_bigru_pallas_backend_matches_scan():
    n, t, f, h = 4, 9, 12, 16
    x = jnp.array(np.random.default_rng(2).normal(size=(n, t, f)).astype(np.float32))
    scan_gru = BiGRU(hidden=h, layers=2, backend="scan")
    variables = scan_gru.init(jax.random.key(0), x)
    out_scan = scan_gru.apply(variables, x)
    pallas_gru = BiGRU(hidden=h, layers=2, backend="pallas")
    out_pal = pallas_gru.apply(variables, x)  # interpret mode on CPU
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_scan), rtol=1e-5, atol=1e-6
    )

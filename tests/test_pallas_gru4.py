"""Zero-relayout GRU kernel (v4) vs the lax.scan reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.ops.gru import BiGRU
from ocrs_models_tpu.ops.pallas.gru_kernel4 import gru_recurrence_reference
from ocrs_models_tpu.ops.pallas.gru_kernel4 import gru_recurrence4


def _case(t=7, n=8, h=16, seed=0):
    rng = np.random.default_rng(seed)
    px_f = jnp.array(rng.normal(size=(t, n, 3 * h)).astype(np.float32))
    px_b = jnp.array(rng.normal(size=(t, n, 3 * h)).astype(np.float32))
    w = jnp.array((rng.normal(size=(2, h, 3 * h)) * 0.3).astype(np.float32))
    b = jnp.array((rng.normal(size=(2, 3 * h)) * 0.1).astype(np.float32))
    return px_f, px_b, w, b


def _v1_equiv(px_f, px_b, w, b):
    """Map the v4 contract onto the v1 reference: the v1 layout stacks
    directions with direction 1 consuming the time-REVERSED sequence, and
    returns direction 1's outputs in reversed order."""
    px = jnp.stack([px_f, px_b[::-1]], axis=1)  # [T, 2, N, 3H]
    ys = gru_recurrence_reference(px, w, b)  # [T, 2, N, H]
    return ys[:, 0], ys[::-1, 1]


@pytest.mark.parametrize("t", [1, 2, 7, 33])
def test_forward_matches_reference(t):
    px_f, px_b, w, b = _case(t=t)
    ref_f, ref_b = _v1_equiv(px_f, px_b, w, b)
    ys_f, ys_b = gru_recurrence4(px_f, px_b, w, b, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ref_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ref_b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("t", [1, 7, 33])
def test_gradients_match_reference(t):
    px_f, px_b, w, b = _case(t=t, seed=1)

    def loss_ref(px_f, px_b, w, b):
        ref_f, ref_b = _v1_equiv(px_f, px_b, w, b)
        return (ref_f**2).sum() + (ref_b**3).sum()

    def loss_pal(px_f, px_b, w, b):
        ys_f, ys_b = gru_recurrence4(px_f, px_b, w, b, jnp.float32, True)
        return (ys_f**2).sum() + (ys_b**3).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(px_f, px_b, w, b)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(px_f, px_b, w, b)
    for a, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bigru_pallas4_backend_matches_scan():
    n, t, f, h = 4, 9, 12, 16
    x = jnp.array(np.random.default_rng(2).normal(size=(n, t, f)).astype(np.float32))
    model_scan = BiGRU(hidden=h, layers=2, backend="scan")
    model_p4 = BiGRU(hidden=h, layers=2, backend="pallas4")
    params = model_scan.init(jax.random.key(0), x)
    y_scan = model_scan.apply(params, x)
    y_p4 = model_p4.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_p4), np.asarray(y_scan),
                               rtol=1e-5, atol=1e-5)

    g_s = jax.grad(lambda p: (model_scan.apply(p, x) ** 2).sum())(params)
    g_4 = jax.grad(lambda p: (model_p4.apply(p, x) ** 2).sum())(params)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_4)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

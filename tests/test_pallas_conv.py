"""Fused depthwise-separable conv kernel vs the pure-JAX reference
(interpret mode; the kernel is experimental groundwork — see its module
docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.ops.pallas.conv_kernel import (
    fused_dwsep_conv,
    fused_dwsep_conv_reference,
)


@pytest.mark.parametrize("shape", [(2, 4, 12, 10, 8), (1, 8, 16, 130, 16)])
def test_forward_and_grads_match_reference(shape):
    n, c, h, w, o = shape
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=(n, c, h, w)).astype(np.float32))
    wd = jnp.array(rng.normal(size=(c, 3, 3)).astype(np.float32))
    wp = jnp.array(rng.normal(size=(c, o)).astype(np.float32))

    y_ref = fused_dwsep_conv_reference(x, wd, wp)
    y_pal = fused_dwsep_conv(x, wd, wp, True)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )

    g_ref = jax.grad(
        lambda x, wd, wp: (fused_dwsep_conv_reference(x, wd, wp) ** 2).sum(),
        argnums=(0, 1, 2),
    )(x, wd, wp)
    g_pal = jax.grad(
        lambda x, wd, wp: (fused_dwsep_conv(x, wd, wp, True) ** 2).sum(),
        argnums=(0, 1, 2),
    )(x, wd, wp)
    for a, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(a), rtol=1e-4, atol=1e-4 * float(jnp.abs(a).max() + 1)
        )

"""Fused BN->ReLU->dw3x3->pw chain kernel (ops/pallas/conv_chain.py) vs
its pure-JAX oracle, and the two-call chain vs an unfused DoubleConv-style
computation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.ops.pallas.conv_chain import (
    conv_chain,
    conv_chain_reference,
)


def _mats(rng, n, c, h, w, o, dtype=np.float32):
    x = jnp.array(rng.normal(size=(n, c, h, w)).astype(dtype))
    inv = jnp.array(rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32))
    bias = jnp.array(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    wd = jnp.array(rng.normal(size=(c, 3, 3)).astype(np.float32) * 0.5)
    wp = jnp.array(rng.normal(size=(c, o)).astype(np.float32) * 0.5)
    return x, inv, bias, wd, wp


# Shapes chosen to exercise masking: h not a multiple of the 16-row band,
# w not a multiple of 128.
@pytest.mark.parametrize("shape", [(2, 4, 12, 10, 8), (1, 8, 37, 130, 16)])
@pytest.mark.parametrize("bn_relu", [False, True])
def test_forward_and_stats_match_oracle(shape, bn_relu):
    n, c, h, w, o = shape
    rng = np.random.default_rng(0)
    x, inv, bias, wd, wp = _mats(rng, n, c, h, w, o)

    y_ref, s1_ref, s2_ref = conv_chain_reference(x, inv, bias, wd, wp, bn_relu)
    y, s1, s2 = conv_chain(x, inv, bias, wd, wp, bn_relu, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s1_ref), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(s2_ref), rtol=1e-4, atol=1e-3
    )


def test_bf16_forward_close_to_f32():
    rng = np.random.default_rng(1)
    x, inv, bias, wd, wp = _mats(rng, 1, 8, 20, 34, 8)
    y32, _, _ = conv_chain(x, inv, bias, wd, wp, True, True)
    y16, _, _ = conv_chain(
        x.astype(jnp.bfloat16), inv, bias, wd, wp, True, True
    )
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, dtype=np.float32), np.asarray(y32), rtol=0.1, atol=0.15
    )


@pytest.mark.parametrize("bn_relu", [False, True])
def test_grads_match_oracle(bn_relu):
    rng = np.random.default_rng(2)
    x, inv, bias, wd, wp = _mats(rng, 2, 4, 12, 10, 8)

    def loss_k(*args):
        y, s1, s2 = conv_chain(*args, bn_relu, True)
        return (y.astype(jnp.float32) ** 2).sum() + (s1 * s2).sum() * 1e-3

    def loss_r(*args):
        y, s1, s2 = conv_chain_reference(*args, bn_relu)
        return (y.astype(jnp.float32) ** 2).sum() + (s1 * s2).sum() * 1e-3

    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, inv, bias, wd, wp)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, inv, bias, wd, wp)
    for p, r in zip(g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(p),
            np.asarray(r),
            rtol=1e-4,
            atol=1e-4 * float(jnp.abs(r).max() + 1),
        )
    if not bn_relu:
        assert float(jnp.abs(g_k[1]).max()) == 0.0
        assert float(jnp.abs(g_k[2]).max()) == 0.0


def test_two_call_chain_matches_unfused_double_conv():
    """K(x, none) -> fold from stats -> K(y0, fold) reproduces
    conv -> BN(batch stats) -> ReLU -> conv exactly (f32)."""
    rng = np.random.default_rng(3)
    n, c, h, w, m, o = 2, 4, 18, 22, 8, 8
    x, _, _, wd0, wp0 = _mats(rng, n, c, h, w, m)
    _, _, _, wd1, wp1 = _mats(rng, n, m, h, w, o)
    scale = jnp.array(rng.uniform(0.5, 1.5, size=(m,)).astype(np.float32))
    beta = jnp.array(rng.normal(size=(m,)).astype(np.float32) * 0.1)
    eps = 1e-5

    # Fused chain.
    ones = jnp.ones((c,), jnp.float32)
    zeros = jnp.zeros((c,), jnp.float32)
    y0, s1, s2 = conv_chain(x, ones, zeros, wd0, wp0, False, True)
    cnt = n * h * w
    mean = s1 / cnt
    var = s2 / cnt - mean**2
    inv = scale * jax.lax.rsqrt(var + eps)
    fold_bias = beta - mean * inv
    y1, _, _ = conv_chain(y0, inv, fold_bias, wd1, wp1, True, True)

    # Unfused oracle: conv0 -> batch-stat BN -> ReLU -> conv1.
    def conv(xx, wd, wp):
        xp = jnp.pad(xx, ((0, 0), (0, 0), (1, 1), (1, 1)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = xp[:, :, dy : dy + h, dx : dx + w] * wd[None, :, dy, dx, None, None]
                acc = t if acc is None else acc + t
        return jnp.einsum("nchw,co->nohw", acc, wp)

    z0 = conv(x, wd0, wp0)
    mu = jnp.mean(z0, axis=(0, 2, 3))
    vr = jnp.var(z0, axis=(0, 2, 3))
    z0n = (z0 - mu[None, :, None, None]) * jax.lax.rsqrt(vr + eps)[
        None, :, None, None
    ] * scale[None, :, None, None] + beta[None, :, None, None]
    z1 = conv(jnp.maximum(z0n, 0), wd1, wp1)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(z1), rtol=1e-3, atol=1e-3)

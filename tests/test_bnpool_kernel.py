"""Fused stage-2 bnpool kernel: correctness vs the XLA reference block.

Runs in Pallas interpret mode on the CPU test mesh; the TPU timing A/B
lives in tools/bnpool_probe.py and docs/rec_perf.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.ops.pallas.bnpool_kernel import (
    bnpool_stats,
    fused_bnpool,
    reference_bnpool,
)


def _data(n=2, h=8, w=12, c=8, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.normal(0, 1, (n, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1, 0.3, (c,)).astype(np.float32))
    gamma = gamma.at[c // 2].set(-0.7)  # exercise the pmin selection
    beta = jnp.asarray(rng.normal(0, 0.2, (c,)).astype(np.float32))
    wt = jnp.asarray(
        rng.normal(0, 1, (n, h // 2, w // 2, c)).astype(np.float32)
    )
    return y, gamma, beta, wt


def test_stats_outputs():
    y, *_ = _data()
    pmax, pmin, s1, s2 = bnpool_stats(y, True)
    ref_max = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    ref_min = jax.lax.reduce_window(
        y, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    np.testing.assert_allclose(pmax, ref_max, rtol=0, atol=0)
    np.testing.assert_allclose(pmin, ref_min, rtol=0, atol=0)
    yf = np.asarray(y, np.float64)
    np.testing.assert_allclose(s1, yf.sum(axis=(0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(s2, (yf * yf).sum(axis=(0, 1, 2)), rtol=1e-5)


def test_forward_matches_reference():
    y, gamma, beta, _ = _data()
    out_f = fused_bnpool(y, gamma, beta, interpret=True)
    out_r = reference_bnpool(y, gamma, beta)
    np.testing.assert_allclose(out_f, out_r, atol=2e-6)


def test_gradients_match_reference():
    y, gamma, beta, wt = _data()

    def lf(y, g, b):
        return jnp.sum(wt * fused_bnpool(y, g, b, interpret=True))

    def lr(y, g, b):
        return jnp.sum(wt * reference_bnpool(y, g, b))

    gf = jax.grad(lf, argnums=(0, 1, 2))(y, gamma, beta)
    gr = jax.grad(lr, argnums=(0, 1, 2))(y, gamma, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_tie_routing_first_match():
    # Quantized values force exact ties inside 2x2 windows; the custom
    # VJP must route like XLA's select_and_scatter (first match in scan
    # order), not split or double-count.
    rng = np.random.default_rng(3)
    y = jnp.asarray(
        np.round(rng.normal(0, 1, (2, 8, 12, 8)) * 2) / 2, dtype=jnp.float32
    )
    _, gamma, beta, wt = _data()

    gf = jax.grad(
        lambda t: jnp.sum(wt * fused_bnpool(t, gamma, beta, interpret=True))
    )(y)
    gr = jax.grad(
        lambda t: jnp.sum(wt * reference_bnpool(t, gamma, beta))
    )(y)
    np.testing.assert_allclose(gf, gr, atol=1e-5)


def test_bf16_io_and_c64():
    # The production configuration: C=64 (full 128-lane fused view), bf16.
    rng = np.random.default_rng(1)
    y = jnp.asarray(
        rng.normal(0, 1, (2, 4, 8, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    out_f = fused_bnpool(y, gamma, beta, interpret=True)
    out_r = reference_bnpool(y, gamma, beta)
    assert out_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out_f.astype(np.float32), out_r.astype(np.float32), atol=0.05
    )


def test_bf16_backward_near_f32_truth():
    # In bf16 the reference applies the BN affine in bf16 BEFORE pooling,
    # which can collapse near-ties and route the pool gradient to a
    # different (equally valid) window position than the fused path's
    # raw-value argmax. So compare both to the f32-exact gradient: the
    # fused path must be at least as close to truth as the reference.
    rng = np.random.default_rng(5)
    y = jnp.asarray(
        rng.normal(0, 1, (4, 8, 16, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.3, (64,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.2, (64,)).astype(np.float32))

    def loss(fn, t):
        return jnp.sum(fn(t).astype(jnp.float32) ** 2)

    gf = jax.grad(
        lambda t: loss(lambda u: fused_bnpool(u, gamma, beta, interpret=True), t)
    )(y).astype(jnp.float32)
    gr = jax.grad(
        lambda t: loss(lambda u: reference_bnpool(u, gamma, beta), t)
    )(y).astype(jnp.float32)
    g32 = jax.grad(
        lambda t: loss(
            lambda u: reference_bnpool(u.astype(jnp.float32), gamma, beta), t
        )
    )(y).astype(jnp.float32)
    df = jnp.abs(gf - g32)
    dr = jnp.abs(gr - g32)
    assert float(jnp.mean(df > 0.1)) <= float(jnp.mean(dr > 0.1)) + 1e-3
    assert float(jnp.mean(df)) <= float(jnp.mean(dr)) * 1.5 + 1e-3


@pytest.mark.parametrize("train", [True, False])
def test_model_fused_vs_xla_stage2(train):
    # Model-level: conv_backend="fused" (interpret) must match "xla"
    # forward, grads, and batch_stats updates. f32 for tight tolerance.
    from ocrs_models_tpu.models.recognition import RecognitionModel

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 0.25, (2, 64, 32, 1)).astype(np.float32))
    kwargs = dict(n_classes=12, gru_hidden=16, gru_layers=1,
                  dtype=jnp.float32, gru_backend="scan")
    m_f = RecognitionModel(conv_backend="fused2", **kwargs)
    m_x = RecognitionModel(conv_backend="xla", **kwargs)
    vars_ = m_x.init(jax.random.PRNGKey(0), x, train=False)

    if not train:
        of = m_f.apply(vars_, x, train=False)
        ox = m_x.apply(vars_, x, train=False)
        np.testing.assert_allclose(of, ox, atol=1e-4)
        return

    def loss(params, model):
        out, upd = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2), upd["batch_stats"]

    (lf, bsf), gf = jax.value_and_grad(loss, has_aux=True)(vars_["params"], m_f)
    (lx, bsx), gx = jax.value_and_grad(loss, has_aux=True)(vars_["params"], m_x)
    np.testing.assert_allclose(lf, lx, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3), bsf, bsx
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3),
        gf, gx,
    )

"""Pallas CTC recurrence kernel vs the lax.scan path (interpret mode):
loss values and gradients, including ragged input/label lengths and
empty labels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.ops.ctc import ctc_loss, ctc_loss_forward


def _case(seed, n=4, t=20, c=12, l=6):
    rng = np.random.default_rng(seed)
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((n, t, c)).astype(np.float32)), -1
    )
    label_lengths = jnp.asarray(rng.integers(0, l + 1, n).astype(np.int32))
    labels = np.zeros((n, l), np.int32)
    for i, ll in enumerate(np.asarray(label_lengths)):
        labels[i, :ll] = rng.integers(1, c, ll)
    input_lengths = jnp.asarray(
        rng.integers(max(2 * l + 1, 4), t + 1, n).astype(np.int32)
    )
    return log_probs, jnp.asarray(labels), input_lengths, label_lengths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_loss_matches_scan(seed):
    args = _case(seed)
    nll_scan = ctc_loss_forward(*args, backend="scan")
    nll_ker = ctc_loss_forward(*args, backend="pallas-interpret")
    np.testing.assert_allclose(
        np.asarray(nll_ker), np.asarray(nll_scan), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_kernel_grads_match_scan(seed):
    args = _case(seed)

    def loss_with(backend):
        def f(lp):
            return ctc_loss(lp, *args[1:], backend=backend)

        return f

    g_scan = jax.grad(loss_with("scan"))(args[0])
    g_ker = jax.grad(loss_with("pallas-interpret"))(args[0])
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_scan), rtol=1e-4, atol=1e-5
    )


def test_kernel_handles_repeated_and_tight_labels():
    # Repeated labels exercise the can_skip gating; input length equal to
    # the minimum feasible path length exercises the reachability edge.
    log_probs = jax.nn.log_softmax(
        jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 9, 5)).astype(np.float32)
        ),
        -1,
    )
    labels = jnp.asarray([[1, 1, 2, 2], [3, 3, 3, 3]], jnp.int32)
    input_lengths = jnp.asarray([9, 8], jnp.int32)
    label_lengths = jnp.asarray([4, 4], jnp.int32)
    args = (log_probs, labels, input_lengths, label_lengths)
    nll_scan = ctc_loss_forward(*args, backend="scan")
    nll_ker = ctc_loss_forward(*args, backend="pallas-interpret")
    np.testing.assert_allclose(
        np.asarray(nll_ker), np.asarray(nll_scan), rtol=1e-5, atol=1e-5
    )
    g_scan = jax.grad(lambda lp: jnp.sum(ctc_loss_forward(lp, *args[1:], backend="scan")))(log_probs)
    g_ker = jax.grad(
        lambda lp: jnp.sum(
            ctc_loss_forward(lp, *args[1:], backend="pallas-interpret")
        )
    )(log_probs)
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_scan), rtol=1e-4, atol=1e-5
    )

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ocrs_models_tpu.ops import (
    BiGRU,
    balanced_cross_entropy_loss,
    ctc_loss,
    ctc_loss_forward,
    weighted_bce_with_logits,
)


class TestCTC:
    def _random_case(self, seed, n=4, t=20, c=8, lmax=7):
        rng = np.random.default_rng(seed)
        logits = rng.normal(size=(n, t, c)).astype(np.float32)
        log_probs = jax.nn.log_softmax(jnp.array(logits), axis=-1)
        label_lengths = rng.integers(1, lmax + 1, size=n)
        labels = np.zeros((n, lmax), dtype=np.int32)
        for i, ll in enumerate(label_lengths):
            labels[i, :ll] = rng.integers(1, c, size=ll)
        input_lengths = rng.integers(2 * lmax + 1, t + 1, size=n)
        return log_probs, jnp.array(labels), jnp.array(input_lengths), jnp.array(label_lengths)

    def test_matches_optax(self):
        for seed in range(5):
            lp, labels, in_len, lab_len = self._random_case(seed)
            ours = ctc_loss_forward(lp, labels, in_len, lab_len)
            n, t, _ = lp.shape
            logit_pad = (jnp.arange(t)[None, :] >= in_len[:, None]).astype(jnp.float32)
            label_pad = (
                jnp.arange(labels.shape[1])[None, :] >= lab_len[:, None]
            ).astype(jnp.float32)
            theirs = optax.ctc_loss(lp, logit_pad, labels, label_pad)
            # In float64 both agree to 1e-13 (semantically identical);
            # float32 accumulation order differs, hence the loose rtol.
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(theirs), rtol=5e-3, atol=1e-3
            )

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        for seed in range(3):
            lp, labels, in_len, lab_len = self._random_case(seed)
            ours = ctc_loss(lp, labels, in_len, lab_len)
            t_lp = torch.tensor(np.asarray(lp)).permute(1, 0, 2)  # [T, N, C]
            t_loss = torch.nn.CTCLoss(blank=0)(
                t_lp,
                torch.tensor(np.asarray(labels)),
                torch.tensor(np.asarray(in_len)),
                torch.tensor(np.asarray(lab_len)),
            )
            np.testing.assert_allclose(
                float(ours), float(t_loss), rtol=5e-3, atol=1e-3
            )

    def test_simple_known_value(self):
        # Single timestep, single label: loss = -log p(label at t0)... needs
        # T >= L; with T=1, L=1 path = [label]. NLL = -log_probs[0, 0, label].
        lp = jax.nn.log_softmax(jnp.array([[[0.1, 2.0, -1.0]]]), axis=-1)
        nll = ctc_loss_forward(
            lp, jnp.array([[1]]), jnp.array([1]), jnp.array([1])
        )
        np.testing.assert_allclose(float(nll[0]), float(-lp[0, 0, 1]), rtol=1e-5)

    def test_grad_is_finite(self):
        lp, labels, in_len, lab_len = self._random_case(42)

        def loss_fn(x):
            return ctc_loss(jax.nn.log_softmax(x, -1), labels, in_len, lab_len)

        g = jax.grad(loss_fn)(lp * 1.0)
        assert np.isfinite(np.asarray(g)).all()


class TestBiGRU:
    def test_matches_torch_gru(self):
        torch = pytest.importorskip("torch")
        n, t, f, h = 3, 11, 16, 24
        model = BiGRU(hidden=h, layers=2)
        x = np.random.default_rng(0).normal(size=(n, t, f)).astype(np.float32)
        variables = model.init(jax.random.key(0), jnp.array(x))

        tg = torch.nn.GRU(f, h, bidirectional=True, num_layers=2)
        # Copy flax params into torch (torch keeps [3H, in] row-major (r,z,n)).
        sd = tg.state_dict()
        p = variables["params"]
        for layer in range(2):
            lp = p[f"layer_{layer}"]
            for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
                sd[f"weight_ih_l{layer}{suffix}"] = torch.tensor(
                    np.asarray(lp[f"w_ih_{direction}"]).T
                )
                sd[f"weight_hh_l{layer}{suffix}"] = torch.tensor(
                    np.asarray(lp[f"w_hh_{direction}"]).T
                )
                sd[f"bias_ih_l{layer}{suffix}"] = torch.tensor(
                    np.asarray(lp[f"b_ih_{direction}"])
                )
                sd[f"bias_hh_l{layer}{suffix}"] = torch.tensor(
                    np.asarray(lp[f"b_hh_{direction}"])
                )
        tg.load_state_dict(sd)

        ours = np.asarray(model.apply(variables, jnp.array(x)))
        with torch.no_grad():
            theirs, _ = tg(torch.tensor(x).permute(1, 0, 2))  # [T, N, 2H]
        theirs = theirs.permute(1, 0, 2).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestBalancedBCE:
    def test_matches_torch_reference_impl(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        def torch_balanced_bce(pred, target):
            # Direct re-execution of the reference loss semantics
            # (train_detection.py:225-263) for golden comparison.
            pos_mask = target > 0.5
            neg_mask = target < 0.5
            target = target.clamp(0.0, 1.0)
            pixel_loss = F.binary_cross_entropy(pred, target, reduction="none")
            pos_loss = pos_mask * pixel_loss
            neg_loss = neg_mask * pixel_loss
            n_els = int(
                min(
                    torch.count_nonzero(pos_mask).item(),
                    torch.count_nonzero(neg_mask).item(),
                )
            )
            pos_topk, _ = pos_loss.flatten().topk(k=n_els, sorted=False)
            neg_topk, _ = neg_loss.flatten().topk(k=n_els, sorted=False)
            return torch.cat([pos_topk, neg_topk]).mean()

        rng = np.random.default_rng(0)
        for _ in range(4):
            pred = rng.uniform(0.01, 0.99, size=(2, 32, 24, 1)).astype(np.float32)
            target = (rng.uniform(size=(2, 32, 24, 1)) > 0.8).astype(np.float32)
            ours = float(balanced_cross_entropy_loss(jnp.array(pred), jnp.array(target)))
            theirs = float(
                torch_balanced_bce(torch.tensor(pred), torch.tensor(target))
            )
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_jittable(self):
        f = jax.jit(balanced_cross_entropy_loss)
        pred = jnp.full((1, 8, 8, 1), 0.3)
        target = jnp.zeros((1, 8, 8, 1)).at[0, 2:4, 2:4, 0].set(1.0)
        v = float(f(pred, target))
        assert np.isfinite(v)

    def test_top_k_sum_tie_value_and_gradient(self):
        """Ties at the k-th value: the value is the exact top-k sum and
        the gradient splits the residual slots equally among the tied
        entries (symmetric subgradient; torch would give an arbitrary
        residual-sized subset weight 1 — same total mass)."""
        from ocrs_models_tpu.ops.losses import _top_k_sum

        x = jnp.array([3.0, 2.0, 2.0, 2.0, 1.0])
        k = jnp.int32(3)
        assert float(_top_k_sum(x, k)) == pytest.approx(7.0)  # 3 + 2 + 2

        g = jax.grad(lambda v: _top_k_sum(v, k))(x)
        np.testing.assert_allclose(
            np.asarray(g), [1.0, 2 / 3, 2 / 3, 2 / 3, 0.0], atol=1e-6
        )
        # Unique k-th value: coincides with torch's topk backward exactly.
        y = jnp.array([5.0, 4.0, 3.0, 2.0, 1.0])
        gy = jax.grad(lambda v: _top_k_sum(v, k))(y)
        np.testing.assert_allclose(np.asarray(gy), [1, 1, 1, 0, 0], atol=1e-6)


class TestWeightedBCE:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(4, 10, 2)).astype(np.float32)
        targets = (rng.uniform(size=(4, 10, 2)) > 0.9).astype(np.float32)
        ours = float(
            weighted_bce_with_logits(jnp.array(logits), jnp.array(targets), 10.0)
        )
        loss = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor((10.0, 10.0)))
        theirs = float(loss(torch.tensor(logits), torch.tensor(targets)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

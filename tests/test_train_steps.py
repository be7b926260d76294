"""End-to-end train/eval steps on a virtual 8-device CPU mesh — the same
data-parallel path the driver dry-runs for multi-chip validation."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.config import DEFAULT_ALPHABET
from ocrs_models_tpu.data import (
    DataLoader,
    SyntheticDetection,
    SyntheticLayout,
    SyntheticRecognition,
    collate_detection,
    collate_layout,
    collate_recognition,
)
from ocrs_models_tpu.models import DetectionModel, LayoutModel, RecognitionModel
from ocrs_models_tpu.parallel import create_mesh, replicate_tree, shard_batch
from ocrs_models_tpu.training.state import create_train_state
from ocrs_models_tpu.training.steps import (
    make_detection_steps,
    make_layout_steps,
    make_recognition_steps,
)


@pytest.mark.slow
def test_recognition_train_step_on_mesh():
    mesh = create_mesh()
    assert mesh.size == 8
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    ds = SyntheticRecognition(size=16, max_chars=6)
    loader = DataLoader(
        ds,
        batch_size=16,
        collate_fn=lambda s: collate_recognition(s, batch_multiple=mesh.size),
    )
    batch = next(iter(loader))
    assert batch["image"].shape[0] % 8 == 0

    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    state = replicate_tree(state, mesh)
    train_step, eval_step = make_recognition_steps(model)

    sharded = shard_batch(batch, mesh)
    losses = []
    for _ in range(2):
        state, metrics = train_step(state, sharded, jnp.float32(1e-3))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert float(metrics["grad_norm"]) > 0

    ev = eval_step(state, sharded)
    assert np.isfinite(float(ev["loss"]))
    t_expect = batch["image"].shape[2] // 4 + 1
    assert ev["preds"].shape == (batch["image"].shape[0], t_expect)


@pytest.mark.slow
def test_shard_map_recognition_step_matches_manual_psum():
    """The mesh= (shard_map manual-SPMD) path — the exact code
    dryrun_multichip runs — must equal a per-shard emulation: per-device
    loss numerator/denominator and grads summed across shards, batch stats
    averaged. One refactor typo in the psum plumbing fails this test."""
    mesh = create_mesh()
    n_dev = mesh.size
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    ds = SyntheticRecognition(size=2 * n_dev, max_chars=4)
    batch = collate_recognition(
        [ds[i] for i in range(2 * n_dev)], width_step=64, batch_multiple=n_dev
    )

    def fresh_state():
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
        )

    # --- shard_map path ---
    state_sm = replicate_tree(fresh_state(), mesh)
    train_step, _ = make_recognition_steps(model, mesh=mesh)
    state_sm, metrics_sm = train_step(
        state_sm, shard_batch(batch, mesh), jnp.float32(1e-3)
    )

    # --- manual emulation: loop the shards on one device ---
    state = fresh_state()

    def shard(arr, i):
        per = arr.shape[0] // n_dev
        return arr[i * per : (i + 1) * per]

    def shard_num(params, batch_stats, sub):
        log_probs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            sub["image"],
            train=True,
            mutable=["batch_stats"],
        )
        from ocrs_models_tpu.ops.ctc import ctc_loss_forward

        nll = ctc_loss_forward(
            log_probs, sub["text"], sub["image_width"] // 4, sub["text_len"]
        )
        per_sample = nll / jnp.maximum(sub["text_len"], 1)
        return jnp.sum(per_sample * sub["sample_weight"]), mutated["batch_stats"]

    num_total = 0.0
    den_total = float(batch["sample_weight"].sum())
    grads_total = None
    stats_acc = None
    for i in range(n_dev):
        sub = {k: shard(jnp.asarray(v), i) for k, v in batch.items()}
        (num, stats), g = jax.value_and_grad(shard_num, has_aux=True)(
            state.params, state.batch_stats, sub
        )
        num_total += float(num)
        grads_total = (
            g if grads_total is None else jax.tree.map(jnp.add, grads_total, g)
        )
        stats_acc = (
            stats if stats_acc is None else jax.tree.map(jnp.add, stats_acc, stats)
        )
    loss_manual = num_total / den_total
    grads_manual = jax.tree.map(lambda x: x / den_total, grads_total)
    stats_manual = jax.tree.map(lambda x: x / n_dev, stats_acc)
    state_manual = state.apply_gradients(
        grads_manual, jnp.float32(1e-3), new_batch_stats=stats_manual
    )

    assert abs(float(metrics_sm["loss"]) - loss_manual) < 1e-4
    # Tight check at the gradient level (pre-optimizer).
    import optax

    gn_manual = float(optax.global_norm(grads_manual))
    assert abs(float(metrics_sm["grad_norm"]) - gn_manual) < 1e-4 * max(gn_manual, 1)
    # Post-Adam params: rsqrt(v) near zero amplifies reduction-order noise
    # up to the lr (1e-3) scale on isolated elements; 5e-4 still catches any
    # structural divergence (a wrong psum shows up as O(n_dev) errors).
    for a, b in zip(
        jax.tree.leaves(state_sm.params), jax.tree.leaves(state_manual.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    for a, b in zip(
        jax.tree.leaves(state_sm.batch_stats),
        jax.tree.leaves(state_manual.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_recognition_loss_decreases_when_overfitting():
    mesh = create_mesh(num_devices=1)
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    ds = SyntheticRecognition(size=4, max_chars=3)
    batch = collate_recognition([ds[i] for i in range(4)])
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    train_step, _ = make_recognition_steps(model)
    sharded = shard_batch(batch, mesh)
    first = None
    for i in range(12):
        state, metrics = train_step(state, sharded, jnp.float32(3e-3))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


@pytest.mark.slow
def test_detection_train_step_on_mesh():
    mesh = create_mesh()
    model = DetectionModel()
    ds = SyntheticDetection(size=8, page_size=(64, 64))
    batch = collate_detection([ds[i] for i in range(8)], batch_multiple=8)
    batch.pop("path", None)
    n_valid = batch.pop("n_valid")
    assert n_valid == 8

    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    state = replicate_tree(state, mesh)
    train_step, eval_step = make_detection_steps(model)
    sharded = shard_batch(batch, mesh)
    state, metrics = train_step(state, sharded, jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    ev = eval_step(state, sharded)
    assert ev["pred"].shape == batch["image"].shape
    assert np.isfinite(float(ev["loss"]))


def test_layout_train_step_on_mesh():
    mesh = create_mesh()
    model = LayoutModel()
    ds = SyntheticLayout(size=8, n_words=32)
    batch = collate_layout([ds[i] for i in range(8)], batch_multiple=8)
    batch.pop("n_valid")

    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 32, 4)))
    state = replicate_tree(state, mesh)
    train_step, eval_step = make_layout_steps(model)
    sharded = shard_batch(batch, mesh)
    state, metrics = train_step(
        state, sharded, jnp.float32(3e-4), jax.random.key(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["probs"].shape == (8, 32, 2)
    ev = eval_step(state, sharded)
    assert np.isfinite(float(ev["loss"]))


class TestDataLoader:
    def test_batching_and_order(self):
        ds = [{"v": i} for i in range(10)]
        loader = DataLoader(
            ds, batch_size=4, collate_fn=lambda s: [x["v"] for x in s]
        )
        batches = list(loader)
        assert batches == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]

    def test_drop_last(self):
        ds = [{"v": i} for i in range(10)]
        loader = DataLoader(
            ds, batch_size=4, collate_fn=lambda s: s, drop_last=True
        )
        assert len(list(loader)) == 2

    def test_shuffle_changes_across_epochs(self):
        ds = list(range(32))
        loader = DataLoader(
            ds, batch_size=32, collate_fn=lambda s: list(s), shuffle=True, seed=1
        )
        e1 = list(loader)[0]
        e2 = list(loader)[0]
        assert sorted(e1) == sorted(e2) == list(range(32))
        assert e1 != e2

    def test_process_sharding_is_disjoint(self):
        ds = list(range(16))
        seen = []
        for pi in range(2):
            loader = DataLoader(
                ds,
                batch_size=4,
                collate_fn=lambda s: list(s),
                process_index=pi,
                process_count=2,
            )
            for b in loader:
                seen.extend(b)
        assert sorted(seen) == list(range(16))

    def test_worker_error_propagates(self):
        class Bad:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = DataLoader(Bad(), batch_size=1, collate_fn=lambda s: s)
        try:
            list(loader)
            assert False, "expected RuntimeError"
        except RuntimeError as e:
            assert "boom" in str(e)


class TestCollation:
    def test_recognition_width_bucketing(self):
        ds = SyntheticRecognition(size=6, max_chars=10)
        batch = collate_recognition([ds[i] for i in range(6)])
        assert batch["image"].shape[2] % 256 == 0
        assert batch["text"].shape[1] % 64 == 0
        assert batch["sample_weight"].sum() == 6.0

    def test_recognition_incompatible_sample_masked(self):
        # 8px image -> 2 CTC timesteps, but 3 labels: incompatible.
        s = {
            "image": np.zeros((64, 8, 1), np.float32),
            "text": np.array([1, 2, 3], np.int32),
        }
        ok = {
            "image": np.zeros((64, 400, 1), np.float32),
            "text": np.array([1, 2, 3], np.int32),
        }
        batch = collate_recognition([s, ok])
        assert batch["sample_weight"].tolist() == [0.0, 1.0]

    def test_batch_multiple_padding(self):
        ds = SyntheticRecognition(size=3)
        batch = collate_recognition([ds[i] for i in range(3)], batch_multiple=8)
        assert batch["image"].shape[0] == 8
        assert batch["sample_weight"][3:].sum() == 0.0

"""Gradient accumulation (``grad_accum=k``): the scan-over-microbatches
inside each jitted step must reproduce a manual k-iteration microbatch
loop exactly — same accumulated loss, same gradients, same optimizer
update, and (for recognition/detection) the same sequentially-threaded
BatchNorm statistics. The reference has no accumulation feature; this is
the TPU-native equivalent of the torch pattern of calling backward() k
times before optimizer.step() (activation memory drops ~k× while the
optimizer math is unchanged)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ocrs_models_tpu.config import DEFAULT_ALPHABET
from ocrs_models_tpu.data import (
    SyntheticDetection,
    SyntheticLayout,
    SyntheticRecognition,
    collate_detection,
    collate_layout,
    collate_recognition,
)
from ocrs_models_tpu.models import DetectionModel, LayoutModel, RecognitionModel
from ocrs_models_tpu.ops.ctc import ctc_loss_forward
from ocrs_models_tpu.ops.losses import (
    balanced_cross_entropy_loss,
    weighted_bce_with_logits,
)
from ocrs_models_tpu.parallel import create_mesh, replicate_tree, shard_batch
from ocrs_models_tpu.training.state import create_train_state
from ocrs_models_tpu.training.steps import (
    _split_microbatches,
    make_detection_steps,
    make_layout_steps,
    make_recognition_steps,
)


def _tree_allclose(a, b, atol=1e-5, rtol=1e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol
        )


def test_split_microbatches_shapes_and_divisibility():
    batch = {"a": np.arange(12).reshape(6, 2), "b": np.ones((6,))}
    micro = _split_microbatches(batch, 3)
    assert micro["a"].shape == (3, 2, 2)
    assert micro["b"].shape == (3, 2)
    # Strided interleave: microbatch i holds samples i, i+k, i+2k, ...
    # (device-local under a batch sharded along axis 0).
    np.testing.assert_array_equal(
        np.asarray(micro["a"][1]), np.asarray(batch["a"][1::3])
    )
    with pytest.raises(ValueError):
        _split_microbatches(batch, 4)


def test_merge_microbatches_inverts_split():
    from ocrs_models_tpu.training.steps import _merge_microbatches

    x = np.arange(48).reshape(8, 3, 2).astype(np.float32)
    micro = _split_microbatches({"x": x}, 4)["x"]  # [4, 2, 3, 2]
    np.testing.assert_array_equal(np.asarray(_merge_microbatches(micro)), x)
    # Time-major outputs (batch axis 1), as the recognizer's log_probs.
    tm = np.transpose(micro, (0, 2, 1, 3))  # [4, 3, 2, 2]
    merged = _merge_microbatches(jnp.asarray(tm), batch_axis=1)
    np.testing.assert_array_equal(
        np.asarray(merged), np.transpose(x, (1, 0, 2))
    )


def test_grad_accum_must_be_positive():
    with pytest.raises(ValueError):
        make_recognition_steps(
            RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1), grad_accum=0
        )
    with pytest.raises(ValueError):
        make_detection_steps(DetectionModel(), grad_accum=0)
    with pytest.raises(ValueError):
        make_layout_steps(LayoutModel(), grad_accum=-1)


@pytest.mark.slow
def test_recognition_grad_accum_matches_manual_loop():
    """grad_accum=2 must equal running the two microbatches by hand:
    sequential batch_stats threading, summed num/den/grads, one update."""
    k = 2
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    ds = SyntheticRecognition(size=4, max_chars=4)
    batch = collate_recognition([ds[i] for i in range(4)], width_step=64)

    def fresh_state():
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
        )

    train_step, _ = make_recognition_steps(model, grad_accum=k)
    state_acc, metrics = train_step(
        fresh_state(), {kk: jnp.asarray(v) for kk, v in batch.items()},
        jnp.float32(1e-3),
    )

    # Manual two-microbatch emulation (interleaved split: mb i = samples i::k).
    state = fresh_state()

    def micro_num(params, batch_stats, mb):
        log_probs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mb["image"], train=True, mutable=["batch_stats"],
        )
        nll = ctc_loss_forward(
            log_probs, mb["text"], mb["image_width"] // 4, mb["text_len"]
        )
        per_sample = nll / jnp.maximum(mb["text_len"], 1)
        return jnp.sum(per_sample * mb["sample_weight"]), (
            mutated["batch_stats"], log_probs,
        )

    num_t, den_t, grads_t = 0.0, 0.0, None
    bstats = state.batch_stats
    log_probs_parts = []
    for i in range(k):
        mb = {kk: jnp.asarray(v[i::k]) for kk, v in batch.items()}
        (num, (bstats, lp)), g = jax.value_and_grad(micro_num, has_aux=True)(
            state.params, bstats, mb
        )
        num_t += float(num)
        den_t += float(mb["sample_weight"].sum())
        grads_t = g if grads_t is None else jax.tree.map(jnp.add, grads_t, g)
        log_probs_parts.append(lp)

    loss_manual = num_t / den_t
    grads_manual = jax.tree.map(lambda x: x / den_t, grads_t)
    state_manual = state.apply_gradients(
        grads_manual, jnp.float32(1e-3), new_batch_stats=bstats
    )

    assert abs(float(metrics["loss"]) - loss_manual) < 1e-5
    gn = float(optax.global_norm(grads_manual))
    assert abs(float(metrics["grad_norm"]) - gn) < 1e-5 * max(gn, 1.0)
    # Post-Adam params: rsqrt(v) near zero amplifies scan-vs-loop
    # reduction-order noise up to the lr (1e-3) scale on isolated elements
    # (same rationale and tolerance as the shard_map parity test); 5e-4
    # still catches structural divergence.
    _tree_allclose(state_acc.params, state_manual.params, atol=5e-4)
    # Final batch stats = those of the LAST microbatch's sequential thread.
    _tree_allclose(state_acc.batch_stats, state_manual.batch_stats, atol=1e-5)
    # preds are reassembled in original sample order: part i holds the
    # log_probs of samples i::k.
    _, t, c = log_probs_parts[0].shape  # [n, T, C] batch-major
    n_total = batch["image"].shape[0]
    lp_manual = np.empty((n_total, t, c), np.float32)
    for i in range(k):
        lp_manual[i::k] = np.asarray(log_probs_parts[i])
    # Argmax can flip on near-ties under ~1e-5 fusion noise; a wrong
    # sample-order reassembly would disagree almost everywhere.
    agree = np.mean(
        np.asarray(metrics["preds"]) == np.argmax(lp_manual, axis=-1)
    )
    assert agree > 0.99, f"pred agreement {agree:.4f}"


@pytest.mark.slow
def test_recognition_grad_accum_composes_with_shard_map():
    """grad_accum under shard_map: each device scans its own shard's
    microbatches, then one psum — equal to the grad_accum=1 shard_map step
    up to BatchNorm's microbatch statistics, so compare against a manual
    per-shard, per-microbatch emulation at the loss level."""
    mesh = create_mesh()
    n_dev = mesh.size
    k = 2
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    ds = SyntheticRecognition(size=2 * n_dev * k, max_chars=4)
    batch = collate_recognition(
        [ds[i] for i in range(2 * n_dev * k)], width_step=64,
        batch_multiple=n_dev * k,
    )

    state = replicate_tree(
        create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
        ),
        mesh,
    )
    train_step, _ = make_recognition_steps(model, mesh=mesh, grad_accum=k)
    state, metrics = train_step(state, shard_batch(batch, mesh), jnp.float32(1e-3))

    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    t_expect = batch["image"].shape[2] // 4 + 1
    assert metrics["preds"].shape == (batch["image"].shape[0], t_expect)

    # Loss must equal the global Σnum/Σden computed shard-by-shard,
    # microbatch-by-microbatch on one device.
    params = jax.device_get(state.params)  # post-update; recompute on init
    del params
    init = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    num_t, den_t = 0.0, 0.0
    per_dev = batch["image"].shape[0] // n_dev
    for d in range(n_dev):
        bstats = init.batch_stats
        for m in range(k):
            # Device d's local shard is the contiguous block; microbatch m
            # is the interleaved slice m::k of that block.
            mb = {
                kk: jnp.asarray(v[d * per_dev : (d + 1) * per_dev][m::k])
                for kk, v in batch.items()
            }
            log_probs, mutated = model.apply(
                {"params": init.params, "batch_stats": bstats},
                mb["image"], train=True, mutable=["batch_stats"],
            )
            bstats = mutated["batch_stats"]
            nll = ctc_loss_forward(
                log_probs, mb["text"], mb["image_width"] // 4, mb["text_len"]
            )
            per_sample = nll / jnp.maximum(mb["text_len"], 1)
            num_t += float(jnp.sum(per_sample * mb["sample_weight"]))
            den_t += float(mb["sample_weight"].sum())
    assert abs(float(metrics["loss"]) - num_t / den_t) < 1e-4


@pytest.mark.slow
def test_detection_grad_accum_matches_manual_loop():
    k = 2
    model = DetectionModel()
    ds = SyntheticDetection(size=4, page_size=(64, 64))
    batch = collate_detection([ds[i] for i in range(4)])
    batch.pop("path", None)
    batch.pop("n_valid", None)

    def fresh_state():
        return create_train_state(model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)))

    train_step, _ = make_detection_steps(model, grad_accum=k)
    state_acc, metrics = train_step(
        fresh_state(), {kk: jnp.asarray(v) for kk, v in batch.items()},
        jnp.float32(1e-3),
    )

    state = fresh_state()
    n = batch["image"].shape[0] // k

    def micro_loss(params, batch_stats, mb):
        pred, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mb["image"], train=True, mutable=["batch_stats"],
        )
        loss = balanced_cross_entropy_loss(
            pred, mb["mask"], mb.get("sample_weight")
        )
        return loss, (pred, mutated["batch_stats"])

    loss_t, den_t, grads_t = 0.0, 0.0, None
    bstats = state.batch_stats
    preds = []
    for i in range(k):
        mb = {kk: jnp.asarray(v[i::k]) for kk, v in batch.items()}
        (l, (pred, bstats)), g = jax.value_and_grad(micro_loss, has_aux=True)(
            state.params, bstats, mb
        )
        den = float(mb["sample_weight"].sum()) if "sample_weight" in mb else n
        loss_t += float(l) * den
        den_t += den
        grads_t = (
            jax.tree.map(lambda a, b: a + b * den, grads_t, g)
            if grads_t is not None
            else jax.tree.map(lambda b: b * den, g)
        )
        preds.append(pred)

    loss_manual = loss_t / den_t
    grads_manual = jax.tree.map(lambda x: x / den_t, grads_t)
    state_manual = state.apply_gradients(
        grads_manual, jnp.float32(1e-3), new_batch_stats=bstats
    )

    assert abs(float(metrics["loss"]) - loss_manual) < 1e-5
    _tree_allclose(state_acc.params, state_manual.params, atol=5e-4)
    _tree_allclose(state_acc.batch_stats, state_manual.batch_stats, atol=1e-5)
    pred_manual = np.empty(batch["image"].shape, np.float32)
    for i in range(k):
        pred_manual[i::k] = np.asarray(preds[i])
    # Probability maps carry scan-fusion-vs-eager BN reduction noise
    # (~3e-5); anything structural (wrong sample order) is O(1).
    np.testing.assert_allclose(
        np.asarray(metrics["pred"]), pred_manual, atol=1e-3
    )


def test_layout_grad_accum_matches_manual_loop():
    """Layout: deterministic given the same per-microbatch dropout rng
    folds (jax.random.split(rng, k), microbatch i gets split[i])."""
    k = 2
    model = LayoutModel()
    ds = SyntheticLayout(size=4, n_words=16)
    batch = collate_layout([ds[i] for i in range(4)])
    batch.pop("n_valid", None)

    def fresh_state():
        return create_train_state(model, jax.random.key(0), jnp.zeros((1, 16, 4)))

    rng = jax.random.key(7)
    train_step, _ = make_layout_steps(model, pos_weight=10.0, grad_accum=k)
    state_acc, metrics = train_step(
        fresh_state(), {kk: jnp.asarray(v) for kk, v in batch.items()},
        jnp.float32(3e-4), rng,
    )

    state = fresh_state()
    n = batch["boxes"].shape[0] // k
    rngs = jax.random.split(rng, k)

    def micro_loss(params, mb, mb_rng):
        logits = model.apply(
            {"params": params}, mb["boxes"], train=True,
            rngs={"dropout": mb_rng},
        )
        loss = weighted_bce_with_logits(
            logits, mb["labels"], 10.0, mb.get("sample_weight")
        )
        return loss, logits

    loss_t, den_t, grads_t = 0.0, 0.0, None
    logits_parts = []
    for i in range(k):
        mb = {kk: jnp.asarray(v[i::k]) for kk, v in batch.items()}
        (l, logits), g = jax.value_and_grad(micro_loss, has_aux=True)(
            state.params, mb, rngs[i]
        )
        den = float(mb["sample_weight"].sum()) if "sample_weight" in mb else n
        loss_t += float(l) * den
        den_t += den
        grads_t = (
            jax.tree.map(lambda a, b: a + b * den, grads_t, g)
            if grads_t is not None
            else jax.tree.map(lambda b: b * den, g)
        )
        logits_parts.append(logits)

    loss_manual = loss_t / den_t
    grads_manual = jax.tree.map(lambda x: x / den_t, grads_t)
    state_manual = state.apply_gradients(grads_manual, jnp.float32(3e-4))

    assert abs(float(metrics["loss"]) - loss_manual) < 1e-5
    _tree_allclose(state_acc.params, state_manual.params, atol=5e-4)
    logits_manual = np.empty(batch["labels"].shape, np.float32)
    for i in range(k):
        logits_manual[i::k] = np.asarray(logits_parts[i])
    np.testing.assert_allclose(
        np.asarray(metrics["probs"]),
        np.asarray(jax.nn.sigmoid(jnp.asarray(logits_manual))),
        atol=1e-5,
    )


def test_trainer_cli_pads_indivisible_grad_accum(tmp_path, monkeypatch):
    """A --batch-size that doesn't divide by grad_accum x devices is NOT
    an error: collation pads each batch to the multiple with zero-weight
    rows (the same mechanism that handles device divisibility), so the
    trainer runs a full epoch."""
    from ocrs_models_tpu.training import train_layout

    monkeypatch.chdir(tmp_path)
    train_layout.main(
        [
            "synthetic", "--max-images", "12", "--max-epochs", "1",
            "--batch-size", "6", "--grad-accum", "4", "--num-devices", "1",
            "--no-bf16",
        ]
    )
    assert (tmp_path / "text-layout-metrics.jsonl").exists()

"""Benchmark: recognition training throughput (text-line crops/sec/chip).

Runs the full CRNN training step (forward + CTC loss + backward + Adam) on
one chip with bf16 conv compute, batch 256 x 64x256 line crops — the
BASELINE.json headline metric. ``vs_baseline`` is the ratio against the
driver-set target of 5,000 crops/sec/chip (the reference publishes no
numbers of its own; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_detection():
    """Secondary benchmark (manual: `python bench.py --task det`):
    detection training step images/sec/chip at 800x608 bf16, batch 8."""
    from ocrs_models_tpu.models import DetectionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_detection_steps

    n, h, w = 8, 800, 608
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        {
            "image": rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32),
            "mask": (rng.uniform(size=(n, h, w, 1)) > 0.9).astype(np.float32),
        }
    )
    model = DetectionModel(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    step, _ = make_detection_steps(model)
    lr = jnp.float32(1e-3)
    state, m = step(state, batch, lr)
    float(m["loss"])
    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, lr)
    float(m["loss"])
    elapsed = time.perf_counter() - start
    print(
        json.dumps(
            {
                "metric": "detection_train_images_per_sec_per_chip",
                "value": round(n * iters / elapsed, 1),
                "unit": "images/sec/chip",
                "vs_baseline": None,
            }
        )
    )


def main():
    if "--task" in sys.argv and "det" in sys.argv[sys.argv.index("--task") + 1]:
        bench_detection()
        return
    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.parallel import create_mesh, replicate_tree, shard_batch
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    batch_size = 256
    width = 256
    t_len = width // 4
    max_chars = 24

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.uniform(-0.5, 0.5, (batch_size, 64, width, 1)).astype(
            np.float32
        ),
        "text": np.zeros((batch_size, 64), np.int32),
        "text_len": np.full((batch_size,), max_chars, np.int32),
        "image_width": np.full((batch_size,), width, np.int32),
        "sample_weight": np.ones((batch_size,), np.float32),
    }
    batch["text"][:, :max_chars] = rng.integers(1, 97, (batch_size, max_chars))
    del t_len

    mesh = create_mesh(num_devices=1)
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, width, 1)), grad_clip_norm=4.0
    )
    state = replicate_tree(state, mesh)
    train_step, _ = make_recognition_steps(model)
    sharded = shard_batch(batch, mesh)
    lr = jnp.float32(1e-3)

    # Warmup / compile. float() forces a device->host transfer: on this
    # image's axon PJRT plugin, block_until_ready returns early on remote
    # buffers, so a value fetch is the only reliable fence.
    state, metrics = train_step(state, sharded, lr)
    float(metrics["loss"])

    n_iters = 50
    start = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = train_step(state, sharded, lr)
    float(metrics["loss"])
    elapsed = time.perf_counter() - start

    crops_per_sec = batch_size * n_iters / elapsed
    target = 5000.0
    print(
        json.dumps(
            {
                "metric": "recognition_train_crops_per_sec_per_chip",
                "value": round(crops_per_sec, 1),
                "unit": "crops/sec/chip",
                "vs_baseline": round(crops_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

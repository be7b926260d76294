"""Gradient-accumulation measurement on the real chip.

Two claims to quantify for docs/training.md:

1. Detection memory: the 800×600 page activations bound the resident
   batch on a 16 GB v5e chip. ``--grad-accum K`` should let an effective
   batch of K× the resident optimum train in roughly K× the step time
   (same crops/sec) at ~the same peak HBM as the single-microbatch step.
2. Recognition throughput: the scan adds no overhead beyond the work
   itself — b128 ga1 vs b256 ga2 at W=1024 should match in crops/sec.

Usage (real chip):
    python tools/grad_accum_probe.py --task det  --batch 16 --accums 1 2 4
    python tools/grad_accum_probe.py --task rec  --batch 128 --accums 1 2
Results recorded in docs/training.md / docs/rec_perf.md.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def peak_hbm_mb():
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    return peak / 1e6 if peak else float("nan")


def time_step(step, state, batch, iters, extra=()):
    lr = jnp.float32(1e-3)
    for _ in range(3):
        state, m = step(state, batch, lr, *extra)
    float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, lr, *extra)
        float(m["loss"])
        best = min(best, time.perf_counter() - t)
    return best / iters, float(m["loss"])


def det_case(base_batch, ga, iters):
    from ocrs_models_tpu.models import DetectionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_detection_steps

    batch_n = base_batch * ga
    model = DetectionModel(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    h, w = 800, 608
    batch = {
        "image": jnp.asarray(
            rng.uniform(-0.5, 0.5, (batch_n, h, w, 1)).astype(np.float32)
        ),
        "mask": jnp.asarray(
            (rng.uniform(size=(batch_n, h, w, 1)) > 0.9).astype(np.float32)
        ),
    }
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    step, _ = make_detection_steps(model, grad_accum=ga)
    ms, loss = time_step(step, state, batch, iters)
    return ms, loss, batch_n, peak_hbm_mb()


def rec_case(base_batch, ga, width, iters):
    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    batch_n = base_batch * ga
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    max_chars = 24
    batch = {
        "image": rng.uniform(-0.5, 0.5, (batch_n, 64, width, 1)).astype(np.float32),
        "text": np.zeros((batch_n, 64), np.int32),
        "text_len": np.full((batch_n,), max_chars, np.int32),
        "image_width": np.full((batch_n,), width, np.int32),
        "sample_weight": np.ones((batch_n,), np.float32),
    }
    batch["text"][:, :max_chars] = rng.integers(1, 97, (batch_n, max_chars))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    step, _ = make_recognition_steps(model, grad_accum=ga)
    ms, loss = time_step(step, state, batch, iters)
    return ms, loss, batch_n, peak_hbm_mb()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["det", "rec"], default="det")
    ap.add_argument(
        "--batch", type=int, default=16,
        help="resident microbatch size (per-step batch = batch * grad_accum)",
    )
    ap.add_argument("--width", type=int, default=1024, help="rec crop width")
    ap.add_argument("--accums", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"task={args.task} backend={jax.default_backend()} "
          f"microbatch={args.batch}")
    for ga in args.accums:
        if args.task == "det":
            sec, loss, n, hbm = det_case(args.batch, ga, args.iters)
        else:
            sec, loss, n, hbm = rec_case(args.batch, ga, args.width, args.iters)
        print(
            f"  grad_accum={ga}: effective_batch={n} step={sec * 1e3:.2f} ms "
            f"({n / sec:.1f} samples/s) loss={loss:.4f} peak_hbm={hbm:.0f} MB"
        )


if __name__ == "__main__":
    main()

"""Multi-device overhead quantification (VERDICT round-3 item 5).

Two measurements:

1. On a virtual 8-device CPU mesh: the shard_map recognition train step
   vs the single-device jit at EQUAL GLOBAL BATCH — isolates the cost of
   manual SPMD (per-shard compute + explicit psum) from any real ICI.
   CPU timings do not transfer to TPU absolutely, but the *relative*
   overhead of the partitioning machinery does.
2. On one real TPU chip (run without JAX_PLATFORMS=cpu): the same step
   inside a size-1 shard_map (``force_shard_map=True``) vs plain jit —
   proves the Pallas-GRU-inside-shard_map path executes on hardware and
   bounds its dispatch overhead.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/multidev_overhead.py --devices 8
    python tools/multidev_overhead.py --devices 1    # real chip
Results recorded in docs/rec_perf.md.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_step(step, state, batch, iters):
    lr = jnp.float32(1e-3)
    for _ in range(3):
        state, m = step(state, batch, lr)
    float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, lr)
        float(m["loss"])
        best = min(best, time.perf_counter() - t)
    return best / iters, float(m["loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--batch", type=int, default=64, help="global batch")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--grad-accum", type=int, default=1,
        help="microbatch scan inside both steps (proves the "
        "scan-inside-shard_map composite executes on the backend)",
    )
    args = ap.parse_args()

    n_dev = args.devices or len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.parallel import create_mesh, replicate_tree, shard_batch
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1, dtype=dtype)

    rng = np.random.default_rng(0)
    n, w = args.batch, args.width
    batch = {
        "image": rng.uniform(-0.5, 0.5, (n, 64, w, 1)).astype(np.float32),
        "text": np.zeros((n, 64), np.int32),
        "text_len": np.full((n,), 16, np.int32),
        "image_width": np.full((n,), w, np.int32),
        "sample_weight": np.ones((n,), np.float32),
    }
    batch["text"][:, :16] = rng.integers(1, 97, (n, 16))

    def fresh_state():
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)),
            grad_clip_norm=4.0,
        )

    ga = args.grad_accum
    step_jit, _ = make_recognition_steps(model, grad_accum=ga)
    t1, loss1 = time_step(step_jit, fresh_state(), jax.device_put(batch), args.iters)
    print(
        f"single-device jit      (global batch {n}, ga={ga}): {t1*1e3:8.2f} ms/step  "
        f"loss={loss1:.4f}",
        flush=True,
    )

    mesh = create_mesh(num_devices=n_dev)
    step_sm, _ = make_recognition_steps(
        model, mesh=mesh, force_shard_map=True, grad_accum=ga
    )
    t2, loss2 = time_step(
        step_sm,
        replicate_tree(fresh_state(), mesh),
        shard_batch(batch, mesh),
        args.iters,
    )
    print(
        f"{n_dev}-way shard_map       (global batch {n}): {t2*1e3:8.2f} ms/step  "
        f"loss={loss2:.4f}",
        flush=True,
    )
    print(
        f"shard_map vs jit: {100 * (t2 / t1 - 1):+.1f}%  "
        f"loss delta {abs(loss2 - loss1):.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()

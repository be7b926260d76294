"""Lean detection-step probe: step time + XLA memory analysis per batch.

Two compiles per batch size (train step, fwd-only) — sized for this rig's
30-150 s remote compiles. Unbuffered prints so progress is visible.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(x))


def main():
    batches = [int(b) for b in (sys.argv[1] if len(sys.argv) > 1 else "4,8").split(",")]
    h, w = 800, 608

    from ocrs_models_tpu.models import DetectionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_detection_steps

    model = DetectionModel(dtype=jnp.bfloat16)
    state0 = create_train_state(model, jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    step, _ = make_detection_steps(model)
    lr = jnp.float32(1e-3)
    rng = np.random.default_rng(0)

    for n in batches:
        batch = {
            "image": jnp.asarray(
                rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32)
            ),
            "mask": jnp.asarray(
                (rng.uniform(size=(n, h, w, 1)) > 0.9).astype(np.float32)
            ),
        }
        t0 = time.perf_counter()
        lowered = step.lower(state0, batch, lr)
        compiled = lowered.compile()
        print(f"b={n}: compiled in {time.perf_counter()-t0:.0f}s", flush=True)
        try:
            m = compiled.memory_analysis()
            print(
                f"b={n}: temp={m.temp_size_in_bytes/1e6:.0f}MB "
                f"args={m.argument_size_in_bytes/1e6:.0f}MB "
                f"out={m.output_size_in_bytes/1e6:.0f}MB "
                f"alias={m.alias_size_in_bytes/1e6:.0f}MB",
                flush=True,
            )
        except Exception as e:
            print(f"b={n}: memory_analysis failed: {e}", flush=True)

        st = jax.tree.map(jnp.copy, state0)
        for _ in range(3):
            st, mtr = step(st, batch, lr)
        _fetch(mtr["loss"])
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            st, mtr = step(st, batch, lr)
        _fetch(mtr["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(
            f"b={n}: step {dt*1e3:.1f} ms -> {n/dt:.1f} img/s", flush=True
        )


if __name__ == "__main__":
    main()

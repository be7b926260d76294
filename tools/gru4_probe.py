"""A/B probe: GRU v1 (stack/reverse caller layout) vs v4 (zero-relayout).

Measures the full recognition train step at the wide bucket (N=128,
W=1024) with each backend, plus the isolated recurrence cost. The v4
hypothesis: the caller-side px stack/reverse/transpose passes and their
VJPs cost ~1.5-2 ms/step; index-map relayout makes them free.

Run:  nohup python tools/gru4_probe.py > /tmp/gru4_probe.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jnp.sum(x)))


def probe_step(n, width, backend):
    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 64, width, 1)).astype(np.float32))
    text = np.zeros((n, 64), np.int32)
    text[:, :48] = rng.integers(1, 97, (n, 48))
    batch = {
        "image": img,
        "text": jnp.asarray(text),
        "text_len": jnp.full((n,), 48, jnp.int32),
        "image_width": jnp.full((n,), width, jnp.int32),
        "sample_weight": jnp.ones((n,), jnp.float32),
    }
    model = RecognitionModel(
        n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16, gru_backend=backend
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    train_step, _ = make_recognition_steps(model)
    lr = jnp.float32(1e-3)
    st = jax.tree.map(jnp.copy, state)
    for _ in range(3):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"[step N={n} W={width}] {backend}: {dt*1e3:7.2f} ms  "
          f"({n/dt:.0f} crops/s)", flush=True)
    return float(m["loss"])


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    l1 = probe_step(128, 1024, "scan")
    l4 = probe_step(128, 1024, "pallas4")
    print(f"loss agreement: v1 {l1:.6f}  v4 {l4:.6f}", flush=True)

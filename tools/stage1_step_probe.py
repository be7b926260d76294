"""Full wide-bucket train step with the fused stage-1 kernel (+ GRU v4).

Run:  nohup python tools/stage1_step_probe.py > /tmp/stage1_step_probe.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jnp.sum(x)))


def probe_step(n, width, gru_backend, conv_backend):
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
        n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16,
        gru_backend=gru_backend, conv_backend=conv_backend,
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
    print(f"[step N={n} W={width}] gru={gru_backend} conv={conv_backend}: "
          f"{dt*1e3:7.2f} ms  ({n/dt:.0f} crops/s)  loss={float(m['loss']):.4f}",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_step(128, 1024, "scan", "fused")
    probe_step(128, 1024, "pallas4", "fused")
    probe_step(256, 256, "pallas4", "fused")   # headline shape
    probe_step(128, 512, "pallas4", "fused")   # mid bucket

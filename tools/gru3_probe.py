"""A/B probe: GRU kernel v1 (one-step grid) vs v3 (time-chunked) on TPU.

Measures (wide bucket, T=257, H=256):
  1. isolated single-layer recurrence fwd and fwd+bwd at N=128
  2. full recognition train step at batch 128 with each backend
  3. v3 at batch 160/192 (VMEM headroom retry)

Run:  nohup python tools/gru3_probe.py > /tmp/gru3_probe.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jnp.sum(x)))


def timeit(fn, *args, iters=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _fetch(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def probe_isolated(n=128, t_steps=257, h=256):
    from ocrs_models_tpu.ops.pallas.gru_kernel import gru_recurrence
    from ocrs_models_tpu.ops.pallas.gru_kernel3 import gru_recurrence3

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((t_steps, 2, n, 3 * h)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.standard_normal((2, h, 3 * h)).astype(np.float32) * 0.05)
    b_hh = jnp.zeros((2, 3 * h), jnp.float32)

    for name, fn in [("v1", gru_recurrence), ("v3", gru_recurrence3)]:
        fwd = jax.jit(lambda px, w, b, fn=fn: fn(px, w, b, jnp.bfloat16, False))
        t = timeit(fwd, px, w_hh, b_hh)
        print(f"[isolated N={n}] {name} fwd:     {t*1e3:7.2f} ms", flush=True)
        grad = jax.jit(jax.grad(
            lambda px, w, b, fn=fn: jnp.sum(fn(px, w, b, jnp.bfloat16, False)),
            argnums=(0, 1, 2),
        ))
        tg = timeit(grad, px, w_hh, b_hh)
        print(f"[isolated N={n}] {name} fwd+bwd: {tg*1e3:7.2f} ms", flush=True)

    # sanity: numerics v3 vs v1 on-device
    y1 = jax.jit(lambda px, w, b: gru_recurrence(px, w, b, jnp.bfloat16, False))(px, w_hh, b_hh)
    y3 = jax.jit(lambda px, w, b: gru_recurrence3(px, w, b, jnp.bfloat16, False))(px, w_hh, b_hh)
    d = float(jnp.max(jnp.abs(y1 - y3)))
    print(f"[isolated] max |v1-v3| = {d:.3e}", flush=True)


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
    print(
        f"[step N={n} W={width}] {backend}: {dt*1e3:7.2f} ms  "
        f"({n/dt:.0f} crops/s)",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_isolated(n=128)
    for backend in ("pallas", "pallas3"):
        probe_step(128, 1024, backend)
    for n in (160, 192):
        probe_step(n, 1024, "pallas3")

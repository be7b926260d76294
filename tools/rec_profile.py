"""Recognition step component profile at the wide bucket (W=1024, T=257).

Splits the train step into: conv stack forward, GRU recurrence (Pallas),
CTC loss, and full grad step, each timed separately on the TPU.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    # Fetch a scalar, not the tensor — device_get of a large array through
    # the axon tunnel would dominate the measurement.
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    t_steps = width // 4 + 1

    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.ops.ctc import ctc_loss_forward
    from ocrs_models_tpu.ops.pallas.gru_kernel4 import gru_recurrence_reference
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

    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )

    # full fwd
    fwd = jax.jit(lambda p, bs, x: model.apply({"params": p, "batch_stats": bs}, x))
    t = timeit(fwd, state.params, state.batch_stats, img)
    print(f"fwd (conv+gru+head): {t*1e3:7.2f} ms  ({n/t:.0f} crops/s)", flush=True)

    # GRU recurrence alone (both layers' shape): [T, 2, N, 3H]
    px = jnp.asarray(
        rng.standard_normal((t_steps, 2, n, 768)).astype(np.float32) * 0.1
    )
    w_hh = jnp.asarray(rng.standard_normal((2, 256, 768)).astype(np.float32) * 0.05)
    b_hh = jnp.zeros((2, 768), jnp.float32)
    gru = jax.jit(lambda px, w, b: gru_recurrence_reference(px, w, b))
    t_gru = timeit(gru, px, w_hh, b_hh)
    print(f"gru scan fwd (1 layer):   {t_gru*1e3:7.2f} ms", flush=True)

    gru_grad = jax.jit(
        jax.grad(lambda px, w, b: jnp.sum(gru_recurrence_reference(px, w, b)))
    )
    t_gru_g = timeit(gru_grad, px, w_hh, b_hh)
    print(f"gru fwd+bwd (1 layer): {t_gru_g*1e3:6.2f} ms", flush=True)

    # CTC loss alone
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((n, t_steps, 97)).astype(np.float32))
    )
    ctc = jax.jit(
        lambda lp: jnp.sum(
            ctc_loss_forward(
                lp, batch["text"], batch["image_width"] // 4, batch["text_len"]
            )
        )
    )
    t_ctc = timeit(ctc, log_probs)
    print(f"ctc fwd:             {t_ctc*1e3:7.2f} ms", flush=True)
    ctc_g = jax.jit(jax.grad(lambda lp: jnp.sum(
        ctc_loss_forward(lp, batch["text"], batch["image_width"] // 4, batch["text_len"])
    )))
    t_ctc_g = timeit(ctc_g, log_probs)
    print(f"ctc fwd+bwd:         {t_ctc_g*1e3:7.2f} ms", flush=True)

    # full train step
    train_step, _ = make_recognition_steps(model)
    lr = jnp.float32(1e-3)
    st = jax.tree.map(jnp.copy, state)
    for _ in range(3):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    t_full = (time.perf_counter() - t0) / iters
    print(f"full train step:     {t_full*1e3:7.2f} ms  ({n/t_full:.0f} crops/s)", flush=True)


if __name__ == "__main__":
    main()

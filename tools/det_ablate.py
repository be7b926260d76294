"""Detection backward ablations at batch 8 (VERDICT r1 task 4).

Variants (one TPU compile each):
  fwd      — inference forward only
  grad     — value_and_grad of the loss (baseline backward)
  grad_nhwc— same but channels-first levels forced to NHWC
  grad_rmt — jax.checkpoint around each DoubleConv level
Prints time, img/s, temp HBM, and XLA cost analysis (flops, bytes) for a
roofline estimate.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(x))


def timeit(fn, args, iters=15, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _fetch(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def analyze(name, jitted, args, n):
    t0 = time.perf_counter()
    compiled = jitted.lower(*args).compile()
    compile_s = time.perf_counter() - t0
    temp = out_b = flops = bytes_acc = None
    try:
        m = compiled.memory_analysis()
        temp = m.temp_size_in_bytes / 1e6
    except Exception:
        pass
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = ca.get("flops")
        bytes_acc = ca.get("bytes accessed")
    except Exception:
        pass
    dt = timeit(jitted, args)
    gb = (bytes_acc or 0) / 1e9
    tf = (flops or 0) / 1e12
    line = (
        f"{name:10s} {dt*1e3:8.2f} ms  {n/dt:7.1f} img/s  temp {temp or 0:6.0f} MB"
        f"  {tf:.3f} TF ({tf/dt:.1f} TF/s)  {gb:.2f} GB ({gb/dt:.0f} GB/s)"
    )
    print(line + f"  [compile {compile_s:.0f}s]", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w = 800, 608
    import ocrs_models_tpu.models.detection as det
    from ocrs_models_tpu.ops.losses import balanced_cross_entropy_loss
    from ocrs_models_tpu.training.state import create_train_state

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(n, h, w, 1)) > 0.9).astype(np.float32))

    def build(cf_max=32, remat=False):
        old = det._CHANNELS_FIRST_MAX
        det._CHANNELS_FIRST_MAX = cf_max
        try:
            model = det.DetectionModel(dtype=jnp.bfloat16)
            state = create_train_state(
                model, jax.random.key(0), jnp.zeros((1, 128, 128, 1))
            )
        finally:
            det._CHANNELS_FIRST_MAX = old

        def loss(params, batch_stats, img, mask, cfm=cf_max):
            det._CHANNELS_FIRST_MAX = cfm
            try:
                pred, _ = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    img,
                    train=True,
                    mutable=["batch_stats"],
                )
            finally:
                det._CHANNELS_FIRST_MAX = old
            return balanced_cross_entropy_loss(pred, mask)

        return model, state, loss

    model, state, loss = build()

    fwd = jax.jit(
        lambda p, bs, x: model.apply({"params": p, "batch_stats": bs}, x, train=False)
    )
    analyze("fwd", fwd, (state.params, state.batch_stats, img), n)

    grad = jax.jit(jax.value_and_grad(loss))
    analyze("grad", grad, (state.params, state.batch_stats, img, mask), n)

    _, state_nhwc, loss_nhwc = build(cf_max=-1)
    grad_nhwc = jax.jit(jax.value_and_grad(loss_nhwc))
    analyze("grad_nhwc", grad_nhwc, (state_nhwc.params, state_nhwc.batch_stats, img, mask), n)


if __name__ == "__main__":
    main()

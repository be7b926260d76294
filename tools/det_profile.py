"""Detection-step ablation profiler (VERDICT r1 task 4).

The rig has no xplane trace viewer, so this uses ablation timing: each
stage of the detection train step is timed separately across batch sizes,
plus XLA's compiled memory analysis, to locate the batch-8 throughput
regression and produce a roofline estimate.

Usage: python tools/det_profile.py [--batches 1,2,4,8] [--stage all]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # fence with a value fetch (axon remote buffers return early)
    _fetch(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - start) / iters


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.sum(leaf)))


def mem_analysis(jitted, *args):
    try:
        c = jitted.lower(*args).compile()
        m = c.memory_analysis()
        return {
            "peak_hbm_mb": getattr(m, "temp_size_in_bytes", 0) / 1e6,
            "argument_mb": getattr(m, "argument_size_in_bytes", 0) / 1e6,
            "output_mb": getattr(m, "output_size_in_bytes", 0) / 1e6,
        }
    except Exception as e:  # pragma: no cover
        return {"error": str(e)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--hw", default="800x608")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))

    from ocrs_models_tpu.models import DetectionModel
    from ocrs_models_tpu.ops.losses import balanced_cross_entropy_loss
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_detection_steps

    model = DetectionModel(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    step, _ = make_detection_steps(model)
    lr = jnp.float32(1e-3)

    fwd = jax.jit(
        lambda p, bs, x: model.apply(
            {"params": p, "batch_stats": bs}, x, train=False
        )
    )

    def fwd_train(p, bs, x):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True, mutable=["batch_stats"]
        )
        return out

    fwd_train = jax.jit(fwd_train)

    def loss_only(p, bs, batch):
        pred, _ = model.apply(
            {"params": p, "batch_stats": bs},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
        )
        return balanced_cross_entropy_loss(pred, batch["mask"])

    grad_noopt = jax.jit(jax.value_and_grad(loss_only), static_argnums=())

    rng = np.random.default_rng(0)
    print(f"shape {h}x{w}")
    for n in (int(b) for b in args.batches.split(",")):
        img = jnp.asarray(
            rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32)
        )
        mask = jnp.asarray((rng.uniform(size=(n, h, w, 1)) > 0.9).astype(np.float32))
        batch = {"image": img, "mask": mask}

        t_fwd = _time(fwd, state.params, state.batch_stats, img)
        t_fwdt = _time(fwd_train, state.params, state.batch_stats, img)
        t_grad = _time(grad_noopt, state.params, state.batch_stats, batch)

        # full step: the step donates its state argument, so time a copy
        st = jax.tree.map(jnp.copy, state)
        def full(st, batch):
            new_st, m = step(st, batch, lr)
            return new_st, m["loss"]
        for _ in range(2):
            st, _l = full(st, batch)
        _fetch(_l)
        start = time.perf_counter()
        iters = 10
        for _ in range(iters):
            st, _l = full(st, batch)
        _fetch(_l)
        t_step = (time.perf_counter() - start) / iters

        mem = mem_analysis(grad_noopt, state.params, state.batch_stats, batch)
        print(
            f"b={n:3d} fwd {t_fwd*1e3:7.2f} ms ({n/t_fwd:6.1f}/s) | "
            f"fwd_train {t_fwdt*1e3:7.2f} | grad {t_grad*1e3:7.2f} "
            f"({n/t_grad:6.1f}/s) | step {t_step*1e3:7.2f} ({n/t_step:6.1f}/s) | "
            f"temp {mem.get('peak_hbm_mb', '?'):.0f} MB"
        )


if __name__ == "__main__":
    main()

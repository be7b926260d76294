"""Stage-1/2 micro-ablation round 2: isolate the backward pathology.

Round-1 probe (rec_stage_probe.py): NHWC lax.conv is the best whole-stage
formulation (14.6 ms fwd+bwd), channels-first shifts lose 3x. This probe
splits stage 1+2 into components and tests the slice-max pool hypothesis:
`reduce_window` max-pool backward lowers to select_and_scatter (slow,
windowed); `jnp.maximum` over 4 strided slices is algebraically identical
with a purely elementwise VJP.

Run:  nohup python tools/rec_stage_probe2.py > /tmp/rec_stage_probe2.log 2>&1 &
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


DT = jnp.bfloat16


def pool_rw(x, wh=2, ww=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, wh, ww, 1), (1, wh, ww, 1), "VALID")


def pool_slice(x, wh=2, ww=2):
    n, h, w, c = x.shape
    parts = [
        x[:, dy::wh, dx::ww, :][:, : h // wh, : w // ww]
        for dy in range(wh)
        for dx in range(ww)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = jnp.maximum(out, p)
    return out


def conv_nhwc(x, w, pads=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_train(x, gamma, beta):
    xf = x.astype(jnp.float32)
    red = (0, 1, 2)
    mean = jnp.mean(xf, axis=red)
    var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + 1e-5) * gamma
    return x * inv.astype(x.dtype) + (beta - mean * inv).astype(x.dtype)


def main(n=128, width=1024):
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 64, width, 1)).astype(np.float32))
    xs1 = jnp.asarray(  # stage-1 conv output scale tensor [N,64,W,32] bf16
        rng.uniform(-1, 1, (n, 64, width, 32)).astype(np.float32)).astype(DT)
    xs2 = jnp.asarray(  # stage-2 input [N,32,W/2,32]
        rng.uniform(-1, 1, (n, 32, width // 2, 32)).astype(np.float32)).astype(DT)
    w0 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, 32)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 64)).astype(np.float32))
    g4 = jnp.ones((64,), jnp.float32)
    b4 = jnp.zeros((64,), jnp.float32)

    def run(name, fn, *args):
        try:
            f = jax.jit(fn)
            t_f = timeit(f, *args)
            g = jax.jit(jax.grad(lambda *a: fn(*a)))
            t_g = timeit(g, *args)
            print(f"{name:34s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_g*1e3:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}", flush=True)

    # --- micro: pool alone on the big stage-1 tensor ---
    run("pool2x2 reduce_window", lambda x: jnp.mean(pool_rw(x).astype(jnp.float32)), xs1)
    run("pool2x2 slice-max", lambda x: jnp.mean(pool_slice(x).astype(jnp.float32)), xs1)

    # --- micro: conv0 alone ---
    run("conv0 nhwc", lambda x: jnp.mean(conv_nhwc(x.astype(DT), w0).astype(jnp.float32)), x1)
    # --- micro: conv3 alone ---
    run("conv3 nhwc", lambda x: jnp.mean(conv_nhwc(x, w3).astype(jnp.float32)), xs2)

    # --- micro: relu+pool fused pair ---
    run("relu+pool rw", lambda x: jnp.mean(pool_rw(jax.nn.relu(x)).astype(jnp.float32)), xs1)
    run("relu+pool slice", lambda x: jnp.mean(pool_slice(jax.nn.relu(x)).astype(jnp.float32)), xs1)

    # --- full stage 1+2 with slice-max pools ---
    def stages_slice(x):
        y = conv_nhwc(x.astype(DT), w0)
        y = pool_slice(jax.nn.relu(y))
        y = conv_nhwc(y, w3)
        y = pool_slice(jax.nn.relu(_bn_train(y, g4, b4)))
        return jnp.mean(y.astype(jnp.float32))

    def stages_rw(x):
        y = conv_nhwc(x.astype(DT), w0)
        y = pool_rw(jax.nn.relu(y))
        y = conv_nhwc(y, w3)
        y = pool_rw(jax.nn.relu(_bn_train(y, g4, b4)))
        return jnp.mean(y.astype(jnp.float32))

    run("stage1+2 rw-pool (baseline)", stages_rw, x1)
    run("stage1+2 slice-pool", stages_slice, x1)

    # value agreement
    va = float(jax.jit(stages_rw)(x1))
    vb = float(jax.jit(stages_slice)(x1))
    print(f"value agreement: rw {va:.6f}  slice {vb:.6f}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

"""Stage-2 margin probe: W-minor conv layouts + pool/BN pass costs.

Stage 2 (conv 32->64 @ [128,32,512] + BN + relu + pool) costs ~5.8 ms of
the 25.6 ms wide step. The conv itself is near-roofline (3.5 ms isolated
fwd+bwd incl dispatch); the rest is elementwise/pool passes over
C=64-minor tensors (half the lanes wasted). Questions:

  1. can lax.conv consume the stage-1 kernel's native [N, H, C, W] layout
     ("NHCW") and/or emit it, at no cost vs NHWC? (If yes, the CF->NHWC
     transposes around stage 1 disappear and a W-minor pool kernel
     becomes plumbable.)
  2. what do stage-2's BN+relu+pool passes cost in NHWC vs a W-minor
     layout under XLA?

Run:  nohup python tools/rec_stage2_probe.py > /tmp/rec_stage2_probe.log 2>&1 &
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


def main():
    rng = np.random.default_rng(0)
    n, h, w, c, o = 128, 32, 512, 32, 64
    x_nhwc = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
    x_nhcw = jnp.transpose(x_nhwc, (0, 1, 3, 2))
    wk = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, o)).astype(np.float32)).astype(jnp.bfloat16)

    def run(name, fn, *args):
        try:
            f = jax.jit(fn)
            t_f = timeit(f, *args)
            g = jax.jit(jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32))))
            t_g = timeit(g, *args)
            print(f"{name:34s} fwd {t_f*1e3:6.2f} ms  fwd+bwd {t_g*1e3:6.2f} ms", flush=True)
        except Exception as e:  # noqa
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}", flush=True)

    # 1. conv layout variants
    run("conv NHWC->NHWC", lambda x: jax.lax.conv_general_dilated(
        x, wk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x_nhwc)
    run("conv NHCW->NHCW", lambda x: jax.lax.conv_general_dilated(
        x, wk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHCW", "HWIO", "NHCW")), x_nhcw)
    run("conv NHWC->NHCW", lambda x: jax.lax.conv_general_dilated(
        x, wk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHCW")), x_nhwc)

    # 2. BN+relu+pool pass costs on the stage-2 output tensor
    y_nhwc = jnp.asarray(rng.uniform(-1, 1, (n, h, w, o)).astype(np.float32)).astype(jnp.bfloat16)
    y_nhcw = jnp.transpose(y_nhwc, (0, 1, 3, 2))
    gamma = jnp.ones((o,), jnp.float32)
    beta = jnp.zeros((o,), jnp.float32)

    def bn_relu_pool_nhwc(y):
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
        inv = jax.lax.rsqrt(var + 1e-5) * gamma
        z = jax.nn.relu(y * inv.astype(y.dtype) + (beta - mean * inv).astype(y.dtype))
        return jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def bn_relu_pool_nhcw(y):  # [N, H, C, W]
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 3))
        var = jnp.mean(jnp.square(yf), axis=(0, 1, 3)) - jnp.square(mean)
        inv = jax.lax.rsqrt(var + 1e-5) * gamma
        z = jax.nn.relu(
            y * inv.astype(y.dtype)[None, None, :, None]
            + (beta - mean * inv).astype(y.dtype)[None, None, :, None])
        return jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 1, 2), (1, 2, 1, 2), "VALID")

    run("bn+relu+pool NHWC (C minor)", bn_relu_pool_nhwc, y_nhwc)
    run("bn+relu+pool NHCW (W minor)", bn_relu_pool_nhcw, y_nhcw)

    # 3. the full stage-2 block both ways
    def stage2_nhwc(x):
        y = jax.lax.conv_general_dilated(
            x, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return bn_relu_pool_nhwc(y)

    def stage2_nhcw(x):
        y = jax.lax.conv_general_dilated(
            x, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHCW", "HWIO", "NHCW"))
        return bn_relu_pool_nhcw(y)

    run("stage2 NHWC end-to-end", stage2_nhwc, x_nhwc)
    run("stage2 NHCW end-to-end", stage2_nhcw, x_nhcw)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

"""Stage-2 phase-conv probe: two stride-2 convs vs one stride-1 conv.

If conv3 emits the pool's two W phases directly (same total FLOPs), the
bnpool kernel needs no phase extraction at all — pure elementwise.

Run:  nohup python tools/bnpool_phaseconv_probe.py > /tmp/bnpool_phaseconv.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, iters=30, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _fetch(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run(name, fn, *args):
    try:
        f = jax.jit(fn)
        t = timeit(f, *args)
        g = jax.jit(
            jax.grad(
                lambda *a: sum(
                    jnp.sum(o.astype(jnp.float32) ** 2)
                    for o in jax.tree.leaves(fn(*a))
                )
            )
        )
        tg = timeit(g, *args)
        print(f"{name:40s} fwd {t*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms",
              flush=True)
    except Exception as e:  # noqa
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    n, h, c_in, w = 128, 32, 32, 512
    x = jnp.asarray(
        rng.normal(0, 1, (n, h, c_in, w)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, c_in, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dn = ("NHCW", "HWIO", "NHCW")

    def conv1(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )

    def conv_phases(x, k):
        ye = jax.lax.conv_general_dilated(
            x, k, (1, 2), ((1, 1), (1, 1)), dimension_numbers=dn
        )
        yo = jax.lax.conv_general_dilated(
            x, k, (1, 2), ((1, 1), (0, 2)), dimension_numbers=dn
        )
        return ye, yo

    # sanity: phases interleave to conv1
    y1 = conv1(x, k)
    ye, yo = conv_phases(x, k)
    d_e = jnp.abs(
        (y1[..., 0::2] - ye).astype(jnp.float32)
    ).max()
    d_o = jnp.abs(
        (y1[..., 1::2] - yo).astype(jnp.float32)
    ).max()
    print("phase equality: even", float(d_e), "odd", float(d_o), flush=True)

    run("stride-1 conv NHCW", conv1, x, k)
    run("two stride-2 phase convs NHCW", conv_phases, x, k)

    # also NHWC for reference
    x_hwc = jnp.transpose(x, (0, 1, 3, 2))
    dn2 = ("NHWC", "HWIO", "NHWC")
    run("stride-1 conv NHWC", lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn2), x_hwc, k)
    run("two stride-2 phase convs NHWC", lambda a, b: (
        jax.lax.conv_general_dilated(
            a, b, (1, 2), ((1, 1), (1, 1)), dimension_numbers=dn2),
        jax.lax.conv_general_dilated(
            a, b, (1, 2), ((1, 1), (0, 2)), dimension_numbers=dn2),
    ), x_hwc, k)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

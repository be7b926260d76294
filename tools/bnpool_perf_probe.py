"""Where does the bnpool fused forward's 4.55 ms go?

Separates: (a) the [N,32,512,64] -> [N,16,2,256,128] reshape view
(suspected XLA relayout copy), (b) the kernel itself on a pre-viewed
input, (c) an XLA-only relayout round trip.

Run:  nohup python tools/bnpool_perf_probe.py > /tmp/bnpool_perf.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ocrs_models_tpu.ops.pallas import bnpool_kernel as bk


def _fetch(x):
    np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, iters=20, warm=3):
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


def main():
    rng = np.random.default_rng(0)
    n, h, w, c = 128, 32, 512, 64
    hp, rows, l = h // 2, w // 2, 2 * c
    y = jnp.asarray(
        rng.normal(0, 1, (n, h, w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    yv = jnp.asarray(np.asarray(y.astype(jnp.float32)).reshape(
        n, hp, 2, rows, l
    )).astype(jnp.bfloat16)

    def call_kernel(inp):
        return pl.pallas_call(
            functools.partial(bk._fwd_kernel, hp=hp, c=c),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, hp, 2, rows, l), lambda i: (i, 0, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, hp, rows, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, hp, rows, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, hp, rows, c), inp.dtype),
                jax.ShapeDtypeStruct((n, hp, rows, c), inp.dtype),
                jax.ShapeDtypeStruct((n, 1, l), jnp.float32),
                jax.ShapeDtypeStruct((n, 1, l), jnp.float32),
            ],
        )(inp)

    kern_pre = jax.jit(call_kernel)
    kern_view = jax.jit(lambda t: call_kernel(t.reshape(n, hp, 2, rows, l)))
    relayout = jax.jit(
        lambda t: t.reshape(n, hp, 2, rows, l) * jnp.bfloat16(1.0)
    )

    print("compiling ...", flush=True)
    print(f"kernel on pre-viewed input  {timeit(kern_pre, yv)*1e3:6.2f} ms", flush=True)
    print(f"kernel + in-jit view        {timeit(kern_view, y)*1e3:6.2f} ms", flush=True)
    print(f"XLA view+scale round trip   {timeit(relayout, y)*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

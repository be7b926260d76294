"""bnpool fwd kernel variants: where do the 5.4 ms go?

Variants (all on the native-NHWC selection-dot design, wide shape):
  A. pooling only, no sums (s1/s2 would come from an XLA pass)
  B. pooling + sums via phase-sums (reduce e0+o0+e1+o1, not y)
  C. full current kernel (sums of y in-kernel)
  D. pooling only, grid (n,) with the h-loop inside (128 big steps)
  E. XLA-side sums pass alone (what A would add)

Run:  nohup python tools/bnpool_variants.py > /tmp/bnpool_variants.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ocrs_models_tpu.ops.pallas.bnpool_kernel import (
    _dot,
    _fwd_kernel,
    _selection,
)

_VM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


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


def kA(y_ref, se_ref, so_ref, pmax_ref, pmin_ref):
    y0 = y_ref[0, 0]
    y1 = y_ref[0, 1]
    se, so = se_ref[...], so_ref[...]
    e0, o0, e1, o1 = _dot(se, y0), _dot(so, y0), _dot(se, y1), _dot(so, y1)
    pmax_ref[0, 0] = jnp.maximum(
        jnp.maximum(e0, o0), jnp.maximum(e1, o1)
    ).astype(pmax_ref.dtype)
    pmin_ref[0, 0] = jnp.minimum(
        jnp.minimum(e0, o0), jnp.minimum(e1, o1)
    ).astype(pmin_ref.dtype)


def kB(y_ref, se_ref, so_ref, pmax_ref, pmin_ref, s1_ref, s2_ref):
    y0 = y_ref[0, 0]
    y1 = y_ref[0, 1]
    se, so = se_ref[...], so_ref[...]
    e0, o0, e1, o1 = _dot(se, y0), _dot(so, y0), _dot(se, y1), _dot(so, y1)
    pmax_ref[0, 0] = jnp.maximum(
        jnp.maximum(e0, o0), jnp.maximum(e1, o1)
    ).astype(pmax_ref.dtype)
    pmin_ref[0, 0] = jnp.minimum(
        jnp.minimum(e0, o0), jnp.minimum(e1, o1)
    ).astype(pmin_ref.dtype)
    t = (e0 + o0) + (e1 + o1)
    q = (e0 * e0 + o0 * o0) + (e1 * e1 + o1 * o1)
    s1_ref[0, 0] = jnp.sum(t, axis=0, keepdims=True)
    s2_ref[0, 0] = jnp.sum(q, axis=0, keepdims=True)


def kD(y_ref, se_ref, so_ref, pmax_ref, pmin_ref, *, hp):
    se, so = se_ref[...], so_ref[...]
    for h in range(hp):
        y0 = y_ref[0, 2 * h]
        y1 = y_ref[0, 2 * h + 1]
        e0, o0, e1, o1 = _dot(se, y0), _dot(so, y0), _dot(se, y1), _dot(so, y1)
        pmax_ref[0, h] = jnp.maximum(
            jnp.maximum(e0, o0), jnp.maximum(e1, o1)
        ).astype(pmax_ref.dtype)
        pmin_ref[0, h] = jnp.minimum(
            jnp.minimum(e0, o0), jnp.minimum(e1, o1)
        ).astype(pmin_ref.dtype)


def main():
    rng = np.random.default_rng(0)
    n, h, w, c = 128, 32, 512, 64
    hp, wp = h // 2, w // 2
    y = jnp.asarray(
        rng.normal(0, 1, (n, h, w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    se, so = _selection(w, y.dtype)

    hpair = pl.BlockSpec((1, 2, w, c), lambda i, j: (i, j, 0, 0))
    pooled = pl.BlockSpec((1, 1, wp, c), lambda i, j: (i, j, 0, 0))
    sel = [
        pl.BlockSpec((wp, w), lambda i, j: (0, 0)),
        pl.BlockSpec((wp, w), lambda i, j: (0, 0)),
    ]
    pooled_shape = [
        jax.ShapeDtypeStruct((n, hp, wp, c), y.dtype),
        jax.ShapeDtypeStruct((n, hp, wp, c), y.dtype),
    ]
    sums_spec = [
        pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
    ]
    sums_shape = [
        jax.ShapeDtypeStruct((n, hp, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n, hp, 1, c), jnp.float32),
    ]

    fA = jax.jit(
        lambda t: pl.pallas_call(
            kA, grid=(n, hp), in_specs=[hpair] + sel,
            out_specs=pooled_shape and [pooled, pooled],
            out_shape=pooled_shape, compiler_params=_VM,
        )(t, se, so)
    )
    fB = jax.jit(
        lambda t: pl.pallas_call(
            kB, grid=(n, hp), in_specs=[hpair] + sel,
            out_specs=[pooled, pooled] + sums_spec,
            out_shape=pooled_shape + sums_shape, compiler_params=_VM,
        )(t, se, so)
    )
    fC = jax.jit(
        lambda t: pl.pallas_call(
            _fwd_kernel, grid=(n, hp), in_specs=[hpair] + sel,
            out_specs=[pooled, pooled] + sums_spec,
            out_shape=pooled_shape + sums_shape, compiler_params=_VM,
        )(t, se, so)
    )
    nblock = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    pooledD = pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0))
    fD = jax.jit(
        lambda t: pl.pallas_call(
            functools.partial(kD, hp=hp), grid=(n,),
            in_specs=[
                nblock,
                pl.BlockSpec((wp, w), lambda i: (0, 0)),
                pl.BlockSpec((wp, w), lambda i: (0, 0)),
            ],
            out_specs=[pooledD, pooledD],
            out_shape=[
                jax.ShapeDtypeStruct((n, hp, wp, c), y.dtype),
                jax.ShapeDtypeStruct((n, hp, wp, c), y.dtype),
            ],
            compiler_params=_VM,
        )(t, se, so)
    )

    def fE(t):
        tf = t.astype(jnp.float32)
        return jnp.sum(tf, axis=(0, 1, 2)), jnp.sum(tf * tf, axis=(0, 1, 2))

    fE = jax.jit(fE)

    for name, f in (("A pool-only (n,hp)", fA), ("B pool+phase-sums", fB),
                    ("C pool+y-sums", fC), ("D pool-only (n,) loop", fD),
                    ("E XLA sums pass", fE)):
        try:
            t = timeit(f, y)
            print(f"{name:24s} {t*1e3:6.2f} ms", flush=True)
        except Exception as e:  # noqa
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

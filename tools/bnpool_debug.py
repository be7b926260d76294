"""Isolate which term of the bnpool backward is wrong on TPU.

Small shapes, f32, component losses: pmax-only, pmin-only, s1-only,
s2-only, plus micro-probes of pltpu.roll and sublane-offset slicing.

Run:  nohup python tools/bnpool_debug.py > /tmp/bnpool_debug.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ocrs_models_tpu.ops.pallas.bnpool_kernel import bnpool_stats


def micro_roll():
    def k(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 64, axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x)
    ref = jnp.roll(x, 64, axis=1)
    print("roll(64) matches jnp.roll:", bool(jnp.all(out == ref)), flush=True)


def micro_row_slice():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[0:1, :] + 10.0 * x_ref[1:2, :]

    x = jnp.stack([jnp.arange(128.0), jnp.arange(128.0) * 2])
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32)
    )(x)
    ref = x[0:1] + 10.0 * x[1:2]
    print("row-offset slice ok:", bool(jnp.all(out == ref)),
          "maxdiff", float(jnp.abs(out - ref).max()), flush=True)


def component(name, lossfn, y):
    g_t = jax.jit(jax.grad(lossfn))(y)
    with jax.default_device(jax.devices("cpu")[0]):
        pass
    # interpret-mode reference on the same data
    g_i = jax.grad(
        lambda t: lossfn(t, interp=True)
    )(y)
    d = float(jnp.abs(g_t - g_i).max())
    s = float(jnp.abs(g_i).max())
    print(f"{name:10s} maxdiff {d:.6f}  scale {s:.3f}", flush=True)


def main():
    micro_roll()
    micro_row_slice()
    rng = np.random.default_rng(0)
    n, h, w, c = 4, 8, 16, 64
    y = jnp.asarray(rng.normal(0, 1, (n, h, w, c)).astype(np.float32))
    wt = jnp.asarray(
        rng.normal(0, 1, (n, h // 2, w // 2, c)).astype(np.float32)
    )
    v1 = jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32))

    def lmax(t, interp=False):
        return jnp.sum(wt * bnpool_stats(t, interp)[0])

    def lmin(t, interp=False):
        return jnp.sum(wt * bnpool_stats(t, interp)[1])

    def ls1(t, interp=False):
        return jnp.sum(v1 * bnpool_stats(t, interp)[2])

    def ls2(t, interp=False):
        return jnp.sum(v2 * bnpool_stats(t, interp)[3])

    component("pmax", lmax, y)
    component("pmin", lmin, y)
    component("s1", ls1, y)
    component("s2", ls2, y)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

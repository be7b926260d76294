"""W-minor (NHCW) stage-2 feasibility probe.

Hypothesis: the NHWC stage-2 tensors' C=64 minor dim lane-pads 2x in
HBM, capping every pass (XLA and Pallas) near ~200 GB/s effective. In
NHCW ([N, H, C, W]) the minor dim is W' = 512 — full lanes, no padding,
and stage 1's kernel already produces this layout natively (its NHWC
transpose would disappear).

Measures:
  1. micro: does `x * col` (per-sublane broadcast over lanes) compile?
  2. W-minor pool-only Pallas kernel (dots from the right)
  3. W-minor pool+sums kernel (lane reductions)
  4. stage 3 conv (128ch) NHCW vs NHWC fwd+bwd
  5. (2,1) H-pool + BN + relu in NHCW vs NHWC (stages 3-4 epilogues)
  6. transpose pooled [N,16,64,256] -> NHWC [N,16,256,64] cost

Run:  nohup python tools/bnpool_wminor_probe.py > /tmp/bnpool_wminor.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def run(name, fn, *args, grad=False):
    try:
        f = jax.jit(fn)
        t = timeit(f, *args)
        msg = f"{name:36s} fwd {t*1e3:6.2f} ms"
        if grad:
            g = jax.jit(
                jax.grad(
                    lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2)
                )
            )
            tg = timeit(g, *args)
            msg += f"  fwd+bwd {tg*1e3:6.2f} ms"
        print(msg, flush=True)
    except Exception as e:  # noqa
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


def micro_colbcast():
    def k(x_ref, c_ref, o_ref):
        o_ref[...] = x_ref[...] * c_ref[...] + c_ref[...]

    x = jnp.ones((64, 512), jnp.float32)
    col = jnp.ones((64, 1), jnp.float32)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((64, 512), jnp.float32)
        )(x, col)
        print("col-broadcast in kernel: ok", float(out[0, 0]), flush=True)
    except Exception as e:  # noqa
        print(f"col-broadcast in kernel: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def _sel_t(w, dtype):
    wp = w // 2
    rows = np.arange(wp)
    se = np.zeros((w, wp), np.float32)
    so = np.zeros((w, wp), np.float32)
    se[2 * rows, rows] = 1.0
    so[2 * rows + 1, rows] = 1.0
    return jnp.asarray(se, dtype), jnp.asarray(so, dtype)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def kF(y_ref, se_ref, so_ref, pmax_ref, pmin_ref):
    se, so = se_ref[...], so_ref[...]
    y0 = y_ref[0, 0]  # [C, W]
    y1 = y_ref[0, 1]
    e0, o0, e1, o1 = _dot(y0, se), _dot(y0, so), _dot(y1, se), _dot(y1, so)
    pmax_ref[0, 0] = jnp.maximum(
        jnp.maximum(e0, o0), jnp.maximum(e1, o1)
    ).astype(pmax_ref.dtype)
    pmin_ref[0, 0] = jnp.minimum(
        jnp.minimum(e0, o0), jnp.minimum(e1, o1)
    ).astype(pmin_ref.dtype)


def kG(y_ref, se_ref, so_ref, pmax_ref, pmin_ref, s1_ref, s2_ref):
    se, so = se_ref[...], so_ref[...]
    y0 = y_ref[0, 0]
    y1 = y_ref[0, 1]
    e0, o0, e1, o1 = _dot(y0, se), _dot(y0, so), _dot(y1, se), _dot(y1, so)
    pmax_ref[0, 0] = jnp.maximum(
        jnp.maximum(e0, o0), jnp.maximum(e1, o1)
    ).astype(pmax_ref.dtype)
    pmin_ref[0, 0] = jnp.minimum(
        jnp.minimum(e0, o0), jnp.minimum(e1, o1)
    ).astype(pmin_ref.dtype)
    t = (e0 + o0) + (e1 + o1)
    q = e0 * e0 + o0 * o0 + e1 * e1 + o1 * o1
    s1_ref[0, 0] = jnp.sum(t, axis=1, keepdims=True)
    s2_ref[0, 0] = jnp.sum(q, axis=1, keepdims=True)


def main():
    micro_colbcast()
    rng = np.random.default_rng(0)
    n, h, c, w = 128, 32, 64, 512
    hp, wp = h // 2, w // 2
    y = jnp.asarray(
        rng.normal(0, 1, (n, h, c, w)).astype(np.float32)
    ).astype(jnp.bfloat16)
    se, so = _sel_t(w, y.dtype)

    hpair = pl.BlockSpec((1, 2, c, w), lambda i, j: (i, j, 0, 0))
    pooled = pl.BlockSpec((1, 1, c, wp), lambda i, j: (i, j, 0, 0))
    selspec = [
        pl.BlockSpec((w, wp), lambda i, j: (0, 0)),
        pl.BlockSpec((w, wp), lambda i, j: (0, 0)),
    ]
    pooled_shape = [
        jax.ShapeDtypeStruct((n, hp, c, wp), y.dtype),
        jax.ShapeDtypeStruct((n, hp, c, wp), y.dtype),
    ]

    run("F wmin pool-only", lambda t: pl.pallas_call(
        kF, grid=(n, hp), in_specs=[hpair] + selspec,
        out_specs=[pooled, pooled], out_shape=pooled_shape,
        compiler_params=_VM)(t, se, so), y)

    sums_spec = [
        pl.BlockSpec((1, 1, c, 1), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, c, 1), lambda i, j: (i, j, 0, 0)),
    ]
    sums_shape = [
        jax.ShapeDtypeStruct((n, hp, c, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, hp, c, 1), jnp.float32),
    ]
    run("G wmin pool+sums", lambda t: pl.pallas_call(
        kG, grid=(n, hp), in_specs=[hpair] + selspec,
        out_specs=[pooled, pooled] + sums_spec,
        out_shape=pooled_shape + sums_shape,
        compiler_params=_VM)(t, se, so), y)

    # stage 3 conv + epilogue comparisons
    x3 = jnp.asarray(
        rng.normal(0, 1, (n, 16, wp, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)  # NHWC
    x3cw = jnp.transpose(x3, (0, 1, 3, 2))  # NHCW
    k128 = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, 64, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)

    run("stage3 conv NHWC", lambda t: jax.lax.conv_general_dilated(
        t, k128, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x3, grad=True)
    run("stage3 conv NHCW", lambda t: jax.lax.conv_general_dilated(
        t, k128, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHCW", "HWIO", "NHCW")), x3cw, grad=True)

    # (2,1) H-pool + relu on a [n,16,*,*] 128-ch tensor, both layouts
    z = jnp.asarray(
        rng.normal(0, 1, (n, 16, wp, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    zcw = jnp.transpose(z, (0, 1, 3, 2))
    run("hpool+relu NHWC", lambda t: jax.nn.relu(jax.lax.reduce_window(
        t, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID")),
        z, grad=True)
    run("hpool+relu NHCW", lambda t: jax.nn.relu(jax.lax.reduce_window(
        t, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID")),
        zcw, grad=True)

    # pooled-layout transpose cost
    p = jnp.asarray(
        rng.normal(0, 1, (n, hp, c, wp)).astype(np.float32)
    ).astype(jnp.bfloat16)
    run("pooled NHCW->NHWC transpose", lambda t: jnp.transpose(
        t, (0, 1, 3, 2)) * jnp.bfloat16(1.0), p)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

"""Stage-1/2 conv formulation A/B for the recognition model (TPU).

Ablation showed stages 1-2 (C=1->32->64 at high res) cost 14.5 ms of the
32 ms wide-bucket step, with the conv BACKWARD the pathology (stage 1:
3.5 fwd / 5.2 bwd; stage 2: 0.75 fwd / 5.0 bwd). This probe measures
alternative XLA formulations whose VJPs avoid XLA's conv-backward path:

  A  baseline: NHWC lax.conv (what the model runs today)
  B  channels-first shifts: stage-1 as 9 shifted broadcast-FMAs, stage-2
     as 9 shifted 'nchw,co->nohw' einsums (the detection model's measured
     best pattern at small C) - VJP is elementwise + matmul only
  C  NCHW lax.conv
  D  variant of B with maxpool before relu

Each variant runs stage1+stage2 (conv-bias-relu-pool; conv-BN-relu-pool)
on [128, 64, 1024] and is timed fwd and value_and_grad.

Run:  nohup python tools/rec_stage_probe.py > /tmp/rec_stage_probe.log 2>&1 &
"""

import functools
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


def _bn_train(x, gamma, beta, axis):
    xf = x.astype(jnp.float32)
    red = tuple(i for i in range(x.ndim) if i != axis)
    mean = jnp.mean(xf, axis=red)
    var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
    shape = tuple(-1 if i == axis else 1 for i in range(x.ndim))
    inv = jax.lax.rsqrt(var + 1e-5) * gamma
    return (x * inv.reshape(shape).astype(x.dtype)
            + (beta - mean * inv).reshape(shape).astype(x.dtype))


def _pool_nhwc(x):
    # -inf init (not finfo.min): reduce_window's max-pool VJP only
    # pattern-matches the -inf form.
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _pool_nchw(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def variant_a(params, x):  # x [N, 64, W, 1] NHWC
    w0, b0, w3, g4, be4 = params
    y = jax.lax.conv_general_dilated(
        x.astype(DT), w0.astype(DT), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b0.astype(DT)
    y = _pool_nhwc(jax.nn.relu(y))
    y = jax.lax.conv_general_dilated(
        y, w3.astype(DT), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = _pool_nhwc(jax.nn.relu(_bn_train(y, g4, be4, 3)))
    return jnp.mean(y.astype(jnp.float32))


def variant_c(params, x):  # NCHW lax.conv
    w0, b0, w3, g4, be4 = params
    xc = jnp.transpose(x, (0, 3, 1, 2)).astype(DT)  # [N,1,H,W]
    w0c = jnp.transpose(w0, (3, 2, 0, 1)).astype(DT)  # OIHW
    w3c = jnp.transpose(w3, (3, 2, 0, 1)).astype(DT)
    y = jax.lax.conv_general_dilated(
        xc, w0c, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + b0.astype(DT)[None, :, None, None]
    y = _pool_nchw(jax.nn.relu(y))
    y = jax.lax.conv_general_dilated(
        y, w3c, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    y = _pool_nchw(jax.nn.relu(_bn_train(y, g4, be4, 1)))
    return jnp.mean(y.astype(jnp.float32))


def _stage1_shifts(x2, w0, b0):
    # x2 [N,H,W] f32; w0 [3,3,1,32] -> y [N,32,H,W]
    n, h, w = x2.shape
    xp = jnp.pad(x2.astype(DT), ((0, 0), (1, 1), (1, 1)))
    out = None
    for dy in range(3):
        for dx in range(3):
            term = (xp[:, dy : dy + h, dx : dx + w][:, None]
                    * w0[dy, dx, 0].astype(DT)[None, :, None, None])
            out = term if out is None else out + term
    return out + b0.astype(DT)[None, :, None, None]


def _stage2_shifts(y, w3):
    # y [N,C,H,W]; w3 [3,3,C,O] -> [N,O,H,W]
    n, c, h, w = y.shape
    yp = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = None
    for dy in range(3):
        for dx in range(3):
            term = jnp.einsum(
                "nchw,co->nohw",
                yp[:, :, dy : dy + h, dx : dx + w],
                w3[dy, dx].astype(DT),
                preferred_element_type=jnp.float32,
            )
            out = term if out is None else out + term
    return out.astype(DT)


def variant_b(params, x, pool_first=False):
    w0, b0, w3, g4, be4 = params
    y = _stage1_shifts(x[..., 0], w0, b0)
    if pool_first:
        y = jax.nn.relu(_pool_nchw(y))
    else:
        y = _pool_nchw(jax.nn.relu(y))
    y = _stage2_shifts(y, w3)
    y = _pool_nchw(jax.nn.relu(_bn_train(y, g4, be4, 1)))
    return jnp.mean(y.astype(jnp.float32))


def main(n=128, width=1024):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 64, width, 1)).astype(np.float32))
    params = (
        jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, 32)).astype(np.float32)),
        jnp.zeros((32,), jnp.float32),
        jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 64)).astype(np.float32)),
        jnp.ones((64,), jnp.float32),
        jnp.zeros((64,), jnp.float32),
    )
    variants = {
        "A nhwc-conv": variant_a,
        "B cf-shifts": variant_b,
        "C nchw-conv": variant_c,
        "D cf-shifts-poolfirst": functools.partial(variant_b, pool_first=True),
    }
    vals = {}
    for name, fn in variants.items():
        try:
            f = jax.jit(fn)
            t_f = timeit(f, params, x)
            g = jax.jit(jax.value_and_grad(fn))
            t_g = timeit(g, params, x)
            vals[name] = float(f(params, x))
            print(f"{name:24s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_g*1e3:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)
    print("loss agreement:", vals, flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

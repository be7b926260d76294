"""Stage-1/2 probe round 3: lane-efficient pooling formulations.

Probe-2 findings: conv0/conv3 are individually fine (~2.2 ms fwd+bwd
each); the 2x2 max-pool passes over the [N,64,1024,32] stage-1 tensor are
the pathology (reduce_window fwd alone 4.79 ms vs a 0.78 ms roofline;
slice-max VJP 3x worse). Hypothesis: the C=32 minor dim occupies 32 of
128 lanes, so every elementwise/pool pass moves ~4x padded traffic.

Formulations that keep the minor dim wide:
  P1 reduce_window (baseline)
  P2 reshape [N,H,W,C]->[N,H/2,2,W/2,2,C], max over the two window axes
  P3 flattened: view [N,H,W*C]; h-max = maximum of row slices (full-lane);
     then view [N,H/2,W/2,2C]; w-max = maximum of the two C-halves
  P4 same as P3 but h-max via reshape [N,H/2,2,W*C] and max(axis=2)

Each measured alone on the stage-1 tensor and inside the full stage1+2
block (value_and_grad over params, like the real train step).

Run:  nohup python tools/rec_stage_probe3.py > /tmp/rec_stage_probe3.log 2>&1 &
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


def pool_rw(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_reshape(x):
    n, h, w, c = x.shape
    return jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def pool_flat(x):
    n, h, w, c = x.shape
    a = x.reshape(n, h, w * c)
    m = jnp.maximum(a[:, 0::2], a[:, 1::2])          # [N, H/2, W*C]
    m = m.reshape(n, h // 2, w // 2, 2 * c)
    return jnp.maximum(m[..., :c], m[..., c:])        # [N, H/2, W/2, C]


def pool_flat2(x):
    n, h, w, c = x.shape
    a = x.reshape(n, h // 2, 2, w * c)
    m = jnp.max(a, axis=2)
    m = m.reshape(n, h // 2, w // 2, 2 * c)
    return jnp.maximum(m[..., :c], m[..., c:])


POOLS = {
    "P1 reduce_window": pool_rw,
    "P2 reshape-max": pool_reshape,
    "P3 flat-slices": pool_flat,
    "P4 flat-axis": pool_flat2,
}


def conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_train(x, gamma, beta):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + 1e-5) * gamma
    return x * inv.astype(x.dtype) + (beta - mean * inv).astype(x.dtype)


def main(n=128, width=1024):
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 64, width, 1)).astype(np.float32))
    xs1 = jnp.asarray(
        rng.uniform(-1, 1, (n, 64, width, 32)).astype(np.float32)).astype(DT)
    params = {
        "w0": jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, 32)).astype(np.float32)),
        "b0": jnp.zeros((32,), jnp.float32),
        "w3": jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 64)).astype(np.float32)),
        "g4": jnp.ones((64,), jnp.float32),
        "be4": jnp.zeros((64,), jnp.float32),
    }

    def run(name, fn, *args, grad_arg=0):
        try:
            f = jax.jit(fn)
            t_f = timeit(f, *args)
            g = jax.jit(jax.grad(fn, argnums=grad_arg))
            t_g = timeit(g, *args)
            print(f"{name:30s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_g*1e3:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa
            print(f"{name:30s} FAILED: {type(e).__name__}: {e}", flush=True)

    for name, pool in POOLS.items():
        run(f"pool {name}",
            lambda x, pool=pool: jnp.mean(pool(x).astype(jnp.float32)), xs1)

    def stages(p, x, pool):
        y = conv_nhwc(x.astype(DT), p["w0"]) + p["b0"].astype(DT)
        y = pool(jax.nn.relu(y))
        y = conv_nhwc(y, p["w3"])
        y = pool(jax.nn.relu(_bn_train(y, p["g4"], p["be4"])))
        return jnp.mean(y.astype(jnp.float32))

    vals = {}
    for name, pool in POOLS.items():
        run(f"stage1+2 {name}",
            lambda p, x, pool=pool: stages(p, x, pool), params, x1)
        vals[name] = float(jax.jit(
            lambda p, x, pool=pool: stages(p, x, pool))(params, x1))
    print("value agreement:", vals, flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

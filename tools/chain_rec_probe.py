"""A/B: conv_chain_wq vs XLA conv at the recognition stack's C>=32 shapes
(VERDICT round-2 task 4: "point the conv-chain kernel at the shapes where
its economics work").

Shapes (channels-first for the kernel, NHWC for the XLA baseline; batch
128, wide bucket):
  s2: 32 -> 64   @ 32x512  (stage-2 conv3)
  s3: 64 -> 128  @ 16x256  (stage-3 conv7)
  s4: 128 -> 128 @ 16x256  (stage-3 conv9)

Each formulation measured fwd and fwd+bwd (grads w.r.t. weights + input —
both matter mid-stack). The chain runs bn_relu=False (raw conv; the
prologue fold is a separate question) so the comparison isolates the tap
engine.

Run:  nohup python tools/chain_rec_probe.py > /tmp/chain_rec_probe.log 2>&1 &
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
    from ocrs_models_tpu.ops.pallas.conv_chain import (
        chain_shapes_supported,
        conv_chain_wq,
    )

    rng = np.random.default_rng(0)
    shapes = [
        ("s2 32->64 @32x512", 32, 64, 32, 512),
        ("s3 64->128 @16x256", 64, 128, 16, 256),
        ("s4 128->128 @16x256", 128, 128, 16, 256),
    ]
    n = 128
    for name, c, o, h, w in shapes:
        ok = chain_shapes_supported(c, o, h, w, 2)
        print(f"{name}: chain_shapes_supported={ok}", flush=True)
        x_cf = jnp.asarray(
            rng.uniform(-1, 1, (n, c, h, w)).astype(np.float32)
        ).astype(jnp.bfloat16)
        x_nhwc = jnp.transpose(x_cf, (0, 2, 3, 1))
        wk = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, o)).astype(np.float32))
        wq = jnp.transpose(wk.reshape(9, c, o), (0, 2, 1))  # [9, O, C]
        inv = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def xla_fwd(x, wk):
            y = jax.lax.conv_general_dilated(
                x, wk.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32))

        t_f = timeit(jax.jit(xla_fwd), x_nhwc, wk)
        g = jax.jit(jax.grad(xla_fwd, argnums=(0, 1)))
        t_g = timeit(g, x_nhwc, wk)
        print(f"  XLA nhwc conv:      fwd {t_f*1e3:6.2f} ms  fwd+bwd {t_g*1e3:6.2f} ms",
              flush=True)

        if not ok:
            continue

        def chain_fwd(x, wq):
            y, s1, s2 = conv_chain_wq(x, inv, bias, wq, False, False)
            return jnp.sum(y.astype(jnp.float32)) + jnp.sum(s1) * 0

        try:
            t_f = timeit(jax.jit(chain_fwd), x_cf, wq)
            gc = jax.jit(jax.grad(chain_fwd, argnums=(0, 1)))
            t_g = timeit(gc, x_cf, wq)
            print(f"  conv_chain_wq:      fwd {t_f*1e3:6.2f} ms  fwd+bwd {t_g*1e3:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa
            print(f"  conv_chain_wq FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

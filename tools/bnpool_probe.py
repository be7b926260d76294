"""TPU probe for the fused stage-2 bnpool kernel.

Checks (wide-bucket stage-2 shape [128, 32, 512, 64] bf16):
  1. Mosaic accepts the kernels (lane-half fold, rolls, MXU expansion).
  2. Numerical agreement with the XLA reference on-device.
  3. fwd / fwd+bwd timing vs the XLA bn+pool+relu block.

Run:  nohup python tools/bnpool_probe.py > /tmp/bnpool_probe.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.ops.pallas.bnpool_kernel import (
    fused_bnpool,
    reference_bnpool,
)


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
    y = jnp.asarray(
        rng.normal(0, 1, (n, h, w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.3, (c,)).astype(np.float32))
    gamma = gamma.at[3].set(-0.7)
    beta = jnp.asarray(rng.normal(0, 0.2, (c,)).astype(np.float32))

    fused = jax.jit(lambda t: fused_bnpool(t, gamma, beta))
    ref = jax.jit(lambda t: reference_bnpool(t, gamma, beta))

    print("compiling fused fwd ...", flush=True)
    of = fused(y)
    orf = ref(y)
    d = jnp.abs(of.astype(jnp.float32) - orf.astype(jnp.float32)).max()
    print("fwd max abs diff:", float(d), flush=True)

    gf = jax.jit(jax.grad(lambda t: jnp.sum(fused_bnpool(t, gamma, beta).astype(jnp.float32) ** 2)))
    gr = jax.jit(jax.grad(lambda t: jnp.sum(reference_bnpool(t, gamma, beta).astype(jnp.float32) ** 2)))
    print("compiling fused bwd ...", flush=True)
    dgf = gf(y)
    dgr = gr(y)
    # bf16 caveat: the reference applies the BN affine in bf16 BEFORE
    # pooling, which can collapse near-ties and route the pool gradient
    # to a different (equally valid) window position than the fused
    # path's raw-value argmax. Compare both against the f32-exact
    # gradient: the fused path must not be farther from truth than the
    # reference is, and large disagreements must stay rare.
    g32 = jax.jit(
        jax.grad(
            lambda t: jnp.sum(
                reference_bnpool(t.astype(jnp.float32), gamma, beta) ** 2
            )
        )
    )
    dg32 = g32(y).astype(jnp.float32)
    df = jnp.abs(dgf.astype(jnp.float32) - dg32)
    dr = jnp.abs(dgr.astype(jnp.float32) - dg32)
    print(
        "bwd vs f32 truth: fused frac>0.1", float(jnp.mean(df > 0.1)),
        " ref frac>0.1", float(jnp.mean(dr > 0.1)),
        " fused maxdiff", float(df.max()),
        " ref maxdiff", float(dr.max()),
        flush=True,
    )

    print(f"fused fwd      {timeit(fused, y)*1e3:6.2f} ms", flush=True)
    print(f"ref   fwd      {timeit(ref, y)*1e3:6.2f} ms", flush=True)
    print(f"fused fwd+bwd  {timeit(gf, y)*1e3:6.2f} ms", flush=True)
    print(f"ref   fwd+bwd  {timeit(gr, y)*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()

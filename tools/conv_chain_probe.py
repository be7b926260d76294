"""Probe the fused conv-chain kernel (ops/pallas/conv_chain.py) on the
real TPU: per-geometry compile + run time vs the equivalent XLA
formulation (9-shift depthwise + einsum + stat sums + prologue).

Usage: python tools/conv_chain_probe.py [--bwd]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.ops.pallas.conv_chain import (
    chain_shapes_supported,
    conv_chain,
    conv_chain_reference,
)

# (C, O, H, W) for every channels-first block at batch 8, input 800x608.
GEOMETRIES = [
    ("in0", 1, 8, 800, 608),
    ("in1", 8, 8, 800, 608),
    ("d0c0", 8, 16, 800, 608),
    ("d0c1", 16, 16, 800, 608),
    ("d1c0", 16, 32, 400, 304),
    ("d1c1", 32, 32, 400, 304),
    ("d2c0", 32, 32, 200, 152),
    ("u2c0", 64, 32, 200, 152),
    ("u1c0", 32, 16, 400, 304),
    ("u0c0", 16, 8, 800, 608),
]

N = 8


def timed(fn, *args, iters=20):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # axon fence
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    run_ms = (time.perf_counter() - t0) / iters * 1e3
    return compile_s, run_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true", help="also probe grads")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=str, default="", help="comma-set of geometry names")
    ap.add_argument("--no-ref", action="store_true", help="skip XLA reference timing")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    only = set(args.only.split(",")) if args.only else None
    for name, c, o, h, w in GEOMETRIES:
        if only and name not in only:
            continue
        ok = chain_shapes_supported(c, o, h, w)
        x = jnp.array(rng.normal(size=(N, c, h, w)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        inv = jnp.array(rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32))
        bias = jnp.array(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        wd = jnp.array(rng.normal(size=(c, 3, 3)).astype(np.float32) * 0.5)
        wp = jnp.array(rng.normal(size=(c, o)).astype(np.float32) * 0.5)

        if args.no_ref:
            ref_ms = float("nan")
        else:
            ref = jax.jit(lambda *a: conv_chain_reference(*a, True))
            _, ref_ms = timed(ref, x, inv, bias, wd, wp, iters=args.iters)

        line = f"{name:5s} C={c:3d} O={o:3d} {h}x{w} gate={'y' if ok else 'n'} xla={ref_ms:7.2f}ms"
        if not ok:
            print(line + "  (kernel skipped by gate)", flush=True)
            continue
        try:
            ker = jax.jit(lambda *a: conv_chain(*a, True, False))
            comp_s, ker_ms = timed(ker, x, inv, bias, wd, wp, iters=args.iters)
            line += f" kernel={ker_ms:7.2f}ms (compile {comp_s:.1f}s) speedup={ref_ms / ker_ms:4.2f}x"
        except Exception as e:  # noqa: BLE001
            line += f" kernel FAILED: {type(e).__name__}: {str(e)[:120]}"
        print(line, flush=True)

        if args.bwd:

            def loss_k(*a):
                y, s1, s2 = conv_chain(*a, True, False)
                return jnp.sum(y.astype(jnp.float32)) + jnp.sum(s1 + s2)

            try:
                g = jax.jit(jax.grad(loss_k, argnums=(0, 3, 4)))
                comp_s, g_ms = timed(g, x, inv, bias, wd, wp, iters=args.iters)
                print(f"      grad(fused bwd)={g_ms:7.2f}ms (compile {comp_s:.1f}s)")
            except Exception as e:  # noqa: BLE001
                print(f"      grad FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

"""Micro-probes: is the MXU expansion dot exact? does lane-concat work?

Run:  nohup python tools/bnpool_debug2.py > /tmp/bnpool_debug2.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe_dot_exact(dtype, name):
    c = 64
    dmat = jnp.concatenate([jnp.eye(c, dtype=jnp.float32)] * 2, axis=1)

    def k(p_ref, d_ref, o_ref):
        p = p_ref[...].astype(jnp.float32)
        pb = jax.lax.dot_general(
            p, d_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        eq = jnp.where(pb[:, :c] == p, 1.0, 0.0)
        o_ref[...] = eq

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(0, 1, (256, c)).astype(np.float32)).astype(dtype)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((256, c), jnp.float32),
    )(p, dmat)
    frac = float(jnp.mean(out))
    print(f"dot-expand exact fraction ({name}): {frac:.4f}", flush=True)


def probe_lane_concat():
    c = 64

    def k(p_ref, o_ref):
        p = p_ref[...].astype(jnp.float32)
        o_ref[...] = jnp.concatenate([p, 2.0 * p], axis=1)

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(0, 1, (256, c)).astype(np.float32))
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((256, 2 * c), jnp.float32)
        )(p)
        ref = jnp.concatenate([p, 2.0 * p], axis=1)
        print("lane-concat ok:", bool(jnp.all(out == ref)), flush=True)
    except Exception as e:  # noqa
        print(f"lane-concat FAILED: {type(e).__name__}: {e}", flush=True)


def probe_lane_slice_eq():
    # forward-style fold then equality against the fold result
    c = 64

    def k(y_ref, o_ref):
        y = y_ref[...].astype(jnp.float32)
        m = jnp.maximum(y[:, :c], y[:, c:])
        eq0 = jnp.where(y[:, :c] == m, 1.0, 0.0)
        eq1 = jnp.where(y[:, c:] == m, 1.0, 0.0)
        o_ref[...] = eq0 + eq1

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 1, (256, 2 * c)).astype(np.float32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, c), jnp.float32)
    )(y)
    print("lane-slice eq mean (expect ~1.0):", float(jnp.mean(out)), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_dot_exact(jnp.float32, "f32 operand")
    probe_dot_exact(jnp.bfloat16, "bf16 operand")
    probe_lane_concat()
    probe_lane_slice_eq()

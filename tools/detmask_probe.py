"""Probe: det forward vs forward+threshold+packbits latency, batch 1 and 8.

Isolates why the packed-mask fetch helped the batched serving path but
regressed the per-page path (tools/serve_bench.py round-3 measurement).

Run:  nohup python tools/detmask_probe.py > /tmp/detmask_probe.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.config import DetectionTrainConfig
from ocrs_models_tpu.models import DetectionModel


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # fetch = fence on axon
        best = min(best, (time.perf_counter() - t0) / iters)
    return 1e3 * best


def main():
    print("devices:", jax.devices(), flush=True)
    model = DetectionModel()
    h, w = DetectionTrainConfig().mask_size
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    mask_pack = jax.jit(
        lambda v, x: jnp.packbits(model.apply(v, x, train=False)[..., 0] > 0.5, axis=-1)
    )
    mask_u8 = jax.jit(
        lambda v, x: (model.apply(v, x, train=False)[..., 0] > 0.5).astype(jnp.uint8)
    )
    pack_only = jax.jit(lambda m: jnp.packbits(m > 0.5, axis=-1))

    for n in (1, 8):
        x = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (n, h, w, 1)), jnp.float32)
        probs = fwd(variables, x)[..., 0]
        print(f"batch {n}: fwd(+f32 fetch)      {timeit(fwd, variables, x):8.2f} ms", flush=True)
        print(f"batch {n}: fwd+thr+pack (fetch) {timeit(mask_pack, variables, x):8.2f} ms", flush=True)
        print(f"batch {n}: fwd+thr->u8  (fetch) {timeit(mask_u8, variables, x):8.2f} ms", flush=True)
        print(f"batch {n}: packbits only(fetch) {timeit(pack_only, probs):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Subprocess body for tests/test_multihost.py.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each worker owns 4 virtual CPU devices and joins a jax.distributed
coordinator, so the 2-process run exercises the REAL multi-host stack:
cross-process device discovery, per-process data sharding via the
DataLoader, global-mesh shard_map with cross-process collectives (the
CPU analogue of ICI/DCN psum), and host-side metric fetch. Emits one
JSON line with the step's scalars on stdout.
"""

import os
import sys

# Per-process virtual device count must be set before jax initializes a
# backend; this replaces (not appends to) any inherited XLA_FLAGS so the
# parent pytest's 8-device flag cannot leak in.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("OCRS_TPU_BACKEND_PROBE", "0")

import jax  # noqa: E402

# The image's sitecustomize force-sets jax_platforms="axon,cpu"; pin CPU
# after import, before backend init (same dance as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: ocrs_models_tpu
sys.path.insert(0, _HERE)
import multihost_common as common  # noqa: E402


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from ocrs_models_tpu.data.loader import DataLoader
    from ocrs_models_tpu.parallel.distributed import initialize_multihost

    pidx, pcount = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert (pidx, pcount) == (pid, nproc), (pidx, pcount)
    assert jax.device_count() == common.DEVICES_PER_PROC * nproc
    assert jax.local_device_count() == common.DEVICES_PER_PROC

    # Per-process data sharding through the real DataLoader: this process
    # reads only rows pidx::pcount of the (deterministic) sample order.
    dataset = common.make_global_dataset()
    loader = DataLoader(
        dataset,
        batch_size=common.GLOBAL_BATCH // nproc,
        collate_fn=common.collate,
        shuffle=False,
        num_threads=1,
        process_index=pidx,
        process_count=pcount,
    )
    batches = list(loader)
    assert len(batches) == 1, len(batches)
    local_batch = batches[0]
    # The loader must hand this process exactly its strided row subset.
    expect = common.collate(dataset[pidx::pcount])
    import numpy as np

    np.testing.assert_array_equal(local_batch["image"], expect["image"])

    result = common.one_train_step(local_batch)
    result.update(
        pid=pid,
        devices=jax.device_count(),
        local_devices=jax.local_device_count(),
    )

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("multihost_worker_done")
    import json

    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

"""Multi-host (multi-process) initialization.

Single-host multi-chip needs nothing beyond the mesh utilities; across
hosts, JAX's distributed runtime must be initialized before any device use
so every process sees the global device set (collectives then ride ICI
within a slice and DCN across hosts — the TPU-native replacement for the
NCCL/MPI layer the reference never had, SURVEY.md §2.3).

Typical multi-host trainer prologue:

    from ocrs_models_tpu.parallel.distributed import initialize_multihost
    pidx, pcount = initialize_multihost()   # no-op on single host / TPU pods
                                            # with auto-detected coordinator
    loader = DataLoader(..., process_index=pidx, process_count=pcount)
    mesh = create_mesh()                    # spans ALL hosts' devices

Each process feeds only its shard of the sample index space (the
DataLoader's ``process_index/process_count`` arguments), and
``shard_batch`` places per-host data onto the global mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize JAX's distributed runtime when running multi-process.

    On TPU pods the coordinator/process topology is auto-detected from the
    environment; arguments are only needed for manual (e.g. GPU or CPU
    fleet) setups. Safe to call on a single process — it is a no-op unless
    a multi-process environment or explicit arguments are present.

    :return: ``(process_index, process_count)``.
    """
    explicit = coordinator_address is not None
    env_driven = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ) or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if explicit or env_driven:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()

"""Multi-host (multi-process) training — executed for real.

SURVEY.md §2.3 claims collectives "ride ICI within a slice and DCN across
hosts"; until round 5 `parallel/distributed.py` had zero multi-process
coverage. This test spawns TWO OS processes, each owning 4 virtual CPU
devices, joined through `initialize_multihost` (jax.distributed + gloo
cross-process collectives — the CPU stand-in for DCN), runs ONE global
shard_map recognition train step with per-process DataLoader sharding,
and asserts the result matches an in-process 8-device run of the same
program bit-for-bit (same rows on the same logical devices).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

import multihost_common as common

REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, timeout: float = 600.0) -> list[dict]:
    port = _free_port()
    env = dict(os.environ)
    # The worker pins its own XLA_FLAGS/platform; scrub only what could
    # confuse jax.distributed autodetection.
    for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"):
        env.pop(k, None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(nproc), str(port)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nproc)
    ]
    results = []
    errors = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        if p.returncode != 0 or not lines:
            errors.append(
                f"worker rc={p.returncode}\nstdout:\n{out[-2000:]}\n"
                f"stderr:\n{err[-2000:]}"
            )
            continue
        results.append(json.loads(lines[-1][len("RESULT "):]))
    assert not errors, "\n---\n".join(errors)
    return results


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    results = _run_workers(2)
    assert len(results) == 2
    for r in results:
        assert r["devices"] == 8
        assert r["local_devices"] == 4

    # Both processes observe identical (replicated) global scalars.
    a, b = sorted(results, key=lambda r: r["pid"])
    assert a["loss"] == b["loss"]
    assert a["grad_norm"] == b["grad_norm"]
    assert a["param_checksum"] == pytest.approx(b["param_checksum"], rel=1e-7)

    # In-process 8-device reference with the same row->device assignment:
    # concat of the per-process strided row subsets, sharded contiguously.
    dataset = common.make_global_dataset()
    ref_rows = dataset[0::2] + dataset[1::2]
    ref = common.one_train_step(common.collate(ref_rows))

    assert a["loss"] == pytest.approx(ref["loss"], rel=1e-6, abs=1e-6)
    assert a["eval_loss"] == pytest.approx(ref["eval_loss"], rel=1e-6, abs=1e-6)
    assert a["grad_norm"] == pytest.approx(ref["grad_norm"], rel=1e-5)
    assert a["param_checksum"] == pytest.approx(
        ref["param_checksum"], rel=1e-6
    )

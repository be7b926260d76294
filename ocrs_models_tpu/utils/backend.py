"""Bounded jax-backend availability probe for CLI entry points.

A wedged TPU runtime (e.g. a dead remote-attachment tunnel) makes the
first ``jax.devices()`` call block indefinitely, turning every trainer /
eval CLI into a silent hang (this ate the round-3 driver bench:
BENCH_r03.json rc=124 with zero output). ``ensure_backend`` initializes
the backend in a *subprocess* with a hard timeout — the parent process
never blocks — and raises a diagnosable error instead.

The probe is skipped when ``OCRS_TPU_BACKEND_PROBE=0`` (set by the test
conftest: tests pin jax to CPU via ``jax.config``, which a subprocess
would not inherit) or when jax already initialized a backend in this
process (probing then would be pure overhead).
"""

from __future__ import annotations

import os
import subprocess
import sys


class BackendUnavailableError(RuntimeError):
    pass


_PROBE_SRC = (
    "import sys, jax; "
    "len(sys.argv) > 1 and jax.config.update('jax_platforms', sys.argv[1]); "
    "ds = jax.devices(); "
    "print(ds[0].platform + ':' + str(len(ds)), flush=True)"
)


def _already_initialized() -> bool:
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def ensure_backend(
    timeout_s: float = 90.0,
    platform: str | None = None,
    force: bool = False,
) -> str | None:
    """Probe backend init in a subprocess. Returns the platform string
    (``"tpu"``, ``"cpu"``, …) on success, ``None`` when the probe is
    skipped; raises :class:`BackendUnavailableError` with a diagnostic on
    hang or failure. Call this at the top of ``main()`` in CLIs, before
    any jax work.

    ``platform`` pins the probed backend via ``jax.config`` in the
    subprocess (the env var is ineffective under this image's
    sitecustomize). ``force=True`` probes even when the env opt-out is
    set or a backend is already live in this process (used by the bench
    supervisor, which never initializes jax itself)."""
    if not force:
        if os.environ.get("OCRS_TPU_BACKEND_PROBE", "1") == "0":
            return None
        if _already_initialized():
            return None
    try:
        res = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC]
            + ([platform] if platform else []),
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        raise BackendUnavailableError(
            f"jax backend initialization hung for more than {timeout_s:.0f}s "
            "(remote TPU runtime unreachable?). Set JAX_PLATFORMS=cpu to "
            "run on the host CPU, or OCRS_TPU_BACKEND_PROBE=0 to skip this "
            "check."
        ) from None
    if res.returncode != 0:
        tail = (res.stderr or "").strip().splitlines()
        raise BackendUnavailableError(
            "jax backend failed to initialize: "
            + (tail[-1] if tail else f"probe exited {res.returncode}")
        )
    return (res.stdout or "").strip().split(":")[0]

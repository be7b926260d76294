"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that data-parallel/pjit code
paths are exercised without TPU hardware (mirrors the driver's
``dryrun_multichip`` validation). Must run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that data-parallel/pjit code
paths are exercised without TPU hardware (mirrors the driver's
``dryrun_multichip`` validation).

Note: this image boots an ``axon`` TPU PJRT plugin from ``sitecustomize``
which force-sets ``jax_platforms="axon,cpu"`` at interpreter startup, so the
usual ``JAX_PLATFORMS=cpu`` env var is ineffective; the config must be
re-updated after ``import jax`` (before any backend initialization).
"""

import os

# CLIs probe backend availability in a subprocess (utils/backend.py); the
# subprocess would not inherit the jax.config CPU pin below and would try
# to reach the axon TPU — skip the probe under tests.
os.environ.setdefault("OCRS_TPU_BACKEND_PROBE", "0")

# Must precede the first jax backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

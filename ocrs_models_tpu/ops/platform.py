"""Effective-platform resolution for kernel auto-policies.

``jax.default_backend()`` reports the highest-priority *backend*, not
where ops actually execute: under a ``jax.default_device(cpu)`` override
(used e.g. to keep eager flax init off a high-latency remote TPU — see
``bench.py::_init_on_cpu``) eager ops run on CPU while
``default_backend()`` still says ``"tpu"``, which would route the
auto-policies to Pallas kernels that cannot execute there ("Only
interpret mode is supported on CPU backend"). These helpers resolve the
platform ops will actually land on.
"""

from __future__ import annotations

import jax


def effective_platform() -> str:
    """Platform new eager ops execute on: the ``jax.default_device``
    override's platform when one is active, else the default backend."""
    dev = jax.config.jax_default_device
    if dev is None:
        return jax.default_backend()
    if isinstance(dev, str):
        return dev
    return dev.platform


def is_single_chip_tpu() -> bool:
    """True when the effective platform is one TPU chip — the regime the
    single-chip Pallas kernel auto-policies were tuned for."""
    return effective_platform() == "tpu" and len(jax.devices()) == 1

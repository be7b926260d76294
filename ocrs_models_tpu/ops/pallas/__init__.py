"""Pallas TPU kernels for the framework's hot ops.

``ctc_alpha_final`` is intentionally NOT re-exported: its VJP is only
correct for per-sample uniform-sign cotangents (the contract ops/ctc.py
guarantees by construction); it stays an internal detail of
``ops.ctc``.
"""

from .gru_kernel import gru_recurrence, gru_recurrence_reference
from .gru_kernel3 import gru_recurrence3

__all__ = ["gru_recurrence", "gru_recurrence3", "gru_recurrence_reference"]

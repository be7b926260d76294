"""Pallas TPU kernels for the framework's hot ops."""

from .ctc_kernel import ctc_alpha_final
from .gru_kernel import gru_recurrence, gru_recurrence_reference

__all__ = ["ctc_alpha_final", "gru_recurrence", "gru_recurrence_reference"]

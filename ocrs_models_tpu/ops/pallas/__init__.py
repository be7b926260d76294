"""Pallas TPU kernels for the framework's hot ops."""

from .ctc_kernel import ctc_alphas
from .gru_kernel import gru_recurrence, gru_recurrence_reference

__all__ = ["ctc_alphas", "gru_recurrence", "gru_recurrence_reference"]

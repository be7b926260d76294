"""Pallas TPU kernels for the framework's hot ops."""

from .gru_kernel import gru_recurrence, gru_recurrence_reference

__all__ = ["gru_recurrence", "gru_recurrence_reference"]

"""Pallas TPU kernels for the framework's hot ops.

Shipping kernels only: ``gru_kernel4`` (zero-relayout fused biGRU
recurrence), ``stage1_kernel`` (fused conv(1->32)+bias+relu+2x2-pool),
``ctc_kernel`` (log-space CTC alpha recursion). Measured-refuted
variants (gru v1-v3 time-chunked/relayout kernels, the split-BN
conv-chain family, the bnpool stage-2 fusion) were deleted after losing
their A/Bs — the measurements live in docs/rec_perf.md and
docs/det_perf.md, the code in git history.

``ctc_alpha_final`` is intentionally NOT re-exported: its VJP is only
correct for per-sample uniform-sign cotangents (the contract ops/ctc.py
guarantees by construction); it stays an internal detail of
``ops.ctc``.
"""

from .gru_kernel4 import gru_recurrence4, gru_recurrence_reference

__all__ = ["gru_recurrence4", "gru_recurrence_reference"]

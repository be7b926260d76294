"""Profiling and throughput instrumentation.

The reference's only perf instrumentation is ad-hoc wall-clock prints
(train_detection.py:90-111, eval_detection.py:45-50). Here profiling is
first-class: an XLA/TPU trace context (``jax.profiler``) for TensorBoard,
and a ``Throughput`` counter giving items/sec/chip — the benchmark metric —
with warm-up exclusion.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture an XLA profiler trace into ``logdir`` (viewable in
    TensorBoard's profile plugin). No-op when ``logdir`` is None."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Running items/sec/chip counter with warm-up exclusion.

    The first ``warmup`` updates (compilation, cache priming) are excluded
    from the cumulative rate.
    """

    def __init__(self, warmup: int = 1, n_chips: Optional[int] = None):
        self.warmup = warmup
        self.n_chips = n_chips or max(len(jax.devices()), 1)
        self.updates = 0
        self.items = 0
        self._started: Optional[float] = None
        self.last_rate = 0.0

    def update(self, n_items: int) -> None:
        now = time.perf_counter()
        self.updates += 1
        if self.updates <= self.warmup:
            self._started = now
            return
        self.items += n_items
        assert self._started is not None
        elapsed = now - self._started
        if elapsed > 0:
            self.last_rate = self.items / elapsed / self.n_chips

    def items_per_sec_per_chip(self) -> float:
        return self.last_rate

    def summary(self) -> str:
        return f"{self.last_rate:.0f} items/sec/chip"

"""Host-side data loader with threaded prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=2,
pin_memory=True)`` (train_detection.py:350-356). Worker threads (PIL/numpy
release the GIL for the heavy parts) fetch samples ahead of the training
loop and assemble collated batches into a bounded queue; batches then
overlap host->HBM transfer with device compute via ``shard_batch``.

For multi-host training the sample index space shards by process
(``jax.process_index()``-style arguments) so each host reads a disjoint
subset — the TPU-native analogue of a DistributedSampler.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Sequence

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset: Sequence,
        batch_size: int,
        collate_fn: Callable[[list], dict],
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_threads: int = 2,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def _batch_indices(self) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        order = order[self.process_index :: self.process_count]
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __len__(self) -> int:
        return len(self._batch_indices())

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self.epoch += 1
        if not batches:
            return iter(())

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # Never block forever on a full queue: an abandoned consumer
            # (exception mid-epoch, partial iteration) sets `stop` from its
            # finally, and the producer must observe it to exit.
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for idx_batch in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(lambda i: self.dataset[int(i)], idx_batch)
                        )
                        if not put_or_stop(self.collate_fn(samples)):
                            return
                put_or_stop(None)
            except BaseException as e:  # surface worker errors to the consumer
                put_or_stop(e)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()

        def gen():
            try:
                while True:
                    item = out_q.get()
                    if item is None:
                        return
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop.set()

        return gen()


def device_prefetch(iterator: Iterator[dict], put_fn: Callable, depth: int = 2):
    """Wrap a host-batch iterator so device transfer overlaps compute.

    Yields ``(host_batch, device_batch)`` pairs with up to ``depth`` device
    batches in flight (``jax.device_put`` is async, so transfers for
    upcoming batches proceed while the current step computes); the host
    batch stays available for host-side metrics (decoding, CER).
    """
    buf: list = []
    for batch in iterator:
        buf.append((batch, put_fn(batch)))
        if len(buf) >= depth:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)

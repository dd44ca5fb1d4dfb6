"""Batch loading + device prefetch.

Replaces the reference's torch DataLoader/DistributedSampler stack with a simple
thread-pool batch assembler and a device-prefetch iterator: host workers build the
next numpy batch while the TPU runs the current step, so the H2D copy overlaps
compute (the reference's per-item ``torch.load`` pattern, triplane_datasets.py:110,
is gone — see packing in triplane_data.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


class BatchLoader:
    """Infinite shuffled batch iterator over an indexable item source.

    ``item_fn(idx, rng) -> dict[str, np.ndarray]``; items are stacked along axis 0.
    ``num_workers`` background threads pipeline item construction.
    """

    def __init__(
        self,
        num_items: int,
        item_fn: Callable[[int, np.random.Generator], Dict[str, np.ndarray]],
        batch_size: int,
        seed: int = 0,
        num_workers: int = 2,
        queue_depth: int = 4,
    ):
        self.num_items = num_items
        self.item_fn = item_fn
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, args=(seed + 1 + w,), daemon=True)
            for w in range(max(1, num_workers))
        ]
        for t in self._threads:
            t.start()

    def _worker(self, seed: int):
        rng = np.random.default_rng(seed)
        while not self._stop.is_set():
            idxs = rng.integers(0, self.num_items, self.batch_size)
            items = [self.item_fn(int(i), rng) for i in idxs]
            batch = {
                k: np.stack([it[k] for it in items], axis=0) for k in items[0]
            }
            try:
                self._q.put(batch, timeout=1.0)
            except queue.Full:
                continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self._q.get()

    def close(self):
        self._stop.set()


def device_prefetch(it: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Move batches to device ``size`` steps ahead of consumption."""
    buf = []
    it = iter(it)

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
        while True:
            out = buf.pop(0)
            buf.append(put(next(it)))
            yield out
    except StopIteration:
        yield from buf

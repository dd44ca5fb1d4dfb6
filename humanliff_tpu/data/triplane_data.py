"""Stage-2 tri-plane datasets: packed, memory-mapped, prefetched.

The reference loads a ~100 MB torch ``.tar`` per item inside ``__getitem__``
(triplane_datasets.py:110) — a severe input bottleneck. Here all subjects' planes
pack once into a single float32 ``.npy`` memmap of shape (N, L, C, D, D); items are
pure memmap slices.

Item semantics match triplane_datasets.py:103-119: x = planes[subject, layer],
layer_condition = planes[subject, layer-1] (zeros for layer 0), y = layer index.
Returned in NHWC for the UNet.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from humanliff_tpu.train.checkpoint import load_subject_planes


def pack_subject_planes(paths: List[str], out_path: str) -> np.ndarray:
    """Pack per-subject npz plane files into one memmap-able (N, L, C, D, D) array."""
    first = load_subject_planes(paths[0])
    first = np.asarray(first, np.float32)
    L = first.shape[0]
    C = int(np.prod(first.shape[1:-2]))
    D = first.shape[-1]
    arr = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=np.float32, shape=(len(paths), L, C, D, D)
    )
    for i, p in enumerate(paths):
        planes = np.asarray(load_subject_planes(p), np.float32)
        arr[i] = planes.reshape(L, C, D, D)
    arr.flush()
    return arr


class TriplaneDataset:
    """Indexable (subject, layer) item source for BatchLoader."""

    def __init__(self, packed_path: str, num_layers: int = 4):
        self.planes = np.load(packed_path, mmap_mode="r")
        self.num_layers = num_layers
        assert self.planes.ndim == 5, self.planes.shape

    def __len__(self) -> int:
        return self.planes.shape[0] * self.num_layers

    def item(self, index: int, rng=None) -> Dict[str, np.ndarray]:
        subject = index // self.num_layers
        layer = index % self.num_layers
        x = np.asarray(self.planes[subject, layer], np.float32)
        if layer == 0:
            cond = np.zeros_like(x)
        else:
            cond = np.asarray(self.planes[subject, layer - 1], np.float32)
        # NCHW storage -> NHWC for the UNet.
        return {
            "x": x.transpose(1, 2, 0),
            "x_cond": cond.transpose(1, 2, 0),
            "y": np.int32(layer),
        }

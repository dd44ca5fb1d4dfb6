"""Profiling harness: block-until-ready timing + jax.profiler traces.

First-class replacement for the reference's ad-hoc wall-clock prints
(run_nerf_batch.py:300, all_test.py:153-156) — see SURVEY.md §5.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


class Timer:
    """Accumulating section timer with device synchronization."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            if sync and "out" in result:
                jax.block_until_ready(result["out"])
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in sorted(self.totals)
        }


def force_sync(out):
    """Synchronize by READBACK, not block_until_ready.

    On tunneled/remote TPU backends (axon) ``block_until_ready`` can return before
    the computation finishes, producing wildly optimistic timings (observed 100x).
    Fetching one element of each output forces true completion.
    """
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
    if leaves:
        jax.device_get([x.ravel()[0] for x in leaves])
    return out


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 5, **kwargs):
    """Steady-state seconds/call of a jitted fn (compiles on the warmup call)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    force_sync(out)
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (open with TensorBoard or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

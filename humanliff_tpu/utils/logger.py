"""Key-value training logger with human/CSV/JSON sinks.

Functional equivalent of the reference's OpenAI-baselines logger
(improved_diffusion/logger.py): ``logkv``/``logkv_mean`` accumulate per-interval
values, ``dumpkvs`` flushes to every configured sink, ``profile_kv`` times blocks
into ``wait_<name>`` keys. A TensorBoard sink attaches when tensorflow is importable.
"""

from __future__ import annotations

import contextlib
import csv
import json
import os
import sys
import time
from collections import defaultdict
from typing import Dict, List, Optional, TextIO


class _HumanSink:
    def __init__(self, f: TextIO):
        self.f = f

    def write(self, kvs: Dict[str, float], step: int):
        items = sorted(kvs.items())
        width = max((len(k) for k, _ in items), default=1)
        lines = [f"| {k.ljust(width)} | {v:<12.6g} |" for k, v in items]
        sep = "-" * (width + 20)
        self.f.write(f"{sep}\nstep {step}\n" + "\n".join(lines) + f"\n{sep}\n")
        self.f.flush()


class _JsonSink:
    def __init__(self, path: str):
        self.f = open(path, "a")

    def write(self, kvs: Dict[str, float], step: int):
        self.f.write(json.dumps({"step": step, **kvs}) + "\n")
        self.f.flush()


class _CsvSink:
    def __init__(self, path: str):
        self.path = path
        self.keys: List[str] = []

    def write(self, kvs: Dict[str, float], step: int):
        new_keys = [k for k in kvs if k not in self.keys]
        if new_keys:
            self.keys += new_keys
            rows = []
            if os.path.exists(self.path):
                with open(self.path) as f:
                    rows = list(csv.reader(f))[1:]
            with open(self.path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["step"] + self.keys)
                for r in rows:
                    w.writerow(r + [""] * (len(self.keys) + 1 - len(r)))
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(
                [step] + [kvs.get(k, "") for k in self.keys]
            )


class _TensorBoardSink:
    def __init__(self, logdir: str):
        import tensorflow as tf  # gated: only when TB requested & tf available

        self.writer = tf.summary.create_file_writer(logdir)
        self.tf = tf

    def write(self, kvs: Dict[str, float], step: int):
        with self.writer.as_default():
            for k, v in kvs.items():
                self.tf.summary.scalar(k, v, step=step)
            self.writer.flush()


class KVLogger:
    def __init__(self, logdir: Optional[str] = None, formats: Optional[List[str]] = None):
        self.logdir = logdir
        if logdir:
            os.makedirs(logdir, exist_ok=True)
        formats = formats if formats is not None else ["stdout", "csv", "json"]
        self.sinks = []
        for fmt in formats:
            if fmt == "stdout":
                self.sinks.append(_HumanSink(sys.stdout))
            elif fmt == "json" and logdir:
                self.sinks.append(_JsonSink(os.path.join(logdir, "progress.json")))
            elif fmt == "csv" and logdir:
                self.sinks.append(_CsvSink(os.path.join(logdir, "progress.csv")))
            elif fmt == "tensorboard" and logdir:
                try:
                    self.sinks.append(_TensorBoardSink(os.path.join(logdir, "tb")))
                except Exception:
                    pass
        self._vals: Dict[str, float] = {}
        self._counts: Dict[str, int] = defaultdict(int)

    def logkv(self, key: str, value: float):
        self._vals[key] = float(value)
        self._counts[key] = 1

    def logkv_mean(self, key: str, value: float):
        n = self._counts[key]
        self._vals[key] = (self._vals.get(key, 0.0) * n + float(value)) / (n + 1)
        self._counts[key] = n + 1

    def dumpkvs(self, step: int = 0) -> Dict[str, float]:
        out = dict(self._vals)
        for s in self.sinks:
            s.write(out, step)
        self._vals.clear()
        self._counts.clear()
        return out


_CURRENT: Optional[KVLogger] = None


def configure(logdir: Optional[str] = None, formats: Optional[List[str]] = None) -> KVLogger:
    global _CURRENT
    _CURRENT = KVLogger(logdir, formats)
    return _CURRENT


def _get() -> KVLogger:
    global _CURRENT
    if _CURRENT is None:
        _CURRENT = KVLogger(None, ["stdout"])
    return _CURRENT


def logkv(key: str, value: float):
    _get().logkv(key, value)


def logkv_mean(key: str, value: float):
    _get().logkv_mean(key, value)


def dumpkvs(step: int = 0):
    return _get().dumpkvs(step)


@contextlib.contextmanager
def profile_kv(name: str):
    t0 = time.time()
    try:
        yield
    finally:
        _get().logkv_mean(f"wait_{name}", time.time() - t0)

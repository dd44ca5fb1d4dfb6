"""Checkpointing: orbax for train states + the file-based stage-1 -> stage-2 contract.

Reference artifacts being mirrored (SURVEY.md §5):
- Stage-1 shared: ``{step:06d}`` checkpoint holding step, decoder params, the full
  tri-plane table, and optimizer state (run_nerf_batch.py:321-330).
- Stage-1 fine-tune: per-subject tri-plane-only files ``{human}_{step:06d}.npz``
  (run_nerf_batch_ft.py:323-333).
- Stage-2: model / per-rate EMA / optimizer (train_util.py:312-335); EMA params are
  what sampling consumes.
- Sampling chain: per-layer ``samples_*.npz`` consumed as next-layer conditioning
  (triplane_sample_layered.py:229-244).
"""

from __future__ import annotations

import os
import re
import threading
import time
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(base: str) -> str:
    return os.path.abspath(base)


def save_state(ckpt_dir: str, step: int, state: Any) -> str:
    """Save a full train state (any pytree) under ckpt_dir/step.

    Idempotent per step: a COMPLETE checkpoint that already exists for this step
    is kept (a final save at an i_weights multiple would otherwise collide). A
    directory without orbax's commit marker is a partial save from a crashed
    run — it is deleted and re-saved rather than silently trusted."""
    path = os.path.join(_path(ckpt_dir), f"{step:06d}")
    if os.path.exists(path):
        if os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
            print(f"[checkpoint] step {step} already saved, keeping {path}")
            return path
        import shutil

        print(f"[checkpoint] removing partial checkpoint at {path}, re-saving")
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    # Heartbeat while the save reads the state back through the tunnel: a
    # flagship light save is ~12 min of device_get during which neither the
    # log nor /proc rchar moves (tunnel readback is not a read() syscall), so
    # the wedge supervisor (scripts/supervise.sh: log stale AND rchar frozen
    # > STALL_S) would SIGTERM a healthy save. Bounded at 45 beats so a save
    # that is TRULY wedged eventually goes quiet and the supervisor fires.
    stop = threading.Event()
    t0 = time.time()

    def _beat():
        n = 0
        while not stop.wait(60.0) and n < 45:
            n += 1
            print(f"[checkpoint] save in progress ({int(time.time() - t0)}s)",
                  flush=True)

    th = threading.Thread(target=_beat, daemon=True)
    th.start()
    try:
        ckptr.save(path, jax.tree.map(np.asarray, _strip_static(state)))
        ckptr.wait_until_finished()
    finally:
        stop.set()
        th.join(timeout=2.0)
    return path


def restore_state(ckpt_dir: str, step: Optional[int] = None, target: Any = None):
    """Restore the given (or latest) step. Returns (pytree, step) or (None, 0)."""
    base = _path(ckpt_dir)
    if step is None:
        step = latest_step(base)
        if step is None:
            return None, 0
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(base, f"{step:06d}")
    tgt = None if target is None else jax.tree.map(np.asarray, _strip_static(target))
    restored = ckptr.restore(path, tgt)
    return restored, step


def get_field(restored: Any, name: str):
    """Field access that works for both dataclass states and raw-dict restores
    (orbax returns a plain dict when no target pytree is given)."""
    if isinstance(restored, dict):
        return restored[name]
    return getattr(restored, name)


def get_ema(restored: Any, rate_str: str):
    """EMA params for ``rate_str``, with a single-rate fallback.

    Checkpoints are keyed by the rate string they were TRAINED with
    (train_util.py:312-335 names files ema_{rate}_{step}.pt the same way); a
    caller configured for a different rate (e.g. scoring an old 0.9999
    checkpoint after the campaign default moved to 0.999) would otherwise die
    on a bare KeyError. When exactly one rate exists, use it with a warning;
    with several, raise listing what's available. Returns (params, rate_used).
    """
    ema = get_field(restored, "ema_params")
    if rate_str in ema:
        return ema[rate_str], rate_str
    rates = sorted(ema.keys())
    if len(rates) == 1:
        print(f"[checkpoint] WARNING: no EMA({rate_str}) in checkpoint; "
              f"falling back to the only rate present, EMA({rates[0]})")
        return ema[rates[0]], rates[0]
    raise KeyError(
        f"EMA rate {rate_str!r} not in checkpoint (available: {rates}); "
        "pass --ema_rate matching the training run"
    )


def latest_step(ckpt_dir: str) -> Optional[int]:
    base = _path(ckpt_dir)
    if not os.path.isdir(base):
        return None
    steps = [
        int(m.group(1))
        for f in os.listdir(base)
        if (m := re.fullmatch(r"(\d{6})", f))
    ]
    return max(steps) if steps else None


def _strip_static(state: Any) -> Any:
    """Drop non-pytree/static fields (e.g. the optax tx) for serialization."""
    if hasattr(state, "replace") and hasattr(state, "tx"):
        try:
            return state.replace(tx=None)
        except Exception:
            return state
    return state


# ---------------- stage-1 <-> stage-2 file contract ----------------


def save_decoder_npz(path: str, decoder_params: Any, step: int = 0) -> None:
    """Compact decoder-only sidecar (~100 KB vs the ~200 MB full state).

    Orbax train states carry the Adam moments for the full plane table and are
    routinely pruned/lost; the per-subject plane exports carry no decoder
    (run_nerf_batch_ft.py:323-333). This sidecar makes the (plane exports,
    decoder npz) pair self-sufficient: cli/recon_refit --refit_steps 0
    reassembles a working checkpoint from them with no retraining."""
    def _kp_str(k):
        # DictKey has .key, SequenceKey has .idx; dict-only trees round-trip
        # (flax param dicts are), sequence nodes reload as dicts of indices.
        return str(getattr(k, "key", getattr(k, "idx", k)))

    flat = {
        "/".join(_kp_str(k) for k in kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(decoder_params)[0]
    }
    np.savez_compressed(path, __global_step__=step, **flat)


def load_decoder_npz(path: str) -> Any:
    """Rebuild the nested decoder param dict saved by save_decoder_npz."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            if key == "__global_step__":
                continue
            node = out
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = z[key]
    return out


def save_subject_planes(path: str, planes: np.ndarray, step: int) -> None:
    """Per-subject tri-plane artifact: (4, 3, C3, D, D) -> {human}_{step:06d}.npz."""
    np.savez_compressed(path, tri_planes=np.asarray(planes), global_step=step)


def load_subject_planes(path: str) -> np.ndarray:
    with np.load(path) as z:
        return z["tri_planes"]


def save_samples_npz(path: str, samples: np.ndarray) -> None:
    """Layer-sampling output; the next layer's x_cond input (arr_0 convention)."""
    np.savez(path, samples)


def load_samples_npz(path: str) -> np.ndarray:
    with np.load(path) as z:
        return z[z.files[0]]

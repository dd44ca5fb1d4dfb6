"""Runtime setup shared by all entry points.

- Persistent XLA compilation cache (the flagship UNet compiles in ~1 min; repeated
  CLI invocations reuse it).
- Optional platform override (HL_PLATFORM=cpu) that also defeats sitecustomize
  re-pinning.
- Optional NaN tripwire (HL_DEBUG_NANS=1) — the reference left
  torch.autograd.set_detect_anomaly(True) on globally (lib/fields.py:2); here it is
  opt-in via jax_debug_nans.
"""

from __future__ import annotations

import os

import jax


def setup_runtime(cache_dir: str = "~/.cache/humanliff_xla") -> None:
    if os.environ.get("HL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["HL_PLATFORM"])
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs
    if os.environ.get("HL_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    # SIGUSR1 -> dump all thread stacks to stderr. Long remote-compile RPCs on
    # a tunneled backend are indistinguishable from hangs without this.
    try:
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except Exception:
        pass

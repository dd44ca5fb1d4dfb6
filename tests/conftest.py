"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-native way to test pjit/shard_map collectives without TPU hardware
(see SURVEY.md §4). The environment may pin a TPU platform plugin via sitecustomize,
so we override both the env vars and the live jax config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache for the CPU test mesh: the suite is dominated
# by XLA compile time (dozens of distinct train/render/sampling programs),
# not by the actual step math — warm-cache reruns skip nearly all of it.
# Keyed automatically by jaxlib version + flags, so it never serves stale
# executables; safe to delete at any time.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", jax.devices()

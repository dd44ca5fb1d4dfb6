"""Mesh + sharding strategy.

TPU-native replacement for the reference's NCCL/DDP stack (dist_util.py, DDP wraps in
run_nerf_batch.py:114-118 and train_util.py:105-122):

- One ``jax.sharding.Mesh`` with a ``data`` axis (ICI within a slice, DCN across
  slices via ``jax.distributed.initialize`` on multihost).
- Batches shard on ``data``; model params replicate. Gradient allreduce is the psum
  XLA inserts under jit — no DDP hooks.
- The Stage-1 tri-plane table ``(N, 4, 3, C3, D, D)`` shards by INSTANCE on the data
  axis: each step's gather pulls only the batch's instances over ICI and the scatter
  of their gradients goes back the same way — unlike the reference, which allreduces
  the full table every step (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(**kwargs) -> None:
    """Multi-host runtime init (the reference's NCCL env-var setup_dist,
    dist_util.py:52-62, becomes one call). No-op when single-process.

    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars fill in the arguments
    jax's own auto-detection only covers for SLURM/MPI launchers — the
    jax-native spelling of the reference's RANK/WORLD_SIZE/MASTER_ADDR env
    contract (run_nerf_batch.py:163-173). Exercised for real by
    tests/test_multihost.py (two CPU-backend processes + localhost
    coordinator)."""
    import os

    env = os.environ
    if "JAX_COORDINATOR_ADDRESS" not in env and not kwargs:
        return
    for arg, env_key in (
        ("num_processes", "JAX_NUM_PROCESSES"),
        ("process_id", "JAX_PROCESS_ID"),
    ):
        if arg not in kwargs and env_key in env:
            kwargs[arg] = int(env[env_key])
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Place a host batch with its leading axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_stage1_params(params: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Tri-plane table sharded by instance; decoder replicated."""
    plane_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    out = dict(params)
    out["planes"] = jax.device_put(params["planes"], plane_sharding)
    out["decoder"] = jax.tree.map(
        lambda x: jax.device_put(x, replicated), params["decoder"]
    )
    return out


def _largest_divisible_axis_spec(shape, n: int, axis_name: str):
    """PartitionSpec sharding the largest axis divisible by ``n`` (else replicate)."""
    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and d >= n and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def zero_sharding(leaf, mesh: Mesh, axis_name: str = "data"):
    """ZeRO-style sharding for one optimizer/EMA leaf: partition its largest
    mesh-divisible axis across ``data`` (replicate scalars/small leaves)."""
    shape = getattr(leaf, "shape", ())
    return NamedSharding(
        mesh, _largest_divisible_axis_spec(shape, mesh.devices.size, axis_name)
    )


def stage2_zero_shardings(state, mesh: Mesh, axis_name: str = "data"):
    """Sharding pytree for a Stage2State under ZeRO-1 partitioning.

    Params (used by every forward) and the step/sampler scalars replicate;
    Adam moments and EMA copies — the bulk of the 497M-param flagship's 10 GB
    state floor — shard across the data axis. XLA computes the optimizer update
    shard-wise and all-gathers only the param update, which is exactly the
    ZeRO-1 communication pattern; per-chip state drops from ~10 GB to
    ~4 GB + 6 GB / n_devices, doubling the trainable per-chip batch.

    Reference accounting of what state exists: train_util.py:92-103.
    """
    repl = NamedSharding(mesh, P())

    def shard_tree(tree):
        return jax.tree.map(lambda l: zero_sharding(l, mesh, axis_name), tree)

    def repl_tree(tree):
        return jax.tree.map(lambda _: repl, tree)

    return state.replace(
        step=repl,
        params=repl_tree(state.params),
        opt_state=shard_tree(state.opt_state),
        ema_params=shard_tree(state.ema_params),
        sampler_state=(
            None if state.sampler_state is None else repl_tree(state.sampler_state)
        ),
    )


def place_with_shardings(tree, shardings):
    """Device-put every leaf of ``tree`` onto its matching sharding leaf."""
    return jax.tree.map(jax.device_put, tree, shardings)


def zero_parallel_jit(fn, mesh: Mesh, state_shardings, axis_name: str = "data",
                      **jit_kwargs):
    """jit a (state, batch, key) step with ZeRO-sharded optimizer/EMA state."""
    repl = NamedSharding(mesh, P())
    batch_s = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        fn,
        in_shardings=(state_shardings, batch_s, repl),
        out_shardings=(state_shardings, repl),
        **jit_kwargs,
    )


def data_parallel_jit(fn, mesh: Mesh, axis_name: str = "data", **jit_kwargs):
    """jit with explicit data-parallel in/out shardings for a (state, batch, key)
    step function: state replicated, batch sharded on its leading axis."""
    state_s = NamedSharding(mesh, P())
    batch_s = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        fn,
        in_shardings=(state_s, batch_s, state_s),
        out_shardings=(state_s, state_s),
        **jit_kwargs,
    )

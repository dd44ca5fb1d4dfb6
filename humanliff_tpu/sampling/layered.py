"""Layer-wise progressive generation (reference: scripts/triplane_sample_layered.py).

Layer k is generated with class label y=k, conditioned on layer k-1's generated
tri-plane via the ControlNet branch (zeros for k=0; :124-134). The reference chains
runs through per-layer npz files; here ``generate_all_layers`` runs the whole chain
in-process (the npz contract is still available via train/checkpoint.py for
cross-process parity).

The denoise loop is a single compiled ``lax.scan`` per layer; generated planes decode
to images through the frozen Stage-1 renderer.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from humanliff_tpu.diffusion.gaussian import GaussianDiffusion

LAYER_NAMES: List[str] = [
    "person",
    "person_pant",
    "person_pant_shirt",
    "person_pant_shirt_shoes",
]


def planes_image_to_triplane(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3*C3) NHWC sample -> (3, C3, H, W) renderer planes.

    Channel layout is plane-major (the reference squeezes (3, 9, D, D) into 27,
    triplane_datasets.py:110-111).
    """
    H, W, C = x.shape
    return x.transpose(2, 0, 1).reshape(3, C // 3, H, W)


def triplane_to_planes_image(planes: jnp.ndarray) -> jnp.ndarray:
    """(3, C3, H, W) -> (H, W, 3*C3) NHWC diffusion image."""
    n, c3, H, W = planes.shape
    return planes.reshape(n * c3, H, W).transpose(1, 2, 0)


@partial(
    jax.jit,
    static_argnames=("model", "diffusion", "shape", "use_ddim", "clip_denoised"),
)
def _sample_layer_jit(
    model, diffusion, params, x_cond, y, key, shape, use_ddim, clip_denoised
):
    """One fully-jitted per-layer denoise chain.

    y and x_cond are traced ARGUMENTS (not closure constants), so all four layers
    share ONE compilation — running the scan un-jitted re-traced per layer and cost
    ~9x wall-clock (276 s vs ~31 s for a 4-layer chain on a v5e chip).
    """

    def model_fn(x, ts, xc, y=y):
        return model.apply(params, x, ts, xc, y)

    loop = diffusion.ddim_sample_loop if use_ddim else diffusion.p_sample_loop
    return loop(
        model_fn,
        shape,
        key,
        x_cond=x_cond,
        clip_denoised=clip_denoised,
        model_kwargs={"y": y},
    )


def generate_layer(
    model,
    params,
    diffusion: GaussianDiffusion,
    layer_idx: int,
    x_cond: Optional[jnp.ndarray],
    key: jax.Array,
    batch_size: int,
    image_size: int,
    channels: int,
    use_ddim: bool = False,
    clip_denoised: bool = True,
    progress_fn: Optional[Callable[[int], None]] = None,
    parallel_window: int = 0,
    parallel_tol: float = 5e-3,
    parallel_mesh=None,
) -> jnp.ndarray:
    """Sample one layer's tri-planes: (B, H, W, C) in [-1, 1].

    ``parallel_window > 0`` routes through the sliding-window Picard sampler
    (sampling/parallel.py) — an opt-in accelerator whose payoff is sharding the
    window across a multi-chip mesh; the default stays the reference-parity
    sequential scan.
    """
    shape = (batch_size, image_size, image_size, channels)
    if x_cond is None:
        x_cond = jnp.zeros(shape, jnp.float32)
    y = jnp.full((batch_size,), layer_idx, jnp.int32)
    if parallel_window and use_ddim:
        raise ValueError("parallel_window implements the ancestral (DDPM) chain; "
                         "it cannot be combined with use_ddim")
    if parallel_window:
        from humanliff_tpu.sampling.parallel import parallel_p_sample_loop

        samples, _ = parallel_p_sample_loop(
            diffusion, model, params, shape, key, x_cond, y,
            window=parallel_window, tol=parallel_tol,
            clip_denoised=clip_denoised, mesh=parallel_mesh,
        )
        return samples
    return _sample_layer_jit(
        model, diffusion, params, x_cond, y, key, shape, use_ddim, clip_denoised
    )


# LRU-bounded (each cached wrapper closes over its model, so ids of LIVE
# entries can never be reused; eviction drops the pin and any jit compilation
# cache entries keyed on the wrapper). Models here are flax module DEFINITIONS
# (small config dataclasses, no params), so the bound is about executable
# lifetime, not memory pressure — params always ride in the Partial as traced
# arguments.
_MODEL_APPLY_CACHE: OrderedDict = OrderedDict()
_MODEL_APPLY_CACHE_MAX = 8


def _model_apply_fn(model):
    """Stable-identity ``apply(params, x, ts, xc, y)`` wrapper per model, so
    ``jax.tree_util.Partial(fn, params)`` keeps one jit treedef across
    layers/batches (the cache entry also keeps ``model`` alive, so ids never
    collide while cached)."""
    fn = _MODEL_APPLY_CACHE.get(id(model))
    if fn is not None:
        _MODEL_APPLY_CACHE.move_to_end(id(model))
        return fn

    def fn(params, x, ts, xc, y):
        return model.apply(params, x, ts, xc, y)

    _MODEL_APPLY_CACHE[id(model)] = fn
    while len(_MODEL_APPLY_CACHE) > _MODEL_APPLY_CACHE_MAX:
        _MODEL_APPLY_CACHE.popitem(last=False)
    return fn


def generate_layer_progressive(
    model,
    params,
    diffusion: GaussianDiffusion,
    layer_idx: int,
    x_cond: Optional[jnp.ndarray],
    key: jax.Array,
    batch_size: int,
    image_size: int,
    channels: int,
    record_every: int = 10,
    use_ddim: bool = False,
    clip_denoised: bool = True,
):
    """Sample one layer while recording the denoise trajectory.

    Returns ``(samples, traj)`` where ``traj`` is a list of
    ``(t, pred_xstart numpy)`` snapshots every ``record_every`` steps (plus the
    final step) — the jax form of the reference's yield-per-step
    ``p_sample_loop_progressive`` (gaussian_diffusion.py:445-482), used for
    visualization/debugging of the chain.

    Params ride in a ``jax.tree_util.Partial`` (traced jit arguments — a plain
    closure would embed them as HLO constants and stall remote compiles), and
    each step is synced by a scalar readback: the tunneled executor wedges
    when dispatch runs ahead, and this debug path values robustness over the
    ~35 ms/step readback cost.
    """
    import numpy as np

    shape = (batch_size, image_size, image_size, channels)
    if x_cond is None:
        x_cond = jnp.zeros(shape, jnp.float32)
    y = jnp.full((batch_size,), layer_idx, jnp.int32)

    model_fn = jax.tree_util.Partial(_model_apply_fn(model), params)

    loop = (
        diffusion.ddim_sample_loop_progressive
        if use_ddim
        else diffusion.p_sample_loop_progressive
    )
    traj = []
    x = None
    T = diffusion.num_timesteps
    for i, out in enumerate(
        loop(model_fn, shape, key, x_cond=x_cond, clip_denoised=clip_denoised,
             model_kwargs={"y": y})
    ):
        x = out["sample"]
        float(x.ravel()[0])  # strictly-serial dispatch (tunnel wedge safety)
        t = T - 1 - i
        if i % max(record_every, 1) == 0 or t == 0:
            traj.append((t, np.asarray(out["pred_xstart"])))
    return x, traj


def generate_layer_sharded(
    model,
    params,
    diffusion: GaussianDiffusion,
    layer_idx: int,
    x_cond: Optional[jnp.ndarray],
    key: jax.Array,
    batch_size: int,
    image_size: int,
    channels: int,
    mesh,
    use_ddim: bool = False,
    clip_denoised: bool = True,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Mesh-parallel layer sampling: the batch shards across ``mesh``'s data
    axis (params replicated) and the result is gathered back to full
    replication — the jax-native form of the reference's cross-rank sample
    all_gather (triplane_sample_layered.py:211-219).

    The denoise math is identical to :func:`generate_layer` (the PRNG stream is
    sharding-independent), so sharded and single-device sampling agree
    numerically — proven in tests/test_parallel.py on the 8-device CPU mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if batch_size % mesh.devices.size != 0:
        raise ValueError(
            f"batch_size {batch_size} must divide over {mesh.devices.size} devices"
        )
    data = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    shape = (batch_size, image_size, image_size, channels)
    if x_cond is None:
        x_cond = jnp.zeros(shape, jnp.float32)
    x_cond = jax.device_put(x_cond, data)
    y = jax.device_put(jnp.full((batch_size,), layer_idx, jnp.int32), data)
    params = jax.tree.map(lambda p: jax.device_put(p, repl), params)

    samples = _sample_layer_jit(
        model, diffusion, params, x_cond, y, key, shape, use_ddim, clip_denoised
    )
    return jax.device_put(samples, repl)  # gather: every device holds all samples


# Measured single-chip per-layer chain costs (seconds for one 250-step DDPM
# layer chain at the flagship 256x256x27 geometry, BENCH_r03): B=1 5.5 s,
# B=8 38.1 s. Only B=1 and B=8 are clean operating points — B=2..7 hit the
# XLA conv-tiling pathology (docs/BATCH_PATHOLOGY.md), so the planner never
# proposes them unless the caller supplies measured costs for them.
DEFAULT_CHAIN_COSTS: Dict[int, float] = {1: 5.5, 8: 38.1}


def plan_workload(num_samples: int,
                  chain_costs: Optional[Dict[int, float]] = None) -> List[int]:
    """Optimal partition of an N-sample workload into per-chain batch sizes.

    The reference's sample script runs 25 subjects x 4 layers strictly at B=1
    (triplane_scripts/SynBody_triplane_sample_layered_*.sh); pure B=8 batching
    loses on N=25 because 25 pads to 4 full chains (32 samples' work). This
    solves the covering problem exactly by DP: ``cost[n]`` = cheapest set of
    chains whose batch sizes sum to >= n (overshoot = padded samples, allowed),
    drawn from the measured ``chain_costs`` table. For the 25x4 workload the
    plan is [8, 8, 8, 1] — ~9% faster than naive B=1 and ~17% faster than pure
    B=8 (VERDICT r3 item 4).

    Returns the list of batch sizes, largest first.
    """
    costs = dict(chain_costs or DEFAULT_CHAIN_COSTS)
    if num_samples <= 0:
        return []
    best = [0.0] + [float("inf")] * num_samples
    choice = [0] * (num_samples + 1)
    for n in range(1, num_samples + 1):
        for b, c in costs.items():
            prev = best[max(n - b, 0)] + c
            if prev < best[n]:
                best[n] = prev
                choice[n] = b
    plan = []
    n = num_samples
    while n > 0:
        plan.append(choice[n])
        n = max(n - choice[n], 0)
    return sorted(plan, reverse=True)


def generate_workload(
    model,
    params,
    diffusion: GaussianDiffusion,
    key: jax.Array,
    num_samples: int,
    image_size: int = 256,
    channels: int = 27,
    num_layers: int = 4,
    use_ddim: bool = False,
    chain_costs: Optional[Dict[int, float]] = None,
) -> Dict[str, jnp.ndarray]:
    """N-sample 4-layer generation under the mixed-batch plan.

    Runs chain-major (each planned group completes its full layer chain before
    the next group starts): per-sample conditioning stays within the group, the
    two jitted programs (B=1, B=8) are each compiled once, and peak memory is
    one group's chain. Padded lanes in the final group are computed and
    discarded. Returns {layer_name: (num_samples, H, W, C)}.
    """
    import numpy as np

    plan = plan_workload(num_samples, chain_costs)
    per_layer: Dict[str, list] = {}
    produced = 0
    for B in plan:
        take = min(B, num_samples - produced)
        if take <= 0:
            break
        key, sub = jax.random.split(key)
        out = generate_all_layers(
            model, params, diffusion, sub, batch_size=B,
            image_size=image_size, channels=channels, num_layers=num_layers,
            use_ddim=use_ddim,
        )
        for name, arr in out.items():
            per_layer.setdefault(name, []).append(np.asarray(arr[:take]))
        produced += take
    return {
        name: jnp.asarray(np.concatenate(parts, axis=0))
        for name, parts in per_layer.items()
    }


def generate_all_layers(
    model,
    params,
    diffusion: GaussianDiffusion,
    key: jax.Array,
    batch_size: int = 1,
    image_size: int = 256,
    channels: int = 27,
    num_layers: int = 4,
    use_ddim: bool = False,
    mesh=None,
    parallel_window: int = 0,
    parallel_tol: float = 5e-3,
    parallel_mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Run the full 4-layer progressive chain; returns {layer_name: (B, H, W, C)}.

    With ``mesh``, each layer's batch shards across the mesh's data axis and the
    chain conditions on the gathered previous layer."""
    out: Dict[str, jnp.ndarray] = {}
    x_cond = None
    for k in range(num_layers):
        key, sub = jax.random.split(key)
        if mesh is not None:
            samples = generate_layer_sharded(
                model, params, diffusion, k, x_cond, sub,
                batch_size, image_size, channels, mesh, use_ddim,
            )
        else:
            samples = generate_layer(
                model, params, diffusion, k, x_cond, sub,
                batch_size, image_size, channels, use_ddim,
                parallel_window=parallel_window, parallel_tol=parallel_tol,
                parallel_mesh=parallel_mesh,
            )
        out[LAYER_NAMES[k] if k < len(LAYER_NAMES) else f"layer_{k}"] = samples
        x_cond = samples
    return out

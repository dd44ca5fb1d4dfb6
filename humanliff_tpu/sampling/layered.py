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

"""Parallel-in-time (sliding-window Picard) ancestral sampling.

The DDPM chain is sequential: 250 respaced UNet calls, each waiting for the
previous (p_sample_loop). At batch 1 the flagship UNet leaves MXU throughput on
the table, so wall-clock can be traded against batched compute: guess a WINDOW
of future states, evaluate all of their denoise steps as ONE batched model call,
and accept the prefix of the window whose guesses were already accurate
(ParaDiGMS — Shih et al. 2023, "Parallel Sampling of Diffusion Models"; see also
arXiv 2402.09970). Each iteration advances at least one step (slot 0's input is
exact, so its output is the true next state); converged guesses let it advance
several.

Correctness: with per-timestep noises fixed (``fold_in(key, t)``), tolerance ->
0 reproduces the sequential chain exactly (verified in tests/test_parallel_
sampling.py); practical tolerances trade a bounded per-step deviation for
wall-clock. This is an opt-in accelerator — the default path remains the
reference-parity lax.scan loop (sampling/layered.py).

TPU notes: the whole window evaluates as one (W*B)-batch UNet call (MXU
utilization rises with batch); the window state stays device-resident; only the
W per-slot residual scalars cross the tunnel each iteration.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@partial(
    jax.jit,
    static_argnames=("diffusion", "model", "window", "clip_denoised", "class_cond"),
)
def _window_step(
    diffusion,
    model,
    params,
    X,          # (W, B, ...) guesses: X[i] estimates x_{t0 - i}
    t0,         # scalar int32 — the exact head's timestep
    x_cond,     # (B, ...) or None-like zeros
    y,          # (B,) int32
    base_key,
    window: int,
    clip_denoised: bool,
    class_cond: bool,
):
    """One Picard iteration: cand[i] = f_{t0-i}(X[i]) for every window slot.

    Returns (cand (W, B, ...), resid (W-1,)) where resid[i] compares cand[i]
    (the refreshed estimate of x_{t0-i-1}) against the previous guess X[i+1].
    """
    W = window
    B = X.shape[1]
    ts = jnp.maximum(t0 - jnp.arange(W, dtype=jnp.int32), 0)  # (W,)
    flat = X.reshape((W * B,) + X.shape[2:])
    t_flat = jnp.repeat(ts, B)
    xc_flat = jnp.broadcast_to(x_cond, (W,) + x_cond.shape).reshape(flat.shape)
    kwargs: Dict[str, Any] = {}
    if class_cond:
        kwargs["y"] = jnp.broadcast_to(y, (W, B)).reshape(-1)

    def model_fn(x, tt, xc, **kw):
        return model.apply(params, x, tt, xc, **kw)

    out = diffusion.p_mean_variance(
        model_fn, flat, t_flat, xc_flat, clip_denoised, kwargs
    )

    # Per-absolute-timestep noise: the trajectory is a pure function of
    # (base_key, t), independent of window scheduling.
    def slot_noise(t):
        return jax.random.normal(
            jax.random.fold_in(base_key, t), (B,) + X.shape[2:], X.dtype
        )

    z = jax.vmap(slot_noise)(ts)  # (W, B, ...)
    nonzero = (t_flat != 0).astype(flat.dtype).reshape(-1, *([1] * (flat.ndim - 1)))
    cand_flat = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * z.reshape(
        flat.shape
    )
    cand = cand_flat.reshape(X.shape)

    prev_guess = X[1:]  # old estimates of x_{t0-1} .. x_{t0-W+1}
    # Per-SAMPLE mean deviation, max over the batch: one bad trajectory must
    # not be accepted because its co-samples already converged.
    per_sample = jnp.mean(
        jnp.abs(cand[:-1] - prev_guess), axis=tuple(range(2, X.ndim))
    )  # (W-1, B)
    resid = per_sample.max(axis=-1)
    return cand, resid


@partial(jax.jit, static_argnames=("window",), donate_argnums=(0,))
def _slide(cand, k, window: int):
    """New window guesses after accepting ``k`` steps: X'[i] = cand[k-1+i],
    clamped to the last candidate for the not-yet-guessed tail."""
    idx = jnp.clip(k - 1 + jnp.arange(window), 0, window - 1)
    return jnp.take(cand, idx, axis=0)


def parallel_p_sample_loop(
    diffusion,
    model,
    params,
    shape,
    key: jax.Array,
    x_cond=None,
    y=None,
    window: int = 8,
    tol: float = 5e-3,
    clip_denoised: bool = True,
    class_cond: bool = True,
    max_iters: Optional[int] = None,
    mesh=None,
):
    """Ancestral sampling with sliding-window Picard iteration.

    Args mirror ``GaussianDiffusion.p_sample_loop``; ``window`` is the number of
    timesteps evaluated per batched model call, ``tol`` the mean-abs residual
    below which a guessed step is accepted (0.0 = strictly sequential result).
    Returns ``(samples (B, ...), n_model_calls)`` — samples equal a sequential
    chain driven by ``fold_in(key, t)`` per-step noises (exactly at tol=0).

    ``mesh``: shard the WINDOW axis across the mesh's data axis (params
    replicated). This is where the method actually pays: one v5e chip already
    runs the flagship UNet at ~0.47 MFU at batch 1, so a batched window buys
    little locally — but across N chips each iteration costs one per-chip
    batch-1 step plus ICI collectives, and every accepted guess beyond the
    first is a sequential step removed. Generation then scales past the
    single-chip sequential wall (the reference has no equivalent).
    """
    T = diffusion.num_timesteps
    W = min(window, T)
    k_init, k_noise = jax.random.split(key)
    x_init = jax.random.normal(k_init, shape)
    if x_cond is None:
        x_cond = jnp.zeros(shape, x_init.dtype)
    if y is None:
        y = jnp.zeros((shape[0],), jnp.int32)

    X = jnp.broadcast_to(x_init, (W,) + tuple(shape))  # all slots guess x_init
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if W % mesh.devices.size != 0:
            raise ValueError(f"window {W} must divide over {mesh.devices.size} devices")
        window_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        X = jax.device_put(X, window_sharding)
        params = jax.tree.map(lambda p: jax.device_put(p, repl), params)
        x_cond = jax.device_put(x_cond, repl)
        y = jax.device_put(y, repl)
    t0 = T - 1
    iters = 0
    budget = max_iters or 10 * T
    while t0 >= 0 and iters < budget:
        cand, resid = _window_step(
            diffusion, model, params, X, jnp.int32(t0), x_cond, y, k_noise,
            W, clip_denoised, class_cond,
        )
        iters += 1
        r = jax.device_get(resid)  # (W-1,) scalars — the only per-iter readback
        k = 1
        while k - 1 < r.shape[0] and r[k - 1] <= tol and k < t0 + 1:
            k += 1
        k = min(k, t0 + 1)
        if t0 - k < 0:
            # Slot t0 applied f_0: cand[t0] is the final sample.
            return cand[t0], iters
        X = _slide(cand, jnp.int32(k), W)
        t0 -= k
    raise RuntimeError("parallel sampler exceeded its iteration budget")

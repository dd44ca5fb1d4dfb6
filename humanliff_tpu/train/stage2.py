"""Stage-2 diffusion training loop (reference: improved_diffusion/train_util.py).

The jitted step fuses what the reference does across Python: timestep sampling
(optionally loss-aware), q_sample + UNet forward, microbatched gradient accumulation
(train_util.py:200-246 — a ``lax.scan`` over microbatches instead of ``no_sync()``
bookkeeping), value-clipped AdamW (:279-285), and EMA updates per rate (:97-103,
nn.py:55-65).

Mixed precision: instead of the reference's manual fp16 loss-scaling with NaN backoff
(fp16_util.py, train_util.py:252-266), activations run in bf16 under a simple cast
policy (TPU-native; no loss scaling needed) with fp32 params and fp32 norms.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from humanliff_tpu.diffusion.gaussian import GaussianDiffusion
from humanliff_tpu.diffusion.resample import (
    LossSecondMomentResampler,
    UniformSampler,
)
from humanliff_tpu.train.optim import make_stage2_optimizer


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    lr: float = 5e-5
    weight_decay: float = 0.0
    lr_anneal_steps: int = 0
    ema_rates: Tuple[float, ...] = (0.9999,)
    microbatch: int = 0  # 0 = no accumulation
    grad_clip_value: float = 0.5
    # Global-norm clip + NaN-zeroing: the implicit guard the reference's fp16
    # loss-scaler provides (skip-on-overflow) that bf16 training loses; one
    # unclipped catastrophic batch collapsed the round-5 flagship campaign
    # (see train/optim.py make_stage2_optimizer). 0 disables.
    grad_clip_norm: float = 1.0
    use_bf16: bool = False
    schedule_sampler: str = "uniform"
    class_cond: bool = True


class Stage2State(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Dict[str, Any]  # keyed by str(rate)
    sampler_state: Optional[Dict[str, jnp.ndarray]]
    tx: Any = struct.field(pytree_node=False)


def create_stage2_state(
    params: Any, cfg: Stage2Config, num_timesteps: int
) -> Stage2State:
    tx = make_stage2_optimizer(
        cfg.lr, cfg.weight_decay, cfg.lr_anneal_steps, cfg.grad_clip_value,
        cfg.grad_clip_norm,
    )
    sampler_state = None
    if cfg.schedule_sampler == "loss-second-moment":
        sampler_state = LossSecondMomentResampler(num_timesteps).init_state()
    # Own our buffers: train_step donates the state, so sharing leaves with the
    # caller's params would delete them out from under the caller.
    params = jax.tree.map(jnp.copy, params)
    return Stage2State(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params={str(r): jax.tree.map(jnp.copy, params) for r in cfg.ema_rates},
        sampler_state=sampler_state,
        tx=tx,
    )


def _update_ema(ema: Any, params: Any, rate: float) -> Any:
    return jax.tree.map(lambda e, p: e * rate + p * (1.0 - rate), ema, params)


@partial(jax.jit, static_argnames=("model", "diffusion", "cfg"), donate_argnums=0)
def train_step(
    state: Stage2State,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    model,
    diffusion: GaussianDiffusion,
    cfg: Stage2Config,
) -> Tuple[Stage2State, Dict[str, jnp.ndarray]]:
    """One optimization step.

    batch is either materialized — x (B,H,W,C), x_cond (B,H,W,C), y (B,) —
    or DEVICE-RESIDENT indexed: planes (N*L,H,W,C) living on device across
    steps, idx (B,) flat (subject, layer) indices, y (B,) = idx % L. The
    indexed form gathers (x, x_cond) inside this jit, so the host uploads
     16 bytes/step instead of 2 full plane images/item — on the tunneled
    single-chip setup the 28 MB/step batch upload dominated the 0.45 s
    compute (measured 2.2 s/step vs 0.5 s device-resident). x_cond is the
    previous layer (idx - 1 within the same subject), zero-masked at layer 0
    (triplane_datasets.py's cond convention).
    """
    if "planes" in batch:
        planes, idx, y = batch["planes"], batch["idx"], batch["y"]
        x = jnp.take(planes, idx, axis=0)
        prev = jnp.take(planes, idx - (y > 0).astype(idx.dtype), axis=0)
        x_cond = prev * (y > 0).astype(prev.dtype)[:, None, None, None]
        batch = {"x": x, "x_cond": x_cond, "y": y}
    B = batch["x"].shape[0]
    k_t, k_noise = jax.random.split(key)

    if cfg.schedule_sampler == "loss-second-moment":
        sampler = LossSecondMomentResampler(diffusion.num_timesteps)
        t, weights = sampler.sample(state.sampler_state, k_t, B)
    else:
        t, weights = UniformSampler(diffusion.num_timesteps).sample(k_t, B)

    compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    def model_fn_for(params):
        # bf16 policy: cast BOTH activations and params — fp32 params would promote
        # every conv/matmul back to fp32 compute. Norms/softmax stay fp32 inside
        # (GroupNorm32), matching the reference's fp16-torso recipe. Master params
        # and the optimizer remain fp32; gradients arrive fp32 via the cast's vjp.
        if cfg.use_bf16:
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32
                else p,
                params,
            )

        def model_fn(x, ts, x_cond, y=None):
            out = model.apply(
                params,
                x.astype(compute_dtype),
                ts,
                None if x_cond is None else x_cond.astype(compute_dtype),
                y,
                deterministic=True,
            )
            return out.astype(jnp.float32)

        return model_fn

    def per_example_losses(params, x, x_cond, y, t_mb, k):
        kwargs = {"y": y} if cfg.class_cond else {}
        terms = diffusion.training_losses(
            model_fn_for(params), x, x_cond, t_mb, k, model_kwargs=kwargs
        )
        return terms["loss"]

    if cfg.microbatch and cfg.microbatch < B:
        # Gradient accumulation: value_and_grad runs INSIDE the scan body and
        # grads accumulate in the carry, so activation memory is one microbatch
        # (differentiating through the scan would stack residuals for the full
        # batch and defeat the point of train_util.py:200-246's microbatching).
        n_micro = B // cfg.microbatch
        xs = batch["x"].reshape(n_micro, cfg.microbatch, *batch["x"].shape[1:])
        xcs = batch["x_cond"].reshape(
            n_micro, cfg.microbatch, *batch["x_cond"].shape[1:]
        )
        ys = batch["y"].reshape(n_micro, cfg.microbatch)
        ts = t.reshape(n_micro, cfg.microbatch)
        ws = weights.reshape(n_micro, cfg.microbatch)
        ks = jax.random.split(k_noise, n_micro)

        def micro_loss(params, x, xc, y, tm, w, k):
            losses = per_example_losses(params, x, xc, y, tm, k)
            return (losses * w).sum() / B, losses

        def micro_step(carry, inp):
            acc_grads, acc_loss = carry
            x, xc, y, tm, w, k = inp
            (l, losses), g = jax.value_and_grad(micro_loss, has_aux=True)(
                state.params, x, xc, y, tm, w, k
            )
            return (jax.tree.map(jnp.add, acc_grads, g), acc_loss + l), losses

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss), losses = jax.lax.scan(
            micro_step, (zero_grads, jnp.zeros(())), (xs, xcs, ys, ts, ws, ks)
        )
        per_ex_losses = losses.reshape(-1)
    else:

        def loss_fn(params):
            losses = per_example_losses(
                params, batch["x"], batch["x_cond"], batch["y"], t, k_noise
            )
            return (losses * weights).mean(), losses

        (loss, per_ex_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = {
        r: _update_ema(e, new_params, float(r)) for r, e in state.ema_params.items()
    }

    new_sampler_state = state.sampler_state
    if cfg.schedule_sampler == "loss-second-moment":
        sampler = LossSecondMomentResampler(diffusion.num_timesteps)
        new_sampler_state = sampler.update(
            state.sampler_state, t, jax.lax.stop_gradient(per_ex_losses)
        )

    grad_norm = optax.global_norm(grads)
    metrics = {
        "loss": loss,
        "mse": per_ex_losses.mean(),
        "grad_norm": grad_norm,
        # loss-quartile breakdown by diffusion time (train_util.py:391-397)
        **{
            f"loss_q{q}": jnp.where(
                (t >= q * diffusion.num_timesteps // 4)
                & (t < (q + 1) * diffusion.num_timesteps // 4),
                per_ex_losses,
                0.0,
            ).sum()
            / jnp.maximum(
                (
                    (t >= q * diffusion.num_timesteps // 4)
                    & (t < (q + 1) * diffusion.num_timesteps // 4)
                ).sum(),
                1,
            )
            for q in range(4)
        },
    }
    return (
        state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            sampler_state=new_sampler_state,
        ),
        metrics,
    )

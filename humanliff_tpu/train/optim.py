"""Optimizers and LR schedules for both stages.

Stage 1 uses the reference's two-group Adam (decoder lr 5e-3, tri-plane lr 1e-1,
run_nerf_batch.py:89) with its staged exponential decay (:281-297): decoder
``lr * 0.1^(step/(lrate_decay*600))``, planes ``lr * 0.5^(step/(lrate_decay*60))``,
both frozen after step 300k. Implemented as ``optax.multi_transform`` over param
labels instead of mutating param groups.

Stage 2 uses AdamW + the improved-diffusion linear warm-down (train_util.py:293-304):
lr annealed linearly to 0 over ``lr_anneal_steps`` (the reference's run scripts pair
lr=5e-5 with anneal to 1e-5 over the first 100k steps via ``fractional`` annealing).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax


def stage1_decoder_schedule(base_lr: float, lrate_decay: int = 500):
    decay_steps = lrate_decay * 600

    def schedule(step):
        s = jnp.minimum(step, 300_000)
        return base_lr * (0.1 ** (s / decay_steps))

    return schedule


def stage1_plane_schedule(base_lr: float, lrate_decay: int = 500):
    decay_steps = lrate_decay * 60

    def schedule(step):
        s = jnp.minimum(step, 300_000)
        return base_lr * (0.5 ** (s / decay_steps))

    return schedule


def make_stage1_optimizer(
    decoder_lr: float = 5e-3,
    plane_lr: float = 1e-1,
    lrate_decay: int = 500,
    freeze_decoder: bool = False,
) -> optax.GradientTransformation:
    """Two-group Adam over a params pytree ``{"decoder": ..., "planes": ...}``.

    ``freeze_decoder=True`` reproduces the fine-tune mode (run_nerf_batch_ft.py:124-129)
    where only the tri-planes update.
    """
    decoder_tx = (
        optax.set_to_zero()
        if freeze_decoder
        else optax.adam(stage1_decoder_schedule(decoder_lr, lrate_decay), b1=0.9, b2=0.999)
    )
    plane_tx = optax.adam(stage1_plane_schedule(plane_lr, lrate_decay), b1=0.9, b2=0.999)
    return optax.multi_transform(
        {"decoder": decoder_tx, "planes": plane_tx},
        param_labels={"decoder": "decoder", "planes": "planes"},
    )


def make_finetune_optimizer(plane_lr: float = 1e-1, decay_every: int = 500):
    """Fine-tune plane optimizer: lr halves every ``decay_every`` steps
    (run_nerf_batch_ft.py:294-299)."""

    def schedule(step):
        return plane_lr * (0.5 ** (step / decay_every))

    return optax.multi_transform(
        {"decoder": optax.set_to_zero(), "planes": optax.adam(schedule)},
        param_labels={"decoder": "decoder", "planes": "planes"},
    )


def stage2_lr_schedule(base_lr: float = 5e-5, anneal_steps: int = 0):
    """Linear warm-down to 0 over anneal_steps; constant if 0 (train_util.py:293-304)."""

    def schedule(step):
        if anneal_steps == 0:
            return base_lr
        frac = jnp.minimum(step / anneal_steps, 1.0)
        return base_lr * (1.0 - frac)

    return schedule


def make_stage2_optimizer(
    base_lr: float = 5e-5,
    weight_decay: float = 0.0,
    anneal_steps: int = 0,
    grad_clip_value: float = 0.5,
    grad_clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW with the reference's element-value grad clip (train_util.py:283)
    plus a global-norm clip + NaN-zeroing the reference gets implicitly from
    its fp16 loss-scaler's skip-on-overflow (fp16_util.py / train_util.py:
    252-266; bf16 needs no loss scaling, so that implicit guard vanished).

    Motivation (round-5 flagship campaign): one catastrophic batch at step
    ~5750 — window-mean grad_norm 6x normal, i.e. one step with post-value-clip
    GLOBAL norm ~100 — coherently perturbed all 497M params and collapsed the
    model to predicting 0 (loss pinned at E[eps^2]=1.0, grad_norm 0.07, no
    recovery over 300+ steps). Value clipping bounds elements, not the global
    norm; the norm clip caps such a step at ~5x a typical one. Order matters:
    value-clip maps Inf elements to finite, zero_nans removes NaNs, THEN the
    global-norm clip sees only finite values (a direct norm clip of an Inf
    gradient would turn it into NaN via inf * 0).
    """
    clips = []
    if grad_clip_value > 0:
        clips.append(optax.clip(grad_clip_value))  # clip_grad_value_, not norm
    clips.append(optax.zero_nans())
    if grad_clip_norm > 0:
        clips.append(optax.clip_by_global_norm(grad_clip_norm))
    return optax.chain(
        *clips,
        optax.adamw(stage2_lr_schedule(base_lr, anneal_steps), weight_decay=weight_decay),
    )


def clamp_planes(params: Any, lo: float = -1.0, hi: float = 1.0) -> Any:
    """Post-update clamp of the tri-plane table (run_nerf_batch.py:271-272)."""
    return {**params, "planes": jnp.clip(params["planes"], lo, hi)}

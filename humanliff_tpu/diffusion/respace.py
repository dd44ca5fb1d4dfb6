"""Timestep respacing (reference: improved_diffusion/respace.py).

``space_timesteps`` selects the retained original timesteps ("250", "ddim25", or
per-section counts); ``spaced_diffusion`` rebuilds betas over that subset and returns a
``GaussianDiffusion`` whose ``timestep_map`` remaps compact t -> original t inside
``scale_timesteps`` (respace.py:63-122 — the _WrappedModel becomes a field on the
diffusion object; callers never wrap models manually).
"""

from __future__ import annotations

from typing import Collection, Union

import numpy as np

from humanliff_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
)


def space_timesteps(num_timesteps: int, section_counts: Union[str, Collection[int]]):
    """Which of the ``num_timesteps`` original steps to retain.

    Accepts the reference's spec syntax (respace.py:7-60): ``"ddimN"`` keeps a
    fixed-stride subset of exactly N steps; ``"a,b,c"`` (or a list of ints)
    splits the schedule into near-equal sections — earlier sections absorb the
    remainder — and keeps that many evenly spaced steps within each.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            want = int(section_counts[len("ddim") :])
            for stride in range(1, num_timesteps):
                kept = range(0, num_timesteps, stride)
                if len(kept) == want:
                    return set(kept)
            raise ValueError(
                f"no integer stride over {num_timesteps} timesteps keeps "
                f"exactly {want} DDIM steps"
            )
        section_counts = [int(x) for x in section_counts.split(",")]

    n_sections = len(section_counts)
    base, extra = divmod(num_timesteps, n_sections)
    kept_steps: set = set()
    start = 0
    for i, count in enumerate(section_counts):
        size = base + (1 if i < extra else 0)
        if count > size:
            raise ValueError(
                f"section {i} spans only {size} timesteps; cannot keep {count}"
            )
        stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        # Accumulate (pos += stride) rather than multiply (j * stride): the two
        # differ at exact-.5 rounding boundaries and the reference accumulates —
        # this is load-bearing for retained-step parity (e.g. T=250, "25,25,25,25").
        offsets, pos = [], 0.0
        for _ in range(count):
            offsets.append(round(pos))
            pos += stride
        kept_steps.update(start + o for o in offsets)
        start += size
    return kept_steps


def spaced_diffusion(
    *,
    betas: np.ndarray,
    use_timesteps: Collection[int],
    model_mean_type: ModelMeanType = ModelMeanType.EPSILON,
    model_var_type: ModelVarType = ModelVarType.FIXED_LARGE,
    loss_type: LossType = LossType.MSE,
    rescale_timesteps: bool = True,
) -> GaussianDiffusion:
    """A GaussianDiffusion over the retained timestep subset (respace.py:63-107)."""
    use_timesteps = set(use_timesteps)
    base = GaussianDiffusion(
        betas=betas,
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )
    last_alpha_cumprod = 1.0
    new_betas = []
    timestep_map = []
    for i, ac in enumerate(base.alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - ac / last_alpha_cumprod)
            last_alpha_cumprod = ac
            timestep_map.append(i)
    return GaussianDiffusion(
        betas=np.array(new_betas, np.float64),
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
        timestep_map=np.array(timestep_map, np.int64),
        original_num_steps=len(betas),
    )


def create_diffusion(
    *,
    steps: int = 1000,
    learn_sigma: bool = False,
    sigma_small: bool = False,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    predict_xstart: bool = False,
    rescale_timesteps: bool = True,
    rescale_learned_sigmas: bool = True,
    timestep_respacing: str = "",
) -> GaussianDiffusion:
    """Factory mirroring script_util.create_gaussian_diffusion (script_util.py:260-298)."""
    from humanliff_tpu.diffusion.schedules import get_named_beta_schedule

    betas = get_named_beta_schedule(noise_schedule, steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not timestep_respacing:
        timestep_respacing = str(steps)
    return spaced_diffusion(
        betas=betas,
        use_timesteps=space_timesteps(steps, timestep_respacing),
        model_mean_type=(
            ModelMeanType.EPSILON if not predict_xstart else ModelMeanType.START_X
        ),
        model_var_type=(
            (ModelVarType.FIXED_LARGE if not sigma_small else ModelVarType.FIXED_SMALL)
            if not learn_sigma
            else ModelVarType.LEARNED_RANGE
        ),
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )

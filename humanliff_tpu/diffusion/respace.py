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
    """Which original timesteps to retain (respace.py:7-60)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim") :])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {num_timesteps} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


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

"""Gaussian diffusion core: schedules, q/p math, respacing, scan-based samplers."""

from humanliff_tpu.diffusion.schedules import get_named_beta_schedule
from humanliff_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    ModelMeanType,
    ModelVarType,
    LossType,
)
from humanliff_tpu.diffusion.respace import space_timesteps, spaced_diffusion
from humanliff_tpu.diffusion.resample import (
    UniformSampler,
    LossSecondMomentResampler,
    create_named_schedule_sampler,
)

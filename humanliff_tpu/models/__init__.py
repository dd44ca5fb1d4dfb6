"""Neural network models: the diffusion UNet family and shared NN helpers."""

from humanliff_tpu.models.unet import UNetModel, SuperResModel
from humanliff_tpu.models.factory import create_model, create_model_and_diffusion

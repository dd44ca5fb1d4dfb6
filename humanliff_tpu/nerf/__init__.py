"""NeRF decoder + tri-plane volume renderer (Stage-1 hot core)."""

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig, render_rays, render_rays_batch

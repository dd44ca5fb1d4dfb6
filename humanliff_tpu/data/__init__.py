"""Data pipelines: ray sampling, SynBody/TightCap loaders, tri-plane datasets."""

from humanliff_tpu.data.raygen import (
    sample_ray_batch_train,
    full_image_rays,
    get_bound_2d_mask,
)
from humanliff_tpu.data.loader import BatchLoader, device_prefetch

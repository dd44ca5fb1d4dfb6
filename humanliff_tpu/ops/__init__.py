"""Pure array ops: rays, sampling, tri-plane gathers, compositing.

Everything here is shape-static, jit-friendly, and differentiable where gradients are
needed. These are the building blocks under the NeRF renderer and the data pipeline.
"""

from humanliff_tpu.ops.grid_sample import grid_sample_2d
from humanliff_tpu.ops.triplane import (
    project_onto_planes,
    sample_triplane_features,
)
from humanliff_tpu.ops.rays import get_rays, get_near_far, intersect_aabb
from humanliff_tpu.ops.sampling import stratified_z_vals, sample_pdf
from humanliff_tpu.ops.compositing import composite_rays, volume_weights
from humanliff_tpu.ops.posenc import positional_encoding

"""Inference: progressive layer-wise tri-plane generation + NeRF decoding."""

from humanliff_tpu.sampling.layered import (
    LAYER_NAMES,
    generate_layer,
    generate_all_layers,
    planes_image_to_triplane,
    triplane_to_planes_image,
)

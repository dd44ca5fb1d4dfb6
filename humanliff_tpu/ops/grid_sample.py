"""Bilinear 2D grid sampling (torch ``F.grid_sample`` semantics) in pure jnp.

Matches ``align_corners=False`` + ``padding_mode='zeros'`` bilinear sampling, the exact
configuration the reference uses for tri-plane feature lookup
(reference: recon_NeRF/lib/renderer.py:537,541,545).

TPU notes: the gather is expressed as a row gather from an ``(H*W, C)`` flattened map,
which XLA lowers to a single gather per corner; the four corner lerps are fused
element-wise VPU work. Channels-last layout keeps the feature dim in lanes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Map normalized [-1, 1] coords to pixel coords, align_corners=False.

    pixel = ((coord + 1) * size - 1) / 2, so -1 maps to -0.5 and +1 to size - 0.5.
    """
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` at normalized ``grid`` locations.

    Args:
      image: ``(H, W, C)`` feature map (channels-last).
      grid: ``(M, 2)`` normalized coordinates; ``grid[:, 0]`` indexes width (x) and
        ``grid[:, 1]`` indexes height (y), both in [-1, 1] (torch grid convention).

    Returns:
      ``(M, C)`` bilinearly interpolated features, zero outside the image.
    """
    H, W, C = image.shape
    x = _unnormalize(grid[:, 0], W)
    y = _unnormalize(grid[:, 1], H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = image.reshape(H * W, C)

    def corner(xi: jnp.ndarray, yi: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return vals * (w * valid.astype(image.dtype))[:, None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out

"""Visualization helpers for tri-planes.

``triplane_to_rgb`` mirrors the reference's Renderer.to_rgb debug view
(renderer.py:297-302): a fixed random 1x1 color projection of the feature channels,
min-max normalized — handy for eyeballing plane structure in logs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def triplane_to_rgb(planes: jnp.ndarray, seed: int = 0) -> np.ndarray:
    """(3, C3, D, D) or (C, D, D) planes -> (D, 3*D, 3) uint8 side-by-side image."""
    p = jnp.asarray(planes)
    if p.ndim == 4:
        p = p.reshape(-1, *p.shape[-2:])  # (C, D, D)
    C, D, _ = p.shape
    per_plane = C // 3
    key = jax.random.key(seed)
    colorize = jax.random.normal(key, (3, per_plane))

    tiles = []
    for i in range(3):
        feats = p[i * per_plane : (i + 1) * per_plane]  # (c, D, D)
        img = jnp.einsum("rc,cij->ijr", colorize, feats)
        lo, hi = img.min(), img.max()
        img = 2.0 * (img - lo) / jnp.maximum(hi - lo, 1e-8) - 1.0
        tiles.append(img)
    out = jnp.concatenate(tiles, axis=1)  # (D, 3D, 3)
    return np.asarray((out * 0.5 + 0.5) * 255).astype(np.uint8)

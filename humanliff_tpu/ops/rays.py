"""Camera rays and ray–AABB intersection, shape-static for TPU.

The reference computes these in NumPy per data item (recon_NeRF/lib/if_nerf_data_utils.py).
Here they are jnp functions usable both on host (via numpy-backed jit on CPU) and fused
into device pipelines. The rejection-style ray sampler of the reference (looping until N
rays hit the box) is replaced by a fixed-shape masked formulation in
``humanliff_tpu.data``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_rays(H: int, W: int, K: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray):
    """Pinhole rays in world space from intrinsics K and extrinsics (R, T).

    Mirrors if_nerf_data_utils.py:5-18: ray directions are un-normalized
    (pixel_world - cam_origin); origin is ``-R^T T``.

    Returns (rays_o, rays_d), both ``(H, W, 3)``.
    """
    T = T.reshape(3)
    rays_o = -R.T @ T  # camera center in world coords
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=K.dtype), jnp.arange(H, dtype=K.dtype), indexing="xy"
    )
    xy1 = jnp.stack([i, j, jnp.ones_like(i)], axis=-1)  # (H, W, 3)
    pixel_camera = xy1 @ jnp.linalg.inv(K).T
    pixel_world = (pixel_camera - T) @ R
    rays_d = pixel_world - rays_o
    rays_o = jnp.broadcast_to(rays_o, rays_d.shape)
    return rays_o, rays_d


def intersect_aabb(
    bounds: jnp.ndarray, ray_o: jnp.ndarray, ray_d: jnp.ndarray, pad: float = 0.01
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ray–AABB intersection with the reference's exactly-two-hits rule.

    Reproduces if_nerf_data_utils.py:50-85: the box is padded by ``pad``; a ray counts
    as intersecting only when exactly 2 of its 6 plane intersections lie on the box —
    shape-static (no boolean indexing), so it can run under jit and vmap.

    Args:
      bounds: ``(2, 3)`` AABB.
      ray_o / ray_d: ``(N, 3)``.

    Returns:
      (near, far, mask): each ``(N,)``; near/far are distances in units of
      ``||ray_d||`` (i.e. the reference's division by the ray norm), zero where
      ``mask`` is False.
    """
    bounds = bounds + jnp.asarray([-pad, pad], bounds.dtype)[:, None]
    safe_d = jnp.where(ray_d == 0.0, 1e-8, ray_d)

    # Parametric hit distances on the 6 planes: (N, 2, 3) -> (N, 6).
    t_hit = ((bounds[None] - ray_o[:, None]) / safe_d[:, None]).reshape(-1, 6)
    p_hit = t_hit[..., None] * safe_d[:, None] + ray_o[:, None]  # (N, 6, 3)

    eps = 1e-6
    lo = bounds[0] - eps
    hi = bounds[1] + eps
    on_box = jnp.all((p_hit >= lo) & (p_hit <= hi), axis=-1)  # (N, 6)
    mask = on_box.sum(axis=-1) == 2

    # Select the two on-box hit distances without boolean indexing: min and max of
    # the masked t values (exactly two are valid where mask holds).
    big = jnp.finfo(t_hit.dtype).max
    t_valid_min = jnp.where(on_box, t_hit, big).min(axis=-1)
    t_valid_max = jnp.where(on_box, t_hit, -big).max(axis=-1)

    norm = jnp.linalg.norm(ray_d, axis=-1)
    # Reference measures near/far as euclidean distance / ||d||; for points on the ray
    # that equals |t| — intersections behind the origin (t < 0) still produce positive
    # distances there, so take abs and re-sort to match.
    d0 = jnp.abs(t_valid_min) * norm / jnp.maximum(norm, 1e-12)
    d1 = jnp.abs(t_valid_max) * norm / jnp.maximum(norm, 1e-12)
    near = jnp.minimum(d0, d1)
    far = jnp.maximum(d0, d1)

    near = jnp.where(mask, near, 0.0)
    far = jnp.where(mask, far, 0.0)
    return near, far, mask


# Reference-named alias (if_nerf_data_utils.py:50).
get_near_far = intersect_aabb

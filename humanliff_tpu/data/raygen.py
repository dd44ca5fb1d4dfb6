"""Host-side (numpy) ray generation and weighted sampling.

Numpy twin of humanliff_tpu.ops.rays for the data pipeline, mirroring
recon_NeRF/lib/if_nerf_data_utils.py: body/background-weighted pixel sampling at
ratio 0.8 with the rejection loop that refills until exactly N valid rays are
collected (:87-170) — host code may be dynamic; only device code needs static shapes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def get_rays_np(H, W, K, R, T):
    rays_o = -np.dot(R.T, T).ravel()
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = np.dot(xy1, np.linalg.inv(K).T)
    pixel_world = np.dot(pixel_camera - T.ravel(), R)
    rays_d = pixel_world - rays_o[None, None]
    return np.broadcast_to(rays_o, rays_d.shape).copy(), rays_d


def get_near_far_np(bounds, ray_o, ray_d):
    """Vectorized exactly-two-hits AABB test (if_nerf_data_utils.py:50-85)."""
    bounds = bounds + np.array([-0.01, 0.01])[:, None]
    d = ray_d.copy()
    d[d == 0.0] = 1e-8
    t_hit = ((bounds[None] - ray_o[:, None]) / d[:, None]).reshape(-1, 6)
    p_hit = t_hit[..., None] * d[:, None] + ray_o[:, None]
    eps = 1e-6
    on_box = np.all(
        (p_hit >= bounds[0] - eps) & (p_hit <= bounds[1] + eps), axis=-1
    )
    mask = on_box.sum(-1) == 2
    big = np.finfo(np.float64).max
    tmin = np.where(on_box, t_hit, big).min(-1)
    tmax = np.where(on_box, t_hit, -big).max(-1)
    d0, d1 = np.abs(tmin), np.abs(tmax)
    near = np.minimum(d0, d1)
    far = np.maximum(d0, d1)
    near = np.where(mask, near, 0.0).astype(np.float32)
    far = np.where(mask, far, 0.0).astype(np.float32)
    return near, far, mask


def get_bound_2d_mask(bounds, K, pose, H, W):
    """Projected-3D-bbox 2D mask (if_nerf_data_utils.py:36-47)."""
    min_x, min_y, min_z = bounds[0]
    max_x, max_y, max_z = bounds[1]
    corners = np.array(
        [
            [min_x, min_y, min_z], [min_x, min_y, max_z],
            [min_x, max_y, min_z], [min_x, max_y, max_z],
            [max_x, min_y, min_z], [max_x, min_y, max_z],
            [max_x, max_y, min_z], [max_x, max_y, max_z],
        ]
    )
    pts = corners @ pose[:, :3].T + pose[:, 3:].T
    pts = pts @ K.T
    c2d = np.round(pts[:, :2] / pts[:, 2:]).astype(int)
    mask = np.zeros((H, W), dtype=np.uint8)
    if cv2 is None:
        return mask + 1  # degrade gracefully: everything in-bounds
    for face in ([0, 1, 3, 2, 0], [4, 5, 7, 6, 4], [0, 1, 5, 4, 0],
                 [2, 3, 7, 6, 2], [0, 2, 6, 4, 0], [1, 3, 7, 5, 1]):
        cv2.fillPoly(mask, [c2d[face]], 1)
    return mask


def sample_ray_batch_train(
    img: np.ndarray,
    msk: np.ndarray,
    K: np.ndarray,
    R: np.ndarray,
    T: np.ndarray,
    bounds: np.ndarray,
    n_rays: int,
    body_ratio: float = 0.8,
    rng: np.random.Generator | None = None,
) -> dict:
    """Collect exactly ``n_rays`` box-hitting rays, body-weighted.

    Returns a dict of fixed-shape arrays: rgb (N,3), ray_o, ray_d, near, far,
    bkgd_msk (N,), ray_mask (N,) — all ones (every returned ray is valid).
    """
    rng = rng or np.random.default_rng()
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)

    msk = msk * bound_mask
    img = img.copy()
    img[bound_mask != 1] = 0

    body_coords = np.argwhere(msk == 1)
    bg_coords = np.argwhere((bound_mask == 1) & (msk != 1))
    if len(body_coords) == 0:
        body_coords = bg_coords
    if len(bg_coords) == 0:
        bg_coords = body_coords

    out = {k: [] for k in ("rgb", "ray_o", "ray_d", "near", "far", "bkgd")}
    n_collected = 0
    while n_collected < n_rays:
        want = n_rays - n_collected
        n_body = int(want * body_ratio)
        n_bg = want - n_body
        cb = body_coords[rng.integers(0, len(body_coords), n_body)]
        cg = bg_coords[rng.integers(0, len(bg_coords), n_bg)]
        coords = np.concatenate([cb, cg], axis=0)
        bkgd = np.concatenate(
            [np.ones(len(cb), np.float32), np.zeros(len(cg), np.float32)]
        )
        ro = ray_o[coords[:, 0], coords[:, 1]]
        rd = ray_d[coords[:, 0], coords[:, 1]]
        rgb = img[coords[:, 0], coords[:, 1]]
        near, far, hit = get_near_far_np(bounds, ro, rd)
        out["rgb"].append(rgb[hit])
        out["ray_o"].append(ro[hit])
        out["ray_d"].append(rd[hit])
        out["near"].append(near[hit])
        out["far"].append(far[hit])
        out["bkgd"].append(bkgd[hit])
        n_collected += int(hit.sum())

    res = {k: np.concatenate(v)[:n_rays].astype(np.float32) for k, v in out.items()}
    res["ray_mask"] = np.ones((n_rays,), np.float32)
    return res


def unproject_depth(depth: np.ndarray, K, R, T) -> np.ndarray:
    """Back-project a depth map into world-space points (if_nerf_data_utils.py:204-213)."""
    H, W = depth.shape
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    xyz = xy1 * depth[..., None]
    pts = xyz @ np.linalg.inv(K).T
    return (pts - np.asarray(T).ravel()) @ R


def full_image_rays(
    H: int, W: int, K, R, T, bounds
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Eval rays for every pixel; near=0/far=1 outside the box
    (if_nerf_data_utils.py:172-189). Returns (ray_o, ray_d, near, far, mask_at_box)."""
    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3).astype(np.float32)
    ray_d = ray_d.reshape(-1, 3).astype(np.float32)
    near, far, mask = get_near_far_np(bounds, ray_o, ray_d)
    near_all = np.zeros_like(ray_o[:, 0])
    far_all = np.ones_like(ray_o[:, 0])
    near_all[mask] = near[mask]
    far_all[mask] = far[mask]
    return ray_o, ray_d, near_all, far_all, mask

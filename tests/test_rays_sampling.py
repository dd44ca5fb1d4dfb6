"""Tests for ray generation, AABB intersection, and PDF sampling vs numpy oracles."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.ops import (
    get_rays,
    intersect_aabb,
    sample_pdf,
    stratified_z_vals,
)
from humanliff_tpu.ops.sampling import upsample_z_vals, merge_z_vals


def _np_get_rays(H, W, K, R, T):
    # numpy oracle mirroring if_nerf_data_utils.py:5-18
    rays_o = -np.dot(R.T, T).ravel()
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = np.dot(xy1, np.linalg.inv(K).T)
    pixel_world = np.dot(pixel_camera - T.ravel(), R)
    rays_d = pixel_world - rays_o[None, None]
    return np.broadcast_to(rays_o, rays_d.shape), rays_d


def test_get_rays_matches_numpy():
    rng = np.random.default_rng(3)
    K = np.asarray([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]], dtype=np.float32)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    R = q.astype(np.float32)
    T = rng.normal(size=(3, 1)).astype(np.float32)
    ro, rd = get_rays(8, 12, jnp.asarray(K), jnp.asarray(R), jnp.asarray(T))
    ro_np, rd_np = _np_get_rays(8, 12, K, R, T)
    np.testing.assert_allclose(np.asarray(ro), ro_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rd), rd_np, atol=1e-4)


@pytest.mark.slow
def test_intersect_aabb_against_bruteforce():
    rng = np.random.default_rng(4)
    bounds = np.asarray([[-1.0, -0.5, -0.8], [1.0, 1.5, 0.8]], dtype=np.float32)
    N = 512
    ray_o = rng.normal(scale=3.0, size=(N, 3)).astype(np.float32)
    ray_d = rng.normal(size=(N, 3)).astype(np.float32)

    near, far, mask = intersect_aabb(jnp.asarray(bounds), jnp.asarray(ray_o), jnp.asarray(ray_d))
    near, far, mask = np.asarray(near), np.asarray(far), np.asarray(mask)

    # Brute-force oracle: march finely along each ray, find padded-box crossings.
    b = bounds + np.asarray([-0.01, 0.01])[:, None]
    ts = np.linspace(-50, 50, 1000001, dtype=np.float64)
    hits = 0
    for idx in range(N):
        pts = ray_o[idx] + ts[:, None] * ray_d[idx]
        inside = np.all((pts >= b[0] - 1e-6) & (pts <= b[1] + 1e-6), axis=1)
        if not inside.any():
            assert not mask[idx]
            continue
        t_in, t_out = ts[inside][0], ts[inside][-1]
        if mask[idx]:
            hits += 1
            # Reference semantics: distances are |t| of the two crossings, re-sorted
            # (if_nerf_data_utils.py:80-84 divides euclidean distance by ||d||).
            exp_near = min(abs(t_in), abs(t_out))
            exp_far = max(abs(t_in), abs(t_out))
            np.testing.assert_allclose(near[idx], exp_near, rtol=0, atol=2e-3)
            np.testing.assert_allclose(far[idx], exp_far, rtol=0, atol=2e-3)
    assert hits > 10  # sanity: a decent share of rays hit the box


def test_sample_pdf_det_matches_oracle():
    import torch

    rng = np.random.default_rng(5)
    bins = np.sort(rng.uniform(0, 4, size=(16, 63)).astype(np.float32), axis=-1)
    weights = rng.uniform(0, 1, size=(16, 62)).astype(np.float32)

    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 32, key=None))

    # torch oracle implementing the same inverse-CDF (det path).
    w = torch.from_numpy(weights) + 1e-5
    pdf = w / w.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0, 1, 32).expand(16, 32).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, 1, below)
    cdf_a = torch.gather(cdf, 1, above)
    t_bins = torch.from_numpy(bins)
    bins_b = torch.gather(t_bins, 1, torch.clamp(below, max=62))
    bins_a = torch.gather(t_bins, 1, torch.clamp(above, max=62))
    denom = cdf_a - cdf_b
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    ref = (bins_b + t * (bins_a - bins_b)).numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_stratified_z_vals_bounds():
    near = jnp.asarray([1.0, 2.0])
    far = jnp.asarray([3.0, 5.0])
    z_det = stratified_z_vals(near, far, 16, key=None)
    np.testing.assert_allclose(np.asarray(z_det[:, 0]), [1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_det[:, -1]), [3.0, 5.0], atol=1e-6)

    z = stratified_z_vals(near, far, 16, key=jax.random.key(0))
    z = np.asarray(z)
    assert (z[:, 1:] >= z[:, :-1] - 1e-6).all()  # jitter keeps monotonicity
    assert (z[:, 0] >= np.asarray(near) - 1e-6).all()
    assert (z[:, -1] <= np.asarray(far) + 1e-6).all()


def test_upsample_concentrates_samples():
    # Put all density mass in a narrow depth band; fine samples must cluster there.
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 64), (4, 64))
    dens = jnp.where((z > 0.4) & (z < 0.5), 50.0, -50.0)
    rays_d = jnp.ones((4, 3))
    new_z = upsample_z_vals(dens, z, rays_d, 32, key=None)
    frac_in_band = float(((new_z > 0.35) & (new_z < 0.55)).mean())
    assert frac_in_band > 0.9

    merged = merge_z_vals(z, new_z)
    assert merged.shape == (4, 96)
    m = np.asarray(merged)
    assert (np.diff(m, axis=-1) >= 0).all()

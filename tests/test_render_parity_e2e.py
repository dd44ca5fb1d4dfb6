"""End-to-end render parity vs a live-torch re-execution of the reference path.

VERDICT r3 item 3: decoder-only parity was already golden-tested; this test
closes the loop on the FULL render composition — nine-plane grid_sample
feature lookup -> coarse density pass -> up_sample/sample_pdf hierarchical
sampling -> merged-sort fine pass -> alpha compositing -> depth normalization
— by re-executing the reference semantics with torch on CPU
(recon_NeRF/lib/renderer.py:166-295,488-581; run_nerf_batch.py:29-63) and
asserting PSNR > 45 dB against our jitted ``render_rays`` on the same planes,
decoder weights, and rays.

The torch side is written fresh from the reference's documented semantics
(same quirks: raw-dists fine-pass alpha vs ||d||-scaled coarse weights,
1e-7 vs 1e-10 cumprod epsilons, +1/H y/z plane offsets, align_corners=False
zeros-padding bilinear). The one intentional deviation both sides share here:
``sample_pdf`` uses the deterministic linspace-u path (our eval default; the
reference's det=True branch) so the comparison is exact rather than
distributional.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig, render_rays

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------------------
# Torch re-execution of the reference render path (CPU, fp32, det sampling)
# ---------------------------------------------------------------------------

_PLANE_AXES = torch.tensor(
    [
        [[1.0, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[1.0, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[0.0, 0, 1], [0, 1, 0], [1, 0, 0]],
    ]
)  # generate_planes(), lib/renderer.py:488-502


def _t_sample_from_planes(planes, coords, box):
    """Nine-plane bilinear lookup (lib/renderer.py:520-549), N=1 instance.

    planes: (3, 9, D, D); coords: (M, 3) world; box: (2, 3). Returns (M, 27)
    in the reference's plane-major feature ordering (render_core's
    permute(0,2,1,3).reshape).
    """
    n_planes, C, D, _ = planes.shape
    g = C // 3
    grp = [planes[:, :g], planes[:, g : 2 * g], planes[:, 2 * g :]]

    c = 2.0 * (coords - box[0]) / (box[1] - box[0]) - 1.0  # (M, 3)
    M = c.shape[0]
    inv_axes = torch.linalg.inv(_PLANE_AXES)  # (3, 3, 3)
    proj = torch.bmm(c[None].expand(n_planes, M, 3), inv_axes)[..., :2]

    def gs(feat, grid):
        out = F.grid_sample(
            feat, grid[:, None], mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )  # (3, g, 1, M)
        return out.permute(0, 3, 2, 1).reshape(n_planes, M, g)

    proj_y = proj.clone()
    proj_y[..., 0] = proj_y[..., 0] + 1.0 / D
    proj_z = proj.clone()
    proj_z[..., 1] = proj_z[..., 1] + 1.0 / D
    feats = torch.cat(
        [gs(grp[0], proj), gs(grp[1], proj_y), gs(grp[2], proj_z)], dim=-1
    )  # (3, M, 9)
    return feats.permute(1, 0, 2).reshape(M, n_planes * C)


def _t_posenc(x, num_freqs=4):
    """NeRF PE, reference interleaving (lib/fields.py:45-85): input first,
    then [sin(f x), cos(f x)] per frequency."""
    out = [x]
    for i in range(num_freqs):
        f = 2.0 ** i
        out.append(torch.sin(f * x))
        out.append(torch.cos(f * x))
    return torch.cat(out, dim=-1)


class _TorchDecoder:
    """The reference NeRF_network (lib/renderer.py:142-164) as plain matmuls
    over OUR flax parameters (flax Dense kernels are (in, out): y = x@k + b,
    the transpose of torch Linear — no transposition needed this direction)."""

    def __init__(self, flax_params):
        p = flax_params["params"]
        self.w = {
            k: (torch.from_numpy(np.asarray(v["kernel"], np.float32)),
                torch.from_numpy(np.asarray(v["bias"], np.float32)))
            for k, v in p.items()
        }

    def _lin(self, name, x):
        k, b = self.w[name]
        return x @ k + b

    def __call__(self, feats, viewdirs=None):
        x = feats
        h = F.softplus(self._lin("trunk_0", x))
        h = F.softplus(self._lin("trunk_1", h))
        h = torch.cat([x, h], dim=-1)  # skip at i==1 (skips=[n_layers/2])
        h = F.softplus(self._lin("trunk_2", h))
        alpha = self._lin("alpha", h)
        if viewdirs is None:
            return None, alpha
        feature = self._lin("feature", h)
        venc = _t_posenc(viewdirs)
        h2 = F.softplus(self._lin("views", torch.cat([feature, venc], -1)))
        rgb = self._lin("rgb", h2)
        return rgb, alpha


def _t_sample_pdf(bins, weights, n_samples):
    """Inverse-CDF sampling, det path (lib/renderer.py:551-581, det=True)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n_samples).expand(
        list(cdf.shape[:-1]) + [n_samples]
    ).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    inds_g = torch.stack([below, above], -1)
    shape = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(shape), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(shape), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


def _t_up_sample(dens, z_vals, rays_d, n_importance):
    """Coarse weights -> new depths (lib/renderer.py:166-178). Note the
    ||rays_d|| dist scaling and the 1e-10 cumprod epsilon — both differ from
    the fine pass."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(rays_d, dim=-1, keepdim=True)
    alpha = 1.0 - torch.exp(-F.softplus(dens) * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    weights = alpha * trans
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    return _t_sample_pdf(z_mid, weights[..., 1:-1], n_importance)


def torch_reference_render(planes, dec, rays_o, rays_d, near, far, box,
                           n_samples, n_importance):
    """The reference eval render for one (instance, layer): run_nerf_batch.py
    render() z_vals + Renderer.render + render_core, world-space mode
    (use_canonical_space=False), test determinism (no density noise)."""
    R = rays_o.shape[0]
    t = torch.linspace(0.0, 1.0, n_samples)
    z_vals = near[:, None] * (1.0 - t) + far[:, None] * t

    # Coarse pass (renderer.py:258-269).
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)
    feats = _t_sample_from_planes(planes, pts, box)
    _, dens = dec(feats)
    new_z = _t_up_sample(dens[..., 0].reshape(R, n_samples), z_vals, rays_d,
                         n_importance)
    z_vals, _ = torch.sort(torch.cat([z_vals, new_z], -1), -1)
    S = z_vals.shape[-1]

    # Fine pass (render_core, renderer.py:180-243).
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    # QUIRK: fine-pass alpha uses these RAW widths; the ||d||-scaled recompute
    # at renderer.py:226-228 is dead code.
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)
    viewdirs = rays_d / torch.norm(rays_d, dim=-1, keepdim=True)
    vd = viewdirs[:, None, :].expand(R, S, 3).reshape(-1, 3)
    feats = _t_sample_from_planes(planes, pts, box)
    rgb_raw, alpha_raw = dec(feats, vd)
    alpha = 1.0 - torch.exp(
        -F.softplus(alpha_raw.reshape(R, S)) * dists
    )
    color = torch.sigmoid(rgb_raw).reshape(R, S, 3)
    weights = alpha * torch.cumprod(
        torch.cat([torch.ones(R, 1), 1.0 - alpha + 1e-7], -1), -1
    )[:, :-1]
    acc = weights.sum(-1)
    rgb = (color * weights[..., None]).sum(dim=1)
    depth = (weights * z_vals).sum(-1)
    depth = (depth - near) / (far - near + 1e-5)
    return rgb.numpy(), acc.numpy(), depth.numpy()


# ---------------------------------------------------------------------------


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def test_render_rays_matches_torch_reference_end_to_end():
    rng = np.random.default_rng(0)
    D, C3, R, NS = 32, 9, 96, 16
    planes = rng.normal(0.0, 0.5, (3, C3, D, D)).astype(np.float32)
    box = np.asarray([[-1.0, -1.2, -1.0], [1.0, 1.2, 1.0]], np.float32)

    decoder = NeRFDecoder(d_in=27)
    params = decoder.init(
        jax.random.key(0), jnp.zeros((8, 27)), jnp.zeros((8, 3))
    )

    # Rays from a synthetic camera in front of the box; un-normalized
    # directions (reference convention) to exercise the ||d|| quirks.
    origin = np.asarray([0.3, -0.2, -2.5], np.float32)
    targets = np.stack(
        np.meshgrid(
            np.linspace(-0.8, 0.8, 12), np.linspace(-0.9, 0.9, 8), indexing="ij"
        ),
        -1,
    ).reshape(-1, 2)
    rays_d = np.concatenate(
        [targets, np.zeros((R, 1), np.float32)], -1
    ).astype(np.float32)
    rays_d[:, 2] = 2.5
    rays_d *= 1.3  # deliberately un-normalized
    rays_o = np.broadcast_to(origin, (R, 3)).copy()
    near = np.full((R,), 0.5, np.float32)
    far = np.full((R,), 1.6, np.float32)

    cfg = RenderConfig(n_samples=NS, n_importance=NS, perturb=False,
                       density_noise=False)
    ours = render_rays(
        decoder, params, jnp.asarray(planes), jnp.asarray(rays_o),
        jnp.asarray(rays_d), jnp.asarray(near), jnp.asarray(far),
        jnp.asarray(box), cfg, key=None,
    )

    ref_rgb, ref_acc, ref_depth = torch_reference_render(
        torch.from_numpy(planes), _TorchDecoder(jax.device_get(params)),
        torch.from_numpy(rays_o), torch.from_numpy(rays_d),
        torch.from_numpy(near), torch.from_numpy(far),
        torch.from_numpy(box), NS, NS,
    )

    rgb = np.asarray(ours["rgb"], np.float32)
    acc = np.asarray(ours["acc"], np.float32)
    depth = np.asarray(ours["depth"], np.float32)

    # Sanity: the scene is non-trivial (rays actually hit density).
    assert float(ref_acc.mean()) > 0.1
    assert float(np.std(ref_rgb)) > 1e-3

    psnr = _psnr(rgb, ref_rgb)
    assert psnr > 45.0, f"end-to-end render parity PSNR {psnr:.1f} dB"
    np.testing.assert_allclose(acc, ref_acc, atol=2e-3)
    np.testing.assert_allclose(depth, ref_depth, atol=5e-3)


def test_masked_image_path_matches_torch_reference():
    """Same A/B through render_image_masked (the production eval tier),
    including the compact-pad-scatter path (all_test.py renders full frames;
    we compute only in-box rays — output must still match the torch render
    on those rays)."""
    from humanliff_tpu.nerf.renderer import render_image_masked

    rng = np.random.default_rng(1)
    D, C3, NS = 24, 9, 12
    planes = rng.normal(0.0, 0.5, (3, C3, D, D)).astype(np.float32)
    box = np.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)

    decoder = NeRFDecoder(d_in=27)
    params = decoder.init(
        jax.random.key(2), jnp.zeros((8, 27)), jnp.zeros((8, 3))
    )

    from humanliff_tpu.data.raygen import full_image_rays
    from humanliff_tpu.data.view_datasets import NovelViewCameras

    S = 16
    cams = NovelViewCameras(image_size=S)
    K, R_, T_ = cams.camera(3)
    ro, rd, near, far, mask = full_image_rays(S, S, K, R_, T_, box)

    cfg = RenderConfig(n_samples=NS, n_importance=NS, perturb=False,
                       density_noise=False)
    out = render_image_masked(
        decoder, params, jnp.asarray(planes), ro, rd, near, far, mask,
        jnp.asarray(box), cfg, chunk=64, outputs=("rgb", "acc"),
    )

    m = np.asarray(mask).reshape(-1).astype(bool)
    idx = np.flatnonzero(m)
    assert idx.size > 8  # the view must actually see the box
    ref_rgb, ref_acc, _ = torch_reference_render(
        torch.from_numpy(planes), _TorchDecoder(jax.device_get(params)),
        torch.from_numpy(np.asarray(ro, np.float32)[idx]),
        torch.from_numpy(np.asarray(rd, np.float32)[idx]),
        torch.from_numpy(np.asarray(near, np.float32)[idx]),
        torch.from_numpy(np.asarray(far, np.float32)[idx]),
        torch.from_numpy(box), NS, NS,
    )
    psnr = _psnr(out["rgb"][idx], ref_rgb)
    assert psnr > 45.0, f"masked-path parity PSNR {psnr:.1f} dB"
    np.testing.assert_allclose(out["acc"][idx], ref_acc, atol=2e-3)

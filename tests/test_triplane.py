"""Golden tests: nine-plane sampling vs a torch replica of the reference math."""

import numpy as np
import jax.numpy as jnp
import pytest

from humanliff_tpu.ops import project_onto_planes, sample_triplane_features

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_reference_nine_plane(planes, coords, box_warp):
    """Independent torch replica of renderer.py:488-549 semantics (not a copy:
    reconstructed from the documented behavior to serve as a golden oracle)."""
    planes_t = torch.from_numpy(planes)[None]  # (1, 3, C3, D, D)
    coords_t = torch.from_numpy(coords)[None]  # (1, M, 3)
    bw = torch.from_numpy(box_warp)[None]  # (1, 2, 3)

    plane_axes = torch.tensor(
        [
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
            [[0, 0, 1], [0, 1, 0], [1, 0, 0]],
        ],
        dtype=torch.float32,
    )

    C3 = planes_t.shape[2]
    C = C3 // 3
    fx = planes_t[:, :, :C]
    fy = planes_t[:, :, C : 2 * C]
    fz = planes_t[:, :, 2 * C :]

    N, n_planes, _, H, W = fx.shape
    M = coords_t.shape[1]
    fx = fx.reshape(N * n_planes, C, H, W)
    fy = fy.reshape(N * n_planes, C, H, W)
    fz = fz.reshape(N * n_planes, C, H, W)

    c = 2 * (coords_t - bw[:, :1]) / (bw[:, 1:2] - bw[:, :1]) - 1

    cexp = c.unsqueeze(1).expand(-1, n_planes, -1, -1).reshape(N * n_planes, M, 3)
    inv = torch.linalg.inv(plane_axes).unsqueeze(0).expand(N, -1, -1, -1)
    inv = inv.reshape(N * n_planes, 3, 3)
    proj = torch.bmm(cexp, inv)[..., :2].unsqueeze(1)  # (3, 1, M, 2)

    def gs(feat, grid):
        out = F.grid_sample(
            feat, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )
        return out.permute(0, 3, 2, 1).reshape(N, n_planes, M, C)

    ox = gs(fx, proj)
    py = proj.clone()
    py[..., 0] = py[..., 0] + 1 / H
    oy = gs(fy, py)
    pz = proj.clone()
    pz[..., 1] = pz[..., 1] + 1 / H
    oz = gs(fz, pz)

    out = torch.cat([ox, oy, oz], dim=-1)  # (N, 3, M, 3C)
    return out.permute(0, 2, 1, 3).reshape(M, -1).numpy()


def test_projection_matches_axis_algebra():
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(64, 3)).astype(np.float32)
    proj = np.asarray(project_onto_planes(jnp.asarray(coords)))
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    np.testing.assert_allclose(proj[0], np.stack([x, y], -1), atol=1e-6)
    np.testing.assert_allclose(proj[1], np.stack([x, z], -1), atol=1e-6)
    np.testing.assert_allclose(proj[2], np.stack([z, y], -1), atol=1e-6)


@pytest.mark.parametrize("D,C3", [(32, 9), (64, 9)])
def test_matches_reference_nine_plane(D, C3):
    rng = np.random.default_rng(2)
    planes = rng.normal(scale=0.1, size=(3, C3, D, D)).astype(np.float32)
    box = np.asarray([[-0.8, -1.1, -0.5], [0.9, 1.0, 0.7]], dtype=np.float32)
    coords = rng.uniform(-1.2, 1.2, size=(256, 3)).astype(np.float32) * (
        (box[1] - box[0]) / 2
    ) + (box[0] + box[1]) / 2

    ours = np.asarray(
        sample_triplane_features(jnp.asarray(planes), jnp.asarray(coords), jnp.asarray(box))
    )
    ref = _torch_reference_nine_plane(planes, coords, box)
    assert ours.shape == ref.shape == (256, 3 * C3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

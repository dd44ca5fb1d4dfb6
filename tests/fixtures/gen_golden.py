"""Regenerate the committed torch-oracle fixtures (requires torch; run rarely).

Usage: python tests/fixtures/gen_golden.py

The golden tests themselves are torch-free: they rebuild the inputs from
seeded numpy (tests/golden_cases.py) and compare against the outputs stored
here, so the parity suite runs in environments without torch. Torch is only
needed to (re)generate the oracle outputs in this script.
"""

import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from golden_cases import (  # noqa: E402
    GRID_SAMPLE_CASES,
    NINE_PLANE_CASES,
    grid_sample_inputs,
    nine_plane_inputs,
)

OUT = os.path.join(os.path.dirname(__file__), "golden.npz")


def torch_grid_sample(img, grid):
    """F.grid_sample bilinear/zeros/align_corners=False on (H,W,C) + (M,2)."""
    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(grid)[None, None]
    out = F.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    return out[0, :, 0, :].permute(1, 0).numpy()


def torch_nine_plane(planes, coords, box_warp):
    """Independent torch replica of renderer.py:488-549 nine-plane semantics."""
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


def main():
    arrays = {}
    for i, (H, W, C) in enumerate(GRID_SAMPLE_CASES):
        img, grid = grid_sample_inputs(H, W, C)
        arrays[f"grid_sample_{i}"] = torch_grid_sample(img, grid)
    for i, (D, C3) in enumerate(NINE_PLANE_CASES):
        planes, coords, box = nine_plane_inputs(D, C3)
        arrays[f"nine_plane_{i}"] = torch_nine_plane(planes, coords, box)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT}: " + ", ".join(f"{k}{v.shape}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()

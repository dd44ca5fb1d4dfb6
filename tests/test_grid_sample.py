"""Golden tests: jnp grid sampling vs committed torch F.grid_sample outputs.

The oracle outputs live in tests/fixtures/golden.npz (regenerate with
tests/fixtures/gen_golden.py, which needs torch); inputs are rebuilt from
seeded numpy so the tests run torch-free everywhere.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from humanliff_tpu.ops import grid_sample_2d

from golden_cases import GRID_SAMPLE_CASES, grid_sample_inputs

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.npz")


@pytest.mark.parametrize("case", range(len(GRID_SAMPLE_CASES)))
def test_matches_torch_bilinear_zeros(case):
    H, W, C = GRID_SAMPLE_CASES[case]
    img, grid = grid_sample_inputs(H, W, C)

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))

    with np.load(_FIXTURE) as z:
        ref = z[f"grid_sample_{case}"]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_fixture_matches_live_torch_if_available():
    """Cross-check the committed fixture against a live torch when present."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img, grid = grid_sample_inputs(*GRID_SAMPLE_CASES[0])
    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(grid)[None, None]
    live = F.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )[0, :, 0, :].permute(1, 0).numpy()
    with np.load(_FIXTURE) as z:
        np.testing.assert_allclose(live, z["grid_sample_0"], rtol=1e-6, atol=1e-6)

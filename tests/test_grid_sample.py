"""Golden tests: jnp grid sampling vs torch F.grid_sample (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from humanliff_tpu.ops import grid_sample_2d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("H,W,C", [(16, 16, 3), (32, 16, 9), (256, 256, 3)])
def test_matches_torch_bilinear_zeros(H, W, C):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(H, W, C)).astype(np.float32)
    # Include far out-of-range coords to exercise zero padding.
    grid = rng.uniform(-1.6, 1.6, size=(512, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]  # (1, C, H, W)
    t_grid = torch.from_numpy(grid)[None, None]  # (1, 1, M, 2)
    ref = F.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    ref = ref[0, :, 0, :].permute(1, 0).numpy()  # (M, C)

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_exact_pixel_centers():
    # align_corners=False: pixel (i, j) center lives at normalized (2j+1)/W - 1.
    H = W = 8
    img = np.arange(H * W, dtype=np.float32).reshape(H, W, 1)
    js, is_ = np.meshgrid(np.arange(W), np.arange(H))
    grid = np.stack(
        [(2 * js.ravel() + 1) / W - 1, (2 * is_.ravel() + 1) / H - 1], axis=-1
    ).astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out[:, 0], img.ravel(), atol=1e-5)


def test_gradients_flow():
    import jax

    img = jnp.ones((8, 8, 2))
    grid = jnp.asarray([[0.1, -0.2], [0.5, 0.5]])
    g = jax.grad(lambda im: grid_sample_2d(im, grid).sum())(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

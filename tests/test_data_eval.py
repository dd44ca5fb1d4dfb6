"""Tests for ray sampling data path, TightCap compositing, loaders, and metrics."""

import numpy as np
import pytest

from humanliff_tpu.data.raygen import (
    full_image_rays,
    get_near_far_np,
    sample_ray_batch_train,
)
from humanliff_tpu.data.loader import BatchLoader
from humanliff_tpu.data.tightcap import SKIN_COLOR, composite_layer_image
from humanliff_tpu.eval.metrics import psnr, ssim


def _scene():
    H = W = 64
    img = np.zeros((H, W, 3), np.float32)
    msk = np.zeros((H, W), np.float32)
    msk[20:44, 24:40] = 1
    img[msk == 1] = 0.7
    K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
    R = np.eye(3)
    T = np.array([[0.0], [0.0], [3.0]])
    bounds = np.array([[-1.0, -1, -1], [1, 1, 1.0]])
    return img, msk, K, R, T, bounds


def test_sample_ray_batch_shapes_and_validity():
    img, msk, K, R, T, bounds = _scene()
    rays = sample_ray_batch_train(img, msk, K, R, T, bounds, 512, rng=np.random.default_rng(0))
    assert rays["ray_o"].shape == (512, 3)
    assert rays["rgb"].shape == (512, 3)
    # Every ray hits the box (that's the rejection-loop contract).
    near, far, hit = get_near_far_np(bounds, rays["ray_o"], rays["ray_d"])
    assert hit.all()
    assert (rays["far"] > rays["near"]).all()
    # Body-weighted: most rays carry foreground color.
    frac_body = (rays["bkgd"] == 1).mean()
    assert 0.6 < frac_body <= 0.9


def test_full_image_rays_defaults_outside_box():
    img, msk, K, R, T, bounds = _scene()
    ro, rd, near, far, mask = full_image_rays(64, 64, K, R, T, bounds)
    assert ro.shape == (64 * 64, 3)
    assert (near[~mask] == 0).all() and (far[~mask] == 1).all()
    assert mask.sum() > 100


def test_composite_layers():
    H = W = 32
    img = np.full((H, W, 3), 0.5, np.float32)
    full = np.zeros((H, W), np.float32)
    full[4:28, 4:28] = 1
    naked = np.zeros_like(full)
    naked[8:24, 8:24] = 1
    top = np.zeros_like(full)
    top[8:16, 8:24] = 1  # overlaps naked entirely
    bottom = np.zeros_like(full)
    bottom[24:28, 8:24] = 1  # outside naked -> exclusive garment pixels
    shoes = np.zeros_like(full)
    garments = dict(naked=naked, top=top, bottom=bottom, shoes=shoes)

    img0, msk0 = composite_layer_image(0, img, full, garments)
    # top-over-skin region painted skin color at layer 0
    assert np.allclose(img0[10, 10], SKIN_COLOR)
    # bottom-exclusive pixels erased
    assert np.allclose(img0[25, 10], 0)

    img3, msk3 = composite_layer_image(3, img, full, garments)
    np.testing.assert_array_equal(msk3, full)
    assert np.allclose(img3[10, 10], 0.5)  # untouched at final layer


def test_batch_loader_stacks_and_streams():
    def item_fn(idx, rng):
        return {"a": np.full((3,), idx, np.float32), "b": np.zeros((2, 2), np.float32)}

    loader = BatchLoader(num_items=10, item_fn=item_fn, batch_size=4, num_workers=1)
    it = iter(loader)
    batch = next(it)
    assert batch["a"].shape == (4, 3)
    assert batch["b"].shape == (4, 2, 2)
    loader.close()


def test_psnr_ssim_sanity():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    assert psnr(a, a) > 100
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    p = psnr(a, b)
    assert 15 < p < 25
    s = ssim(a, b)
    assert 0.2 < s < 0.95


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage.metrics")
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, size=(48, 48)).astype(np.float64)
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1)
    ours = ssim(a, b, data_range=1.0)
    ref = skimage.structural_similarity(a, b, data_range=1.0)
    assert abs(ours - ref) < 0.02

"""Image-folder dataset (reference improved_diffusion/image_datasets.py semantics)."""

import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")

from humanliff_tpu.data.image_folder import (
    ImageFolderDataset,
    area_downsample,
    list_image_files,
    load_image_data,
)


@pytest.fixture
def folder(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ("cat", "dog"):
        d = tmp_path / "sub"
        d.mkdir(exist_ok=True)
        for i in range(3):
            img = rng.integers(0, 255, (48, 64, 3), np.uint8)
            imageio.imwrite(d / f"{cls}_{i}.png", img)
    return str(tmp_path)


def test_listing_and_classes(folder):
    files = list_image_files(folder)
    assert len(files) == 6 and files == sorted(files)
    ds = ImageFolderDataset(folder, image_size=16, class_cond=True)
    # Classes from the filename prefix before "_", sorted: cat=0, dog=1.
    assert sorted(set(ds.classes)) == [0, 1]
    x, y = ds.item(0)
    assert x.shape == (16, 16, 3) and y in (0, 1)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_generator_batches(folder):
    it = load_image_data(folder, batch_size=4, image_size=16, class_cond=True)
    b = next(it)
    assert b["x"].shape == (4, 16, 16, 3) and b["y"].shape == (4,)
    # Infinite: draws more batches than the dataset holds.
    for _ in range(3):
        b = next(it)
    assert b["x"].dtype == np.float32


def test_deterministic_order(folder):
    a = next(load_image_data(folder, 4, 16, deterministic=True))
    b = next(load_image_data(folder, 4, 16, deterministic=True))
    np.testing.assert_array_equal(a["x"], b["x"])


def test_area_downsample_matches_mean():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    lo = area_downsample(x, 4)
    assert lo.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(
        lo[0, 0, 0], x[0, :2, :2].mean(axis=(0, 1)), rtol=1e-6
    )


def test_empty_dir_raises(tmp_path):
    with pytest.raises(ValueError):
        ImageFolderDataset(str(tmp_path), 16)

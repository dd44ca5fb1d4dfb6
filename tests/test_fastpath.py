"""Fast decode path (nerf/fastpath.py): grid coarse pass + empty-ray termination."""

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.fastpath import (
    build_density_grid,
    render_image_fast,
    sample_grid_density,
)
from humanliff_tpu.nerf.renderer import RenderConfig, render_image_masked


def _setup(D=32, R=128, seed=0):
    rng = np.random.default_rng(seed)
    decoder = NeRFDecoder()
    planes = jnp.asarray(rng.normal(scale=0.1, size=(3, 9, D, D)).astype(np.float32))
    params = decoder.init(jax.random.key(0), jnp.zeros((1, 27)), jnp.zeros((1, 3)))
    rays_o = jnp.asarray(np.tile([[0, 0, 3.0]], (R, 1)).astype(np.float32))
    dirs = rng.normal(size=(R, 3)) * 0.2 + [0, 0, -1.0]
    rays_d = jnp.asarray(dirs.astype(np.float32))
    near = jnp.full((R,), 2.0)
    far = jnp.full((R,), 4.0)
    box = np.asarray([[-1.0, -1, -1], [1, 1, 1.0]], np.float32)
    return decoder, params, planes, rays_o, rays_d, near, far, box


def test_grid_exact_at_lattice_points():
    decoder, params, planes, *_ , box = _setup()
    grid = build_density_grid(decoder, params, planes, box, resolution=8)
    # Query exactly at lattice nodes: trilinear == direct decoder density.
    lin = [np.linspace(box[0, d], box[1, d], 9, dtype=np.float32) for d in range(3)]
    pts = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)[::7]
    got = np.asarray(sample_grid_density(grid, jnp.asarray(pts), jnp.asarray(box)))

    from humanliff_tpu.ops.triplane import sample_triplane_features

    feats = sample_triplane_features(planes, jnp.asarray(pts), jnp.asarray(box))
    want = np.asarray(decoder.apply(params, feats)[1][..., 0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fast_render_close_to_exact():
    decoder, params, planes, ro, rd, near, far, box = _setup()
    cfg = RenderConfig(n_samples=32, n_importance=32, perturb=False,
                       density_noise=False)
    mask = np.ones(ro.shape[0], bool)
    exact = render_image_masked(
        decoder, params, planes, ro, rd, near, far, mask, jnp.asarray(box), cfg,
        chunk=64,
    )
    grid = build_density_grid(decoder, params, planes, box, resolution=48)
    fast = render_image_fast(
        decoder, params, planes, grid, ro, rd, near, far, mask, box, cfg,
        chunk=64, early_term_eps=-1.0,  # keep every ray: isolate z-placement error
    )
    d = np.abs(np.asarray(fast["rgb"]) - np.asarray(exact["rgb"]))
    assert d.mean() < 0.02, d.mean()
    np.testing.assert_allclose(
        np.asarray(fast["acc"]), np.asarray(exact["acc"]), atol=0.05
    )


def test_fast_render_terminates_empty_rays():
    decoder, params, planes, ro, rd, near, far, box = _setup()
    # Push the alpha head's bias far negative: zero density everywhere.
    params = jax.tree.map(lambda p: p, params)
    params["params"]["alpha"]["bias"] = params["params"]["alpha"]["bias"] - 100.0
    cfg = RenderConfig(n_samples=16, n_importance=16, perturb=False,
                       density_noise=False)
    mask = np.ones(ro.shape[0], bool)
    grid = build_density_grid(decoder, params, planes, box, resolution=16)
    out = render_image_fast(
        decoder, params, planes, grid, ro, rd, near, far, mask, box, cfg,
        chunk=64, early_term_eps=1e-2, bg_color=0.5,
    )
    np.testing.assert_array_equal(np.asarray(out["rgb"]), 0.5)
    np.testing.assert_array_equal(np.asarray(out["acc"]), 0.0)


def test_fast_render_respects_ray_mask():
    decoder, params, planes, ro, rd, near, far, box = _setup()
    cfg = RenderConfig(n_samples=16, n_importance=16, perturb=False,
                       density_noise=False)
    rng = np.random.default_rng(1)
    mask = rng.uniform(size=(ro.shape[0],)) < 0.5
    grid = build_density_grid(decoder, params, planes, box, resolution=16)
    out = render_image_fast(
        decoder, params, planes, grid, ro, rd, near, far, mask, box, cfg,
        chunk=64, early_term_eps=-1.0, bg_color=0.25,
    )
    np.testing.assert_array_equal(np.asarray(out["rgb"])[~mask], 0.25)
    assert np.any(np.asarray(out["rgb"])[mask] != 0.25)


def test_fast_render_big_coarse_tiles_match_small():
    """The two-shape coarse tiling (big tiles + 16K-tile remainder) must agree
    with all-small-tile rendering — exercises the n_big > 0 branch the default
    coarse_chunk never hits at test scale."""
    decoder, params, planes, ro, rd, near, far, box = _setup(R=160)
    cfg = RenderConfig(n_samples=8, n_importance=8, perturb=False,
                       density_noise=False)
    mask = np.ones(160, bool)
    grid = build_density_grid(decoder, params, planes, box, resolution=16)
    small = render_image_fast(
        decoder, params, planes, grid, ro, rd, near, far, mask, box, cfg,
        chunk=16, early_term_eps=-1.0, coarse_chunk=16,
    )
    # coarse_chunk=64 -> n_big = 128 (two big tiles) + 32 remainder in 16s.
    big = render_image_fast(
        decoder, params, planes, grid, ro, rd, near, far, mask, box, cfg,
        chunk=16, early_term_eps=-1.0, coarse_chunk=64,
    )
    np.testing.assert_allclose(big["rgb"], small["rgb"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(big["acc"], small["acc"], rtol=1e-5, atol=1e-6)


def test_grid_cache_rebuilds_only_on_box_change():
    from humanliff_tpu.nerf.fastpath import GridCache

    decoder, params, planes, *_ , box = _setup()
    cache = GridCache(decoder, params, planes, resolution=8)
    g1 = cache.get(box)
    g2 = cache.get(box.copy())       # equal box -> same grid object
    assert g1 is g2
    g3 = cache.get(box * 1.5)        # new box -> rebuilt
    assert g3 is not g1
    assert g1.table.shape == g3.table.shape

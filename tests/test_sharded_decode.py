"""Mesh-sharded decode (nerf/sharded.py) vs the single-device exact path.

The decode loop's scaling axis (reference cross-rank inference split,
triplane_sample_layered.py:211-219): tiles of masked rays shard across the
8-device CPU mesh and must reproduce render_image_masked bit-near-exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from humanliff_tpu.data.synthetic import SyntheticLayeredDataset
from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig, render_image_masked
from humanliff_tpu.nerf.sharded import render_views_sharded
from humanliff_tpu.parallel import make_mesh


def _setup(ch=27, d=32):
    decoder = NeRFDecoder(d_in=ch)
    params = decoder.init(
        jax.random.key(0), jnp.zeros((1, ch)), jnp.zeros((1, 3))
    )
    planes = 0.1 * jax.random.normal(jax.random.key(1), (3, ch // 3, d, d))
    return decoder, params, planes


def _views(n=3, size=24):
    ds = SyntheticLayeredDataset(num_instances=1, image_size=size,
                                 tight_bounds=True)
    return [ds.test_item(0, 1, 145 + v) for v in range(n)]


def test_sharded_views_match_exact_masked_render():
    decoder, params, planes = _setup()
    views = _views()
    cfg = RenderConfig(n_samples=12, n_importance=12, perturb=False,
                       density_noise=False)
    mesh = make_mesh(8)
    got = render_views_sharded(
        decoder, params, planes, views, cfg, mesh, chunk=64,
        outputs=("rgb", "acc"),
    )
    assert len(got) == len(views)
    for item, out in zip(views, got):
        ref = render_image_masked(
            decoder, params, planes, item["rays_o"], item["rays_d"],
            item["near"], item["far"], item["ray_mask"], item["box_warp"],
            cfg, chunk=64, outputs=("rgb", "acc"),
        )
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=2e-5)
        np.testing.assert_allclose(out["acc"], ref["acc"], atol=2e-5)
        assert np.abs(out["rgb"]).sum() > 0  # non-trivial render


def test_sharded_views_canonical_deform_match():
    """Per-view traced SMPL args ride the tile axis (TightCap decode path)."""
    from humanliff_tpu.bodymodel import lbs_forward
    from humanliff_tpu.bodymodel.canonical import make_eval_deform_fn
    from humanliff_tpu.bodymodel.smpl import make_synthetic_body_model

    body = make_synthetic_body_model(J=4, V=48)
    deform_fn = make_eval_deform_fn(body)
    decoder, params, planes = _setup()
    views = _views(n=2)
    rng = np.random.default_rng(3)
    J3 = body.num_joints * 3
    for vi, item in enumerate(views):  # distinct pose per view
        poses = rng.normal(scale=0.1, size=(J3,)).astype(np.float32)
        betas = rng.normal(scale=0.3, size=(5,)).astype(np.float32)
        verts, _ = lbs_forward(body, jnp.asarray(poses)[None], jnp.asarray(betas)[None])
        item.update({
            "poses": poses, "betas": betas,
            "t_poses": np.zeros((J3,), np.float32),
            "R": np.eye(3, dtype=np.float32),
            "Th": np.zeros((3,), np.float32),
            "smpl_verts": np.asarray(verts[0]),
        })
    dargs_fn = lambda it: {
        k: it[k] for k in ("poses", "betas", "t_poses", "R", "Th", "smpl_verts")
    }
    cfg = RenderConfig(n_samples=8, n_importance=8, perturb=False,
                       density_noise=False)
    mesh = make_mesh(8)
    got = render_views_sharded(
        decoder, params, planes, views, cfg, mesh, chunk=64,
        deform_fn=deform_fn, deform_args_fn=dargs_fn, outputs=("rgb",),
    )
    for item, out in zip(views, got):
        ref = render_image_masked(
            decoder, params, planes, item["rays_o"], item["rays_d"],
            item["near"], item["far"], item["ray_mask"], item["box_warp"],
            cfg, chunk=64, deform_fn=deform_fn, deform_args=dargs_fn(item),
            outputs=("rgb",),
        )
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=2e-5)


def test_sharded_views_rejects_mixed_boxes():
    decoder, params, planes = _setup()
    views = _views(n=2)
    views[1]["box_warp"] = np.asarray([[-2, -2, -2], [2, 2, 2]], np.float32)
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        render_views_sharded(
            decoder, params, planes, views,
            RenderConfig(n_samples=4, n_importance=0), mesh, chunk=64,
        )

"""Renderer tests: shapes, determinism, chunk equivalence, and a tiny overfit."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.nerf import NeRFDecoder, RenderConfig, render_rays
from humanliff_tpu.nerf.renderer import render_image_chunked
from humanliff_tpu.train.optim import make_stage1_optimizer
from humanliff_tpu.train.stage1 import (
    Stage1Config,
    create_train_state,
    train_step,
)


def _setup(D=32, R=64):
    rng = np.random.default_rng(0)
    decoder = NeRFDecoder()
    key = jax.random.key(0)
    planes = jnp.asarray(rng.normal(scale=0.1, size=(3, 9, D, D)).astype(np.float32))
    params = decoder.init(key, jnp.zeros((1, 27)), jnp.zeros((1, 3)))
    rays_o = jnp.asarray(np.tile([[0, 0, 3.0]], (R, 1)).astype(np.float32))
    dirs = rng.normal(size=(R, 3)) * 0.2 + [0, 0, -1.0]
    rays_d = jnp.asarray(dirs.astype(np.float32))
    near = jnp.full((R,), 2.0)
    far = jnp.full((R,), 4.0)
    box = jnp.asarray([[-1.0, -1, -1], [1, 1, 1.0]])
    return decoder, params, planes, rays_o, rays_d, near, far, box


def test_render_shapes_and_finiteness():
    decoder, params, planes, ro, rd, near, far, box = _setup()
    cfg = RenderConfig(n_samples=32, n_importance=32)
    out = render_rays(
        decoder, params, planes, ro, rd, near, far, box, cfg, key=jax.random.key(1)
    )
    assert out["rgb"].shape == (64, 3)
    assert out["acc"].shape == (64,)
    assert out["depth"].shape == (64,)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_eval_render_deterministic():
    decoder, params, planes, ro, rd, near, far, box = _setup()
    cfg = RenderConfig(n_samples=32, n_importance=32, perturb=False, density_noise=False)
    a = render_rays(decoder, params, planes, ro, rd, near, far, box, cfg, key=None)
    b = render_rays(decoder, params, planes, ro, rd, near, far, box, cfg, key=None)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


@pytest.mark.slow
def test_chunked_matches_unchunked():
    decoder, params, planes, ro, rd, near, far, box = _setup(R=80)
    cfg = RenderConfig(n_samples=16, n_importance=16, perturb=False, density_noise=False)
    full = render_rays(decoder, params, planes, ro, rd, near, far, box, cfg, key=None)
    chunked = render_image_chunked(
        decoder, params, planes, ro, rd, near, far, box, cfg, chunk=32
    )
    np.testing.assert_allclose(
        np.asarray(full["rgb"]), np.asarray(chunked["rgb"]), atol=1e-5
    )


@pytest.mark.slow
def test_stage1_overfit_synthetic_views():
    """Minimum end-to-end slice: fit planes+decoder to views of a synthetic blob.

    GT images come from a fixed 'teacher' render (random planes); the student starts
    from a different init and must reduce image loss substantially — exercising the
    full gradient path through sampling, gathers, MLP and compositing.
    """
    cfg = Stage1Config(
        num_instances=2,
        num_layers=2,
        triplane_dim=32,
        triplane_ch=27,
        render=RenderConfig(n_samples=24, n_importance=24, perturb=True),
        tv_loss_coef=1e-5,
        l1_loss_coef=1e-5,
    )
    decoder = NeRFDecoder()
    tx = make_stage1_optimizer(decoder_lr=5e-3, plane_lr=5e-2)
    state = create_train_state(jax.random.key(0), cfg, decoder, tx)

    # Teacher: different-seed params render the "ground truth" rays.
    teacher = create_train_state(jax.random.key(7), cfg, decoder, tx)

    rng = np.random.default_rng(1)
    B, R = 2, 128
    rays_o = jnp.asarray(np.tile([[0, 0, 3.0]], (B, R, 1)).astype(np.float32))
    rays_d = jnp.asarray(
        (rng.normal(size=(B, R, 3)) * 0.25 + [0, 0, -1.0]).astype(np.float32)
    )
    near = jnp.full((B, R), 2.0)
    far = jnp.full((B, R), 4.0)
    box = jnp.broadcast_to(jnp.asarray([[-1.0, -1, -1], [1, 1, 1.0]]), (B, 2, 3))
    inst = jnp.asarray([0, 1])
    layer = jnp.asarray([0, 1])

    from humanliff_tpu.nerf.renderer import render_rays as rr

    def teacher_render(p, ro, rd, nr, fr, bw):
        eval_cfg = RenderConfig(
            n_samples=24, n_importance=24, perturb=False, density_noise=False
        )
        return rr(decoder, teacher.params["decoder"], p, ro, rd, nr, fr, bw, eval_cfg)

    tplanes = teacher.params["planes"][inst, layer]
    gt = jax.vmap(teacher_render)(tplanes, rays_o, rays_d, near, far, box)

    batch = {
        "instance_idx": inst,
        "layer_idx": layer,
        "rays_o": rays_o,
        "rays_d": rays_d,
        "near": near,
        "far": far,
        "box_warp": box,
        "rgb": gt["rgb"],
        "bkgd_msk": gt["acc"],
        "ray_mask": jnp.ones((B, R)),
    }

    key = jax.random.key(2)
    first = None
    for i in range(120):
        key, sub = jax.random.split(key)
        state, aux = train_step(state, batch, sub, decoder, cfg)
        if first is None:
            first = float(aux["img_loss"])
    last = float(aux["img_loss"])
    assert np.isfinite(last)
    assert last < first * 0.25, (first, last)
    # Planes stayed clamped.
    assert float(jnp.abs(state.params["planes"]).max()) <= 1.0 + 1e-6


def test_masked_matches_chunked_on_mask():
    from humanliff_tpu.nerf.renderer import render_image_masked

    decoder, params, planes, ro, rd, near, far, box = _setup(R=96)
    cfg = RenderConfig(n_samples=16, n_importance=16, perturb=False, density_noise=False)
    rng = np.random.default_rng(3)
    mask = rng.uniform(size=(96,)) < 0.6
    dense = render_image_chunked(
        decoder, params, planes, ro, rd, near, far, box, cfg, chunk=32
    )
    masked = render_image_masked(
        decoder, params, planes, ro, rd, near, far, mask, box, cfg, chunk=32,
        bg_color=0.25,
    )
    np.testing.assert_allclose(
        np.asarray(masked["rgb"])[mask], np.asarray(dense["rgb"])[mask],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_array_equal(np.asarray(masked["rgb"])[~mask], 0.25)
    np.testing.assert_array_equal(np.asarray(masked["acc"])[~mask], 0.0)


def test_masked_empty_mask_is_background():
    from humanliff_tpu.nerf.renderer import render_image_masked

    decoder, params, planes, ro, rd, near, far, box = _setup(R=16)
    cfg = RenderConfig(n_samples=8, n_importance=0, perturb=False, density_noise=False)
    out = render_image_masked(
        decoder, params, planes, ro, rd, near, far, np.zeros(16, bool), box, cfg,
        chunk=8, bg_color=1.0,
    )
    np.testing.assert_array_equal(np.asarray(out["rgb"]), 1.0)


def test_masked_deform_args_one_compile_across_poses():
    """deform_args are traced operands: two different arg pytrees reuse the tile jit."""
    from humanliff_tpu.nerf.renderer import render_image_masked, _masked_tile_fn

    decoder, params, planes, ro, rd, near, far, box = _setup(R=32)
    cfg = RenderConfig(n_samples=8, n_importance=8, perturb=False, density_noise=False)

    def shift_deform(pts, dirs, args):
        return pts + args["offset"], dirs

    mask = np.ones(32, bool)
    outs = []
    for off in (0.0, 0.3):
        outs.append(render_image_masked(
            decoder, params, planes, ro, rd, near, far, mask, box, cfg, chunk=16,
            deform_fn=shift_deform, deform_args={"offset": jnp.float32(off)},
        ))
    # different offsets must give different renders (args actually threaded)
    assert not np.allclose(np.asarray(outs[0]["rgb"]), np.asarray(outs[1]["rgb"]))
    eval_cfg = cfg
    import dataclasses as _dc
    eval_cfg = _dc.replace(cfg, perturb=False, density_noise=False)
    fn = _masked_tile_fn(decoder, eval_cfg, shift_deform)
    assert fn._cache_size() == 1  # one compilation served both poses

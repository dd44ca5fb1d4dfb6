"""Canonical-space (TightCap-mode) stage-1 step: SMPL deform inside the renderer."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.bodymodel import lbs_forward
from humanliff_tpu.nerf import NeRFDecoder, RenderConfig
from humanliff_tpu.train.optim import make_stage1_optimizer
from humanliff_tpu.train.stage1 import Stage1Config, create_train_state, train_step
from tests.test_bodymodel import _synthetic_model


@pytest.mark.slow
def test_canonical_train_step_runs_and_descends():
    model = _synthetic_model(J=4, V=48)
    J = model.num_joints
    cfg = Stage1Config(
        num_instances=1,
        num_layers=2,
        triplane_dim=16,
        triplane_ch=27,
        render=RenderConfig(n_samples=12, n_importance=12),
        use_canonical_space=True,
    )
    decoder = NeRFDecoder()
    tx = make_stage1_optimizer()
    state = create_train_state(jax.random.key(0), cfg, decoder, tx)

    rng = np.random.default_rng(0)
    B, R = 2, 32
    poses = jnp.asarray(rng.normal(scale=0.2, size=(B, J * 3)).astype(np.float32))
    betas = jnp.asarray(rng.normal(scale=0.5, size=(B, 5)).astype(np.float32))
    t_poses = jnp.zeros((B, J * 3))
    verts, _ = lbs_forward(model, poses, betas)

    batch = {
        "instance_idx": jnp.zeros((B,), jnp.int32),
        "layer_idx": jnp.asarray([0, 1]),
        "rays_o": jnp.asarray(np.tile([[0, 0, 3.0]], (B, R, 1)).astype(np.float32)),
        "rays_d": jnp.asarray(
            (rng.normal(size=(B, R, 3)) * 0.2 + [0, 0, -1]).astype(np.float32)
        ),
        "near": jnp.full((B, R), 2.0),
        "far": jnp.full((B, R), 4.0),
        "box_warp": jnp.broadcast_to(jnp.asarray([[-1.0] * 3, [1.0] * 3]), (B, 2, 3)),
        "rgb": jnp.full((B, R, 3), 0.5),
        "bkgd_msk": jnp.ones((B, R)),
        "ray_mask": jnp.ones((B, R)),
        "poses": poses,
        "betas": betas,
        "smpl_verts": verts,
        "R": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        "Th": jnp.zeros((B, 3)),
        "t_poses": t_poses,
    }

    key = jax.random.key(1)
    losses = []
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, aux = train_step(state, batch, sub, decoder, cfg, model)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_make_eval_deform_fn_matches_batched():
    """The eval deform (world->SMPL + inverse-LBS) equals the batched train-path
    math at B=1, including the reference's dirs-minus-Th quirk (renderer.py:133)."""
    from humanliff_tpu.bodymodel.canonical import (
        deform_to_canonical_batched,
        make_eval_deform_fn,
    )

    model = _synthetic_model(J=4, V=48)
    J = model.num_joints
    rng = np.random.default_rng(5)
    poses = jnp.asarray(rng.normal(scale=0.2, size=(J * 3,)).astype(np.float32))
    betas = jnp.asarray(rng.normal(scale=0.5, size=(5,)).astype(np.float32))
    t_poses = jnp.zeros((J * 3,))
    verts, _ = lbs_forward(model, poses[None], betas[None])

    theta = 0.3
    Rg = jnp.asarray(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
        jnp.float32,
    )
    Th = jnp.asarray([[0.1, -0.2, 0.05]], jnp.float32)

    M = 64
    pts = jnp.asarray(rng.normal(scale=0.5, size=(M, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))

    deform = make_eval_deform_fn(model)
    args = {"poses": poses, "betas": betas, "t_poses": t_poses,
            "R": Rg, "Th": Th, "smpl_verts": verts[0]}
    got_pts, got_dirs = deform(pts, dirs, args)

    smpl_pts = (pts - Th) @ Rg
    smpl_dirs = (dirs - Th) @ Rg
    want_pts, want_dirs = deform_to_canonical_batched(
        model, poses[None], betas[None], t_poses[None], verts,
        smpl_pts[None], smpl_dirs[None],
    )
    np.testing.assert_allclose(np.asarray(got_pts), np.asarray(want_pts[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dirs), np.asarray(want_dirs[0]), rtol=1e-5, atol=1e-5)


def test_canonical_eval_render_through_harness():
    """evaluate_views with deform_fn/deform_args_fn: a TightCap-style item renders
    finite images and sane metrics through the masked renderer."""
    from humanliff_tpu.bodymodel.canonical import make_eval_deform_fn
    from humanliff_tpu.eval.harness import evaluate_views

    model = _synthetic_model(J=4, V=48)
    J = model.num_joints
    rng = np.random.default_rng(7)
    H = W = 8
    N = H * W
    poses = rng.normal(scale=0.2, size=(J * 3,)).astype(np.float32)
    betas = rng.normal(scale=0.5, size=(5,)).astype(np.float32)
    verts, _ = lbs_forward(model, jnp.asarray(poses)[None], jnp.asarray(betas)[None])

    item = {
        "hw": np.asarray([H, W]),
        "rays_o": np.tile([[0, 0, 3.0]], (N, 1)).astype(np.float32),
        "rays_d": (rng.normal(size=(N, 3)) * 0.2 + [0, 0, -1]).astype(np.float32),
        "near": np.full((N,), 2.0, np.float32),
        "far": np.full((N,), 4.0, np.float32),
        "ray_mask": (rng.uniform(size=(N,)) < 0.7).astype(np.float32),
        "box_warp": np.asarray([[-1.0] * 3, [1.0] * 3], np.float32),
        "rgb": rng.uniform(size=(N, 3)).astype(np.float32),
        "poses": poses,
        "betas": betas,
        "t_poses": np.zeros((J * 3,), np.float32),
        "R": np.eye(3, dtype=np.float32),
        "Th": np.zeros((1, 3), np.float32),
        "smpl_verts": np.asarray(verts[0]),
    }
    decoder = NeRFDecoder()
    params = decoder.init(jax.random.key(0), jnp.zeros((1, 27)), jnp.zeros((1, 3)))
    planes = jnp.asarray(rng.normal(scale=0.1, size=(3, 9, 16, 16)).astype(np.float32))
    cfg = RenderConfig(n_samples=8, n_importance=8, perturb=False, density_noise=False)

    deform_args_fn = lambda it: {
        k: it[k] for k in ("poses", "betas", "t_poses", "R", "Th", "smpl_verts")
    }
    agg = evaluate_views(
        decoder, params, planes, [item], cfg, chunk=32,
        deform_fn=make_eval_deform_fn(model), deform_args_fn=deform_args_fn,
    )
    assert np.isfinite(agg["psnr"]) and np.isfinite(agg["ssim"])


def test_batched_deform_matches_single_item():
    """The component-wise batched inverse-LBS equals the (unchanged) single-item
    matrix implementation — guards the lane-padding rewrite."""
    from humanliff_tpu.bodymodel.canonical import (
        deform_to_canonical,
        deform_to_canonical_batched,
    )

    model = _synthetic_model(J=4, V=48)
    J = model.num_joints
    rng = np.random.default_rng(11)
    B, M = 3, 57
    poses = jnp.asarray(rng.normal(scale=0.3, size=(B, J * 3)).astype(np.float32))
    betas = jnp.asarray(rng.normal(scale=0.5, size=(B, 5)).astype(np.float32))
    t_poses = jnp.asarray(rng.normal(scale=0.1, size=(B, J * 3)).astype(np.float32))
    verts, _ = lbs_forward(model, poses, betas)
    pts = jnp.asarray(rng.normal(scale=0.5, size=(B, M, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))

    got_p, got_d = deform_to_canonical_batched(
        model, poses, betas, t_poses, verts, pts, dirs
    )
    # The batched path picks 1-NN with bf16 distances (MXU); near-ties may flip
    # a neighbor vs the single-item fp32 path. Points whose neighbor agrees must
    # match tightly; flipped-neighbor points must be rare.
    for b in range(B):
        want_p, want_d = deform_to_canonical(
            model, poses[b], betas[b], t_poses[b], verts[b], pts[b], dirs[b]
        )
        dp = np.abs(np.asarray(got_p[b]) - np.asarray(want_p)).max(-1)
        dd = np.abs(np.asarray(got_d[b]) - np.asarray(want_d)).max(-1)
        agree = dp < 1e-4
        assert agree.mean() > 0.95, agree.mean()
        np.testing.assert_array_less(dd[agree], 1e-3)

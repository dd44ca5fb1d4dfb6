"""Canonical-space (TightCap-mode) stage-1 step: SMPL deform inside the renderer."""

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.bodymodel import lbs_forward
from humanliff_tpu.nerf import NeRFDecoder, RenderConfig
from humanliff_tpu.train.optim import make_stage1_optimizer
from humanliff_tpu.train.stage1 import Stage1Config, create_train_state, train_step
from tests.test_bodymodel import _synthetic_model


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

"""Sharding tests on the 8-device CPU mesh: instance-sharded plane table,
replicated decoder, and distributed-equivalence of the stage-1 step."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig
from humanliff_tpu.parallel import make_mesh, shard_batch
from humanliff_tpu.parallel.mesh import shard_stage1_params
from humanliff_tpu.train.optim import make_stage1_optimizer
from humanliff_tpu.train.stage1 import (
    Stage1Config,
    TrainState,
    init_params,
    train_step,
)


def _make(cfg, decoder, tx, mesh=None):
    params = init_params(jax.random.key(0), cfg, decoder)
    if mesh is not None:
        params = shard_stage1_params(params, mesh)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )


def _batch(B, R=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "instance_idx": jnp.asarray(rng.integers(0, 16, B), jnp.int32),
        "layer_idx": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
        "rays_o": jnp.asarray(np.tile([[0, 0, 3.0]], (B, R, 1)), jnp.float32),
        "rays_d": jnp.asarray(
            rng.normal(size=(B, R, 3)) * 0.2 + [0, 0, -1], jnp.float32
        ),
        "near": jnp.full((B, R), 2.0),
        "far": jnp.full((B, R), 4.0),
        "box_warp": jnp.broadcast_to(jnp.asarray([[-1.0] * 3, [1.0] * 3]), (B, 2, 3)),
        "rgb": jnp.full((B, R, 3), 0.5),
        "bkgd_msk": jnp.ones((B, R)),
        "ray_mask": jnp.ones((B, R)),
    }


@pytest.mark.slow
def test_instance_sharded_table_step_matches_single_device():
    cfg = Stage1Config(
        num_instances=16,
        triplane_dim=16,
        triplane_ch=27,
        render=RenderConfig(n_samples=8, n_importance=8, perturb=False,
                            density_noise=False),
    )
    decoder = NeRFDecoder()
    tx = make_stage1_optimizer()
    batch = _batch(8)
    key = jax.random.key(1)

    # Single-device reference.
    s_ref = _make(cfg, decoder, tx)
    s_ref, aux_ref = train_step(s_ref, batch, key, decoder, cfg)

    # Sharded: table by instance, batch on data.
    mesh = make_mesh(8)
    s_sh = _make(cfg, decoder, tx, mesh)
    sharded_batch = shard_batch(batch, mesh)
    s_sh, aux_sh = train_step(s_sh, sharded_batch, key, decoder, cfg)

    np.testing.assert_allclose(
        float(aux_sh["loss"]), float(aux_ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_sh.params["planes"]),
        np.asarray(s_ref.params["planes"]),
        atol=1e-5,
    )
    # Table stays sharded across steps.
    sh = s_sh.params["planes"].sharding
    assert not sh.is_fully_replicated


@pytest.mark.slow
def test_mesh_sharded_sampling_matches_single_device():
    """B=8 sampling sharded over the 8-device mesh == single-device sampling,
    and the gathered result is fully replicated (the reference's all_gather,
    triplane_sample_layered.py:211-219)."""
    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.unet import UNetModel
    from humanliff_tpu.sampling.layered import generate_layer, generate_layer_sharded

    model = UNetModel(
        in_channels=6, model_channels=16, out_channels=6, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_classes=4,
        num_heads=2, cond_type="controlnet",
    )
    diffusion = create_diffusion(steps=1000, timestep_respacing="5")
    object.__setattr__(diffusion, "channel_axis", -1)
    x0 = jnp.zeros((1, 8, 8, 6))
    params = model.init(
        jax.random.key(0), x0, jnp.zeros((1,)), x0, jnp.zeros((1,), jnp.int32)
    )

    key = jax.random.key(7)
    B, S, C = 8, 8, 6
    ref = generate_layer(model, params, diffusion, 1, None, key, B, S, C)

    mesh = make_mesh(8)
    got = generate_layer_sharded(
        model, params, diffusion, 1, None, key, B, S, C, mesh
    )
    assert got.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_plane_table_sharding_layout():
    mesh = make_mesh(8)
    cfg = Stage1Config(num_instances=16, triplane_dim=8, triplane_ch=27)
    params = init_params(jax.random.key(0), cfg, NeRFDecoder())
    params = shard_stage1_params(params, mesh)
    # Instance axis split 8 ways: each shard holds 2 instances.
    shard_shapes = {s.data.shape for s in params["planes"].addressable_shards}
    assert shard_shapes == {(2, 4, 3, 9, 8, 8)}
    assert params["decoder"]["params"]["alpha"]["kernel"].sharding.is_fully_replicated


@pytest.mark.slow
def test_zero_sharded_stage2_matches_replicated():
    """ZeRO-1 partitioning of Adam moments + EMA across the 8-device mesh is
    numerically identical to replicated training, and the big state leaves
    actually end up sharded (VERDICT r1 item 7)."""
    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.unet import UNetModel
    from humanliff_tpu.parallel.mesh import (
        place_with_shardings,
        stage2_zero_shardings,
        zero_parallel_jit,
    )
    from humanliff_tpu.train.stage2 import (
        Stage2Config,
        create_stage2_state,
        train_step,
    )

    model = UNetModel(
        in_channels=6, model_channels=16, out_channels=6, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_classes=4,
        num_heads=2, cond_type="controlnet",
    )
    diffusion = create_diffusion(steps=1000, timestep_respacing="10")
    object.__setattr__(diffusion, "channel_axis", -1)
    cfg = Stage2Config(lr=1e-4, ema_rates=(0.999,))

    x0 = jnp.zeros((1, 8, 8, 6))
    params = model.init(
        jax.random.key(0), x0, jnp.zeros((1,)), x0, jnp.zeros((1,), jnp.int32)
    )
    B = 8
    rng = np.random.default_rng(3)
    batch = {
        "x": jnp.asarray(rng.normal(size=(B, 8, 8, 6)), jnp.float32),
        "x_cond": jnp.asarray(rng.normal(size=(B, 8, 8, 6)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
    }
    key = jax.random.key(11)

    # Replicated reference.
    s_ref = create_stage2_state(params, cfg, diffusion.num_timesteps)
    s_ref, m_ref = train_step(s_ref, batch, key, model, diffusion, cfg)

    # ZeRO-sharded run.
    mesh = make_mesh(8)
    s_z = create_stage2_state(params, cfg, diffusion.num_timesteps)
    shardings = stage2_zero_shardings(s_z, mesh)
    s_z = place_with_shardings(s_z, shardings)
    step = zero_parallel_jit(
        lambda s, b, k: train_step(s, b, k, model, diffusion, cfg),
        mesh, shardings,
    )
    s_z, m_z = step(s_z, shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(m_z["loss"]), float(m_ref["loss"]), rtol=1e-5)
    leaves_ref = jax.tree.leaves(s_ref.params)
    leaves_z = jax.tree.leaves(s_z.params)
    for a, b in zip(leaves_ref, leaves_z):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    # The heavy leaves really are partitioned (and stay partitioned post-step).
    big_opt = [
        l for l in jax.tree.leaves(s_z.opt_state)
        if getattr(l, "ndim", 0) >= 1 and max(l.shape) % 8 == 0 and max(l.shape) >= 8
    ]
    assert big_opt and all(not l.sharding.is_fully_replicated for l in big_opt)
    big_ema = [
        l for l in jax.tree.leaves(s_z.ema_params)
        if getattr(l, "ndim", 0) >= 1 and max(l.shape) % 8 == 0 and max(l.shape) >= 8
    ]
    assert big_ema and all(not l.sharding.is_fully_replicated for l in big_ema)


def test_initialize_multihost_gating(monkeypatch):
    """The multihost init (the reference's setup_dist, dist_util.py:52-62) only
    fires when coordinator env/kwargs are present — single-process is a no-op."""
    from humanliff_tpu.parallel.mesh import initialize_multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.append(kw))

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    initialize_multihost()
    assert calls == []

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")
    initialize_multihost()
    assert len(calls) == 1

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    initialize_multihost(coordinator_address="127.0.0.1:9999", num_processes=2,
                         process_id=0)
    assert len(calls) == 2 and calls[1]["num_processes"] == 2

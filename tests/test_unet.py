"""UNet tests: shapes, zero-init properties, conditioning modes, overfit-one-batch."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from humanliff_tpu.models import UNetModel, create_model_and_diffusion

pytestmark = pytest.mark.slow


def _tiny_unet(**kw):
    args = dict(
        in_channels=6,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        num_classes=4,
        num_heads=2,
        cond_type="controlnet",
    )
    args.update(kw)
    return UNetModel(**args)


def _init(model, B=2, size=8, cond=True):
    x = jnp.zeros((B, size, size, model.in_channels))
    t = jnp.zeros((B,))
    xc = jnp.zeros_like(x) if cond else None
    y = jnp.zeros((B,), jnp.int32) if model.num_classes else None
    params = model.init(jax.random.key(0), x, t, xc, y)
    return params, x, t, xc, y


def test_forward_shape_and_zero_init():
    model = _tiny_unet()
    params, x, t, xc, y = _init(model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    out = model.apply(params, x, t, xc, y)
    assert out.shape == x.shape
    # Final conv is zero-init (unet.py:471-475) -> output exactly zero at init.
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_controlnet_zero_projections_make_cond_inert_at_init():
    model = _tiny_unet()
    params, x, t, xc, y = _init(model)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    # Give the output conv nonzero weights so differences would be visible.
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim >= 1 else p, params
    )
    xc1 = jnp.zeros_like(x)
    xc2 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    o1 = model.apply(params, x, t, xc1, y)
    o2 = model.apply(params, x, t, xc2, y)
    # Perturbing every param broke the exact zero-projections, so outputs differ —
    # this is the wrong direction. Re-init and test with the true init instead.
    params0, *_ = _init(model)
    o1 = model.apply(params0, x, t, xc1, y)
    o2 = model.apply(params0, x, t, xc2, y)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_class_label_changes_output():
    model = _tiny_unet()
    params, x, t, xc, _ = _init(model)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    # train a step away from zero-init so label differences can propagate

    def loss(p):
        out = model.apply(p, x, t, xc, jnp.asarray([0, 1]))
        return ((out - 1.0) ** 2).mean()

    # Zero-init output convs block gradients on step 1; a few steps make the
    # label path live.
    for _ in range(3):
        g = jax.grad(loss)(params)
        params = jax.tree.map(lambda a, b: a - 0.1 * b, params, g)
    oa = model.apply(params, x, t, xc, jnp.asarray([0, 0]))
    ob = model.apply(params, x, t, xc, jnp.asarray([3, 3]))
    assert not np.allclose(np.asarray(oa), np.asarray(ob))


@pytest.mark.parametrize("mode", ["concat", "AdaGN", "cross_attention"])
def test_alt_cond_modes_forward(mode):
    model = _tiny_unet(cond_type=mode)
    B, size = 2, 8
    x = jnp.zeros((B, size, size, 6))
    t = jnp.zeros((B,))
    xc = jnp.zeros_like(x)
    y = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.key(0), x, t, xc, y)
    out = model.apply(params, x, t, xc, y)
    assert out.shape == (B, size, size, 6)


def test_3d_aware_shape_roundtrip():
    model = _tiny_unet(use_3d_aware=True, cond_type="controlnet")
    params, x, t, xc, y = _init(model)
    out = model.apply(params, x, t, xc, y)
    assert out.shape == x.shape


def test_learn_sigma_output_channels():
    model = _tiny_unet(out_channels=12)  # learn_sigma doubles channels
    params, x, t, xc, y = _init(model)
    out = model.apply(params, x, t, xc, y)
    assert out.shape[-1] == 12


def test_overfit_one_batch_diffusion_loss_drops():
    """End-to-end: UNet + diffusion training loss on one fixed batch must fall."""
    from humanliff_tpu.diffusion.respace import create_diffusion

    model = _tiny_unet()
    diffusion = create_diffusion(steps=100, rescale_timesteps=True)
    # NHWC pipeline
    object.__setattr__(diffusion, "channel_axis", -1)

    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32) * 0.3)
    xc = jnp.zeros_like(x0)
    y = jnp.asarray([1, 2])
    params, *_ = _init(model)
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_t, k_loss = jax.random.split(key)
        t = jax.random.randint(k_t, (2,), 0, diffusion.num_timesteps)

        def loss_fn(p):
            model_fn = lambda x, ts, xcond, y=None: model.apply(p, x, ts, xcond, y)
            terms = diffusion.training_losses(
                model_fn, x0, xc, t, k_loss, model_kwargs={"y": y}
            )
            return terms["loss"].mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(4)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.7, (early, late)


def test_factory_flagship_config_builds():
    model, diffusion = create_model_and_diffusion(
        image_size=32,  # keep the test small; same code path as 256
        in_channels=6,
        out_channels=6,
        num_channels=32,
        num_res_blocks=1,
        attention_resolutions="8",
        timestep_respacing="10",
        diffusion_steps=100,
    )
    assert diffusion.num_timesteps == 10
    x = jnp.zeros((1, 32, 32, 6))
    params = model.init(
        jax.random.key(0), x, jnp.zeros((1,)), x, jnp.zeros((1,), jnp.int32)
    )
    out = model.apply(params, x, jnp.zeros((1,)), x, jnp.zeros((1,), jnp.int32))
    assert out.shape == x.shape


@pytest.mark.parametrize("B,expect_barrier", [(1, False), (2, True),
                                              (4, True), (8, False)])
def test_groupnorm_barrier_gated_to_pathological_batches(B, expect_barrier):
    """The conv->fp32-GroupNorm fusion barrier (docs/BATCH_PATHOLOGY.md) must
    fire ONLY in the measured pathological window 1 < B < 8: B=1 would pay ~7%
    for nothing and B=8 regresses 160->185 ms with it."""
    model = _tiny_unet()
    params, x, t, xc, y = _init(model, B=B)
    hlo = jax.jit(model.apply).lower(params, x, t, xc, y).as_text()
    assert ("optimization_barrier" in hlo) == expect_barrier, (B, expect_barrier)

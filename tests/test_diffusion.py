"""Diffusion-core tests: closed-form identities, respacing, sampler loops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from humanliff_tpu.diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    get_named_beta_schedule,
    space_timesteps,
    spaced_diffusion,
)
from humanliff_tpu.diffusion.respace import create_diffusion
from humanliff_tpu.diffusion.resample import (
    LossSecondMomentResampler,
    UniformSampler,
)


def _diffusion(T=100, **kw):
    return GaussianDiffusion(betas=get_named_beta_schedule("linear", T), **kw)


def test_schedule_constants_are_consistent():
    d = _diffusion(1000)
    np.testing.assert_allclose(
        d.alphas_cumprod, np.cumprod(1 - d.betas), rtol=1e-12
    )
    assert d.alphas_cumprod[-1] < 5e-5  # near-pure noise at T
    # posterior mean coefficients sum ~1 at small noise
    assert np.all(d.posterior_variance >= 0)


def test_q_sample_statistics():
    d = _diffusion(100)
    key = jax.random.key(0)
    x0 = jnp.ones((4096, 1))
    t = jnp.full((4096,), 50, jnp.int32)
    noise = jax.random.normal(key, x0.shape)
    xt = d.q_sample(x0, t, noise)
    # mean ~ sqrt(ac)*1, std ~ sqrt(1-ac)
    ac = d.alphas_cumprod[50]
    assert abs(float(xt.mean()) - np.sqrt(ac)) < 0.05
    assert abs(float(xt.std()) - np.sqrt(1 - ac)) < 0.05


def test_eps_xstart_inversion():
    d = _diffusion(100)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(8, 3, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(8, 3, 4, 4)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 100, size=(8,)))
    xt = d.q_sample(x0, t, eps)
    x0_rec = d._predict_xstart_from_eps(xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
    eps_rec = d._predict_eps_from_xstart(xt, t, x0_rec)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-2)


def test_posterior_identity_at_perfect_model():
    # With a model that predicts the true eps, p_mean must equal q_posterior mean.
    d = _diffusion(100)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(4, 2, 4, 4)).astype(np.float32)) * 0.5
    eps = jnp.asarray(rng.normal(size=(4, 2, 4, 4)).astype(np.float32))
    t = jnp.asarray([3, 20, 50, 99])
    xt = d.q_sample(x0, t, eps)

    out = d.p_mean_variance(
        lambda x, ts, xc: eps, xt, t, clip_denoised=False
    )
    true_mean, _, _ = d.q_posterior_mean_variance(x0, xt, t)
    np.testing.assert_allclose(
        np.asarray(out["mean"]), np.asarray(true_mean), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_xstart"]), np.asarray(x0), atol=1e-3
    )


def test_training_losses_zero_for_perfect_model():
    d = _diffusion(100)
    key = jax.random.key(2)
    x0 = jnp.zeros((4, 2, 4, 4))
    t = jnp.asarray([0, 10, 50, 99])
    noise = jax.random.normal(key, x0.shape)

    losses = d.training_losses(
        lambda x, ts, xc: noise, x0, None, t, key, noise=noise
    )
    np.testing.assert_allclose(np.asarray(losses["mse"]), 0.0, atol=1e-10)


def test_respacing_matches_reference_rule():
    T = 1000
    use = space_timesteps(T, "250")
    assert len(use) == 250
    betas = get_named_beta_schedule("linear", T)
    d = spaced_diffusion(betas=betas, use_timesteps=use)
    assert d.num_timesteps == 250
    # Respaced cumulative alphas must equal the original at retained steps.
    full = GaussianDiffusion(betas=betas)
    kept = sorted(use)
    np.testing.assert_allclose(
        d.alphas_cumprod, full.alphas_cumprod[kept], rtol=1e-10
    )
    # timestep_map maps compact -> original indices.
    np.testing.assert_array_equal(d.timestep_map, np.asarray(kept))


def test_scale_timesteps_rescaled():
    d = create_diffusion(steps=1000, timestep_respacing="250", rescale_timesteps=True)
    t = jnp.asarray([0, 124, 249])
    scaled = np.asarray(d.scale_timesteps(t))
    # maps to original steps then * 1000/1000
    assert scaled[0] == d.timestep_map[0]
    assert scaled[-1] == d.timestep_map[-1]


def test_ddim_deterministic_sampling_recovers_simple_target():
    """A tiny sanity: with a perfect eps-model for a zero image, sampling returns ~0."""
    d = create_diffusion(steps=100, timestep_respacing="25")

    def model(x, ts, xc):
        # predict eps = x / sqrt(1-ac) for x0=0: eps = x_t / sqrt(1-ac_t)
        tm = jnp.asarray(d.timestep_map)
        # ts is rescaled float; invert the mapping by nearest lookup
        orig = ts / (1000.0 / d.original_num_steps)
        idx = jnp.argmin(jnp.abs(tm[None, :] - orig[:, None]), axis=1)
        ac = jnp.asarray(d.alphas_cumprod, jnp.float32)[idx]
        return x / jnp.sqrt(1 - ac).reshape(-1, 1, 1, 1)

    key = jax.random.key(3)
    sample = d.ddim_sample_loop(model, (2, 1, 8, 8), key)
    assert float(jnp.abs(sample).max()) < 0.1


def test_p_sample_loop_shapes_and_finite():
    d = create_diffusion(steps=50)
    model = lambda x, ts, xc: jnp.zeros_like(x)
    out = d.p_sample_loop(model, (2, 3, 8, 8), jax.random.key(0))
    assert out.shape == (2, 3, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_uniform_sampler():
    s = UniformSampler(100)
    t, w = s.sample(jax.random.key(0), 512)
    assert t.shape == (512,) and w.shape == (512,)
    assert int(t.min()) >= 0 and int(t.max()) < 100
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_loss_aware_sampler_warmup_and_weighting():
    s = LossSecondMomentResampler(num_timesteps=10, history_per_term=4)
    state = s.init_state()
    # Before warmup: uniform-ish probabilities.
    t, w = s.sample(state, jax.random.key(0), 64)
    assert t.shape == (64,)

    # Feed high losses at t=3, low elsewhere, until warmed.
    key = jax.random.key(1)
    for _ in range(16):
        key, k = jax.random.split(key)
        ts = jax.random.randint(k, (10,), 0, 10)
        losses = jnp.where(ts == 3, 10.0, 0.1)
        state = s.update(state, ts, losses)
    counts = np.asarray(state["counts"])
    assert (counts == 4).all()
    p = np.asarray(s._weights(state))
    assert p[3] > 5 * p.mean()  # hard timestep upweighted
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)


def test_learned_range_var_split():
    d = _diffusion(100, model_var_type=ModelVarType.LEARNED_RANGE,
                   loss_type=LossType.RESCALED_MSE)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.normal(size=(2, 3, 4, 4)).astype(np.float32))
    t = jnp.asarray([5, 50])

    def model(x, ts, xc):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)

    losses = d.training_losses(model, x0, None, t, jax.random.key(0))
    assert "vb" in losses and losses["loss"].shape == (2,)
    assert np.isfinite(np.asarray(losses["loss"])).all()


def test_p_sample_loop_progressive_matches_scan_loop():
    """The progressive generator derives the identical PRNG stream as the
    compiled scan, so its final sample is bit-equal to p_sample_loop
    (gaussian_diffusion.py:445-482 parity)."""
    d = create_diffusion(steps=20)
    model = lambda x, ts, xc: 0.1 * x
    key = jax.random.key(7)
    # clip_denoised=False keeps the chain linear: the scan-compiled and
    # per-step-jitted programs may fuse differently, and the ±1 clip would
    # amplify float-level differences into sign flips.
    ref = d.p_sample_loop(model, (2, 4, 4, 3), key, clip_denoised=False)

    steps = list(
        d.p_sample_loop_progressive(model, (2, 4, 4, 3), key, clip_denoised=False)
    )
    assert len(steps) == d.num_timesteps
    np.testing.assert_allclose(
        np.asarray(steps[-1]["sample"]), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    for out in steps[:3]:
        assert out["pred_xstart"].shape == (2, 4, 4, 3)
        assert np.isfinite(np.asarray(out["pred_xstart"])).all()


def test_ddim_sample_loop_progressive_matches_scan_loop():
    d = create_diffusion(steps=20)
    model = lambda x, ts, xc: 0.1 * x
    key = jax.random.key(9)
    ref = d.ddim_sample_loop(model, (1, 4, 4, 3), key, clip_denoised=False)
    steps = list(
        d.ddim_sample_loop_progressive(model, (1, 4, 4, 3), key, clip_denoised=False)
    )
    np.testing.assert_allclose(
        np.asarray(steps[-1]["sample"]), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_progressive_loop_partial_model_fn_matches_closure():
    """A ``jax.tree_util.Partial`` model_fn (params as traced jit args — the
    flagship-scale path; a closure would embed params as HLO constants) must
    produce the same chain as the plain-closure fallback, sharing ONE cache
    entry across different param values."""
    from humanliff_tpu.diffusion.gaussian import _PROG_STEP_CACHE

    d = create_diffusion(steps=12)
    key = jax.random.key(3)

    def apply_fn(params, x, ts, xc):
        return params["scale"] * x

    closure = lambda x, ts, xc: 0.1 * x
    ref = [
        np.asarray(o["sample"])
        for o in d.p_sample_loop_progressive(closure, (1, 4, 4, 3), key,
                                             clip_denoised=False)
    ]

    for scale in (0.1, 0.1):  # two calls, distinct param pytrees
        mf = jax.tree_util.Partial(apply_fn, {"scale": jnp.float32(scale)})
        out = [
            np.asarray(o["sample"])
            for o in d.p_sample_loop_progressive(mf, (1, 4, 4, 3), key,
                                                 clip_denoised=False)
        ]
        np.testing.assert_allclose(out[-1], ref[-1], rtol=1e-5, atol=1e-5)

    partial_keys = [k for k in _PROG_STEP_CACHE if k[0] == id(d) and
                    k[-1] == "partial"]
    assert len(partial_keys) == 1  # one jit shared across param values


def test_generate_layer_progressive_records_trajectory():
    from humanliff_tpu.models.unet import UNetModel
    from humanliff_tpu.sampling.layered import generate_layer_progressive

    model = UNetModel(
        in_channels=6, model_channels=16, out_channels=6, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1,), num_classes=4,
        num_heads=2, cond_type="controlnet",
    )
    d = create_diffusion(steps=10)
    object.__setattr__(d, "channel_axis", -1)
    x0 = jnp.zeros((1, 8, 8, 6))
    params = model.init(
        jax.random.key(0), x0, jnp.zeros((1,)), x0, jnp.zeros((1,), jnp.int32)
    )
    samples, traj = generate_layer_progressive(
        model, params, d, layer_idx=1, x_cond=None, key=jax.random.key(1),
        batch_size=1, image_size=8, channels=6, record_every=4,
    )
    assert samples.shape == (1, 8, 8, 6)
    ts = [t for t, _ in traj]
    assert ts[0] == 9 and ts[-1] == 0  # first and final steps always recorded
    assert all(p.shape == (1, 8, 8, 6) for _, p in traj)

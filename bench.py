"""Benchmark: flagship tri-plane denoise rate on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is denoise steps/sec/chip on the flagship Stage-2 config
(256x256x27 ControlNet UNet, batch 1) — the quantity that bounds the 4-layer
generation wall-clock (250 respaced steps x 4 layers; BASELINE.md's <30s target on
v5e-8 needs ~33 steps/s aggregate). The reference publishes no numbers
(BASELINE.json: published={}), so vs_baseline is reported against the v5e-8 target
rate prorated to one chip (33.3/8 ≈ 4.17 steps/s/chip).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.factory import create_model

    model = create_model(
        image_size=256,
        in_channels=27,
        num_channels=192,
        out_channels=27,
        num_res_blocks=3,
        learn_sigma=False,
        class_cond=True,
        attention_resolutions="32,16,8",
        num_heads=4,
        num_heads_upsample=-1,
        use_scale_shift_norm=True,
        cond_type="controlnet",
        use_3d_aware=False,
        dropout=0.0,
    )
    diffusion = create_diffusion(steps=1000, timestep_respacing="250")
    object.__setattr__(diffusion, "channel_axis", -1)

    B = 1
    dtype = jnp.bfloat16
    x = jnp.zeros((B, 256, 256, 27), jnp.float32)
    t0 = jnp.zeros((B,), jnp.float32)
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t0, x, y)


    STEPS = 25  # scan chunk large enough to amortize dispatch

    # NOTE: params must be an explicit argument — closing over them would embed
    # the whole tree as HLO constants and stall the (remote) compiler.
    @jax.jit
    def denoise_chunk(params, x, key):
        x_cond = jnp.zeros_like(x)
        # Cast params too: fp32 params would promote convs back to fp32 compute.
        p16 = jax.tree.map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
        )

        def model_fn(xx, ts, xc, y=y):
            out = model.apply(p16, xx.astype(dtype), ts, xc.astype(dtype), y)
            return out.astype(jnp.float32)

        def step(x, inp):
            t_scalar, k = inp
            t = jnp.full((B,), t_scalar, jnp.int32)
            x, _ = diffusion.p_sample(
                model_fn, x, x_cond, t, k, True, {"y": y}
            )
            return x, None

        ts = jnp.arange(diffusion.num_timesteps - 1, diffusion.num_timesteps - 1 - STEPS, -1)
        keys = jax.random.split(key, STEPS)
        x, _ = jax.lax.scan(step, x, (ts, keys))
        return x

    def force_sync(o):
        # Tunneled backends can return from block_until_ready early; reading a
        # value back is the only trustworthy sync.
        return float(jnp.sum(o))

    key = jax.random.key(1)
    x = jax.random.normal(key, (B, 256, 256, 27))
    # Warmup/compile
    out = denoise_chunk(params, x, key)
    force_sync(out)

    t_start = time.perf_counter()
    REPS = 4
    for i in range(REPS):
        out = denoise_chunk(params, out, jax.random.fold_in(key, i))
    force_sync(out)
    dt = time.perf_counter() - t_start

    steps_per_sec = (STEPS * REPS) / dt
    target_per_chip = 33.3 / 8.0  # <30s 4-layer target prorated to one chip
    print(
        json.dumps(
            {
                "metric": "triplane_denoise_steps_per_sec_chip",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / target_per_chip, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

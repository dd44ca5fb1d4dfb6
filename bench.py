"""Benchmark: full 4-layer tri-plane generation wall-clock on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

This is BASELINE.md's headline target: "full 4-layer tri-plane generation ... in
<30 s on a v5e-8". We measure the flagship configuration (256x256x27 ControlNet
UNet, 250 respaced DDPM steps per layer, bf16, batch 1) on however many chips are
local — currently ONE — and report vs_baseline = 30s / measured, so >1.0 beats the
target (on 1/8th of the target hardware when single-chip).

Timing notes: sync is by value readback (block_until_ready is unreliable on
tunneled TPU backends); the persistent XLA cache makes repeat runs skip the
~2 min compile.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.factory import create_model
    from humanliff_tpu.sampling.layered import generate_all_layers
    from humanliff_tpu.utils.profiling import force_sync
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()

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

    x0 = jnp.zeros((1, 256, 256, 27))
    # Params must be explicit jit args (closures embed them as HLO constants).
    params = jax.jit(model.init)(
        jax.random.key(0), x0, jnp.zeros((1,)), x0, jnp.zeros((1,), jnp.int32)
    )
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )

    class Bf16Model:
        """bf16 compute adapter; hashable by id for jit static args."""

        def apply(self, p, x, t, xc, y, **kw):
            out = model.apply(
                p, x.astype(jnp.bfloat16), t,
                None if xc is None else xc.astype(jnp.bfloat16), y, **kw,
            )
            return out.astype(jnp.float32)

        def __hash__(self):
            return id(self)

        def __eq__(self, other):
            return self is other

    wrap = Bf16Model()

    def run(key):
        out = generate_all_layers(
            wrap, params, diffusion, key, batch_size=1, image_size=256, channels=27
        )
        force_sync(out)
        return out

    run(jax.random.key(1))  # warmup / compile (persistent-cached across runs)
    t0 = time.perf_counter()
    run(jax.random.key(2))
    dt = time.perf_counter() - t0

    target_s = 30.0  # BASELINE.md: <30 s on a v5e-8 (we run on len(jax.devices()))
    print(
        json.dumps(
            {
                "metric": "fourlayer_generation_wallclock",
                "value": round(dt, 2),
                "unit": f"s_on_{len(jax.devices())}_chip",
                "vs_baseline": round(target_s / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

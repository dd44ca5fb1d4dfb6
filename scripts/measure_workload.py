"""Measure the 25x4 reference sampling workload END-TO-END on the chip.

bench.py costs the mixed-batch plan from measured chain primitives (one B=1
chain + one B=8 chain) — an honest projection, but the planner's actual
execution path (sampling/layered.generate_workload: plan -> chain-major
groups -> padded-lane trim -> host concat) had never been timed as a whole
(VERDICT r4 item 6). This probe runs the real thing: 25 samples x 4 layers,
the same workload as the reference's sample scripts
(triplane_scripts/SynBody_triplane_sample_layered_*.sh, strictly B=1 there).

Writes runs/probes/workload_25x4.json; bench.py reports the measured number
when this file exists. Run only when nothing else owns the TPU (~8 min).
"""

from __future__ import annotations

import json
import os
import time

NUM_SAMPLES = 25


def main():
    import jax
    import jax.numpy as jnp

    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.factory import create_model
    from humanliff_tpu.sampling.layered import generate_workload, plan_workload
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()

    model = create_model(
        image_size=256, in_channels=27, num_channels=192, out_channels=27,
        num_res_blocks=3, learn_sigma=False, class_cond=True,
        attention_resolutions="32,16,8", num_heads=4, num_heads_upsample=-1,
        use_scale_shift_norm=True, cond_type="controlnet", use_3d_aware=False,
        dropout=0.0,
    )
    diffusion = create_diffusion(steps=1000, timestep_respacing="250")
    object.__setattr__(diffusion, "channel_axis", -1)

    x0 = jnp.zeros((1, 256, 256, 27))
    params = jax.jit(model.init)(
        jax.random.key(0), x0, jnp.zeros((1,)), x0, jnp.zeros((1,), jnp.int32)
    )
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )

    class Bf16Model:
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
    plan = plan_workload(NUM_SAMPLES)
    print(f"plan for {NUM_SAMPLES}: {plan}")

    # Warm the two jitted chain programs (B=8, B=1) so the measurement is the
    # workload, not compilation — generate_workload with 9 samples runs one
    # B=8 group and one B=1 group through the identical code path.
    t0 = time.perf_counter()
    out = generate_workload(
        wrap, params, diffusion, jax.random.key(1), 9,
        image_size=256, channels=27,
    )
    warm_s = time.perf_counter() - t0
    print(f"warmup (9 samples, compile included): {warm_s:.1f}s")

    t0 = time.perf_counter()
    out = generate_workload(
        wrap, params, diffusion, jax.random.key(2), NUM_SAMPLES,
        image_size=256, channels=27,
    )
    # generate_workload returns host-concatenated numpy-backed arrays — the
    # construction already synced; touch a value anyway (tunnel rule).
    checksum = float(jnp.sum(next(iter(out.values()))[0, ::64, ::64]))
    wall_s = time.perf_counter() - t0
    shapes = {k: list(v.shape) for k, v in out.items()}
    print(f"measured 25x4 end-to-end: {wall_s:.1f}s (checksum {checksum:.3f})")

    os.makedirs("runs/probes", exist_ok=True)
    with open("runs/probes/workload_25x4.json", "w") as f:
        json.dump({
            "num_samples": NUM_SAMPLES,
            "plan": plan,
            "measured_s": round(wall_s, 1),
            "warmup_9sample_s": round(warm_s, 1),
            "device": jax.devices()[0].device_kind,
            "shapes": shapes,
        }, f, indent=2)
    print("wrote runs/probes/workload_25x4.json")


if __name__ == "__main__":
    main()

"""Benchmark: the BASELINE.md headline — full 4-layer tri-plane generation PLUS a
512^2 novel-view render — measured end-to-end on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

- value / vs_baseline: combined wall-clock for (4 x 250-step DDPM generation of the
  flagship 256x256x27 ControlNet UNet) + (one 512^2 bf16 novel-view render of the
  final layer at 128+128 samples); vs_baseline = 30s / measured, so >1.0 beats the
  "<30 s on a v5e-8" target — on ONE chip when single-chip.
- extras: the split (generation_s, render_s), UNet denoise steps/s, and MFU of the
  denoise step from XLA's compiled FLOP count vs the chip's peak.

Timing notes: sync is by value readback (block_until_ready is unreliable on
tunneled TPU backends); the persistent XLA cache makes repeat runs skip the
~2 min compile.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak matmul FLOP/s per chip by device kind (public specs).
_PEAK_FLOPS = {
    "v5 lite": 197e12,  # TPU v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6": 918e12,  # Trillium
}


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in _PEAK_FLOPS.items():
        if k in kind:
            return v
    return None


def main() -> None:
    from humanliff_tpu.data.raygen import full_image_rays
    from humanliff_tpu.data.view_datasets import NovelViewCameras
    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.factory import create_model
    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.nerf.renderer import RenderConfig, render_image_masked
    from humanliff_tpu.sampling.layered import (
        generate_all_layers,
        planes_image_to_triplane,
    )
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

    # ---- 1. Four-layer generation -------------------------------------------
    def run(key):
        out = generate_all_layers(
            wrap, params, diffusion, key, batch_size=1, image_size=256, channels=27
        )
        force_sync(out)
        return out

    layers = run(jax.random.key(1))  # warmup / compile (persistent-cached)
    t0 = time.perf_counter()
    layers = run(jax.random.key(2))
    generation_s = time.perf_counter() - t0

    # ---- 2. Denoise steps/s + MFU --------------------------------------------
    N_STEPS = 50

    @jax.jit
    def denoise_chain(p, x, xc, y):
        def body(carry, t):
            x = carry
            eps = wrap.apply(p, x, jnp.full((x.shape[0],), t, jnp.float32), xc, y)
            return x - 0.01 * eps, ()

        out, _ = jax.lax.scan(body, x, jnp.arange(N_STEPS, dtype=jnp.float32))
        return out

    x = jnp.zeros((1, 256, 256, 27))
    y = jnp.zeros((1,), jnp.int32)
    force_sync(denoise_chain(params, x, x, y))
    t0 = time.perf_counter()
    force_sync(denoise_chain(params, x, x, y))
    steps_per_s = N_STEPS / (time.perf_counter() - t0)

    mfu = None
    try:
        one = jax.jit(lambda p, x, xc, y: wrap.apply(
            p, x, jnp.zeros((1,), jnp.float32), xc, y))
        cost = one.lower(params, x, x, y).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        peak = _peak_flops()
        if flops > 0 and peak:
            mfu = flops * steps_per_s / peak
    except Exception:
        pass

    # ---- 2b. 25x4 reference-workload generation strategy ---------------------
    # The reference samples 25 subjects x 4 layers at batch 1
    # (triplane_scripts/SynBody_triplane_sample_layered_*.sh). Single-chip
    # batching is only clean at B=1 and B=8 (B=2/4 hit an XLA tiling
    # pathology — see scripts/probe_unet_batch.py); measure one 250-step
    # layer chain at B=8 and cost the strategies from the measured chain
    # primitives. The MIXED plan (sampling/layered.plan_workload DP:
    # [8, 8, 8, 1] for N=25) is what generate_workload actually executes.
    from humanliff_tpu.sampling.layered import generate_layer, plan_workload

    def one_layer_chain(B, key):
        out = generate_layer(
            wrap, params, diffusion, 0, None, key, B, 256, 27
        )
        force_sync(out)

    one_layer_chain(8, jax.random.key(5))  # compile
    t0 = time.perf_counter()
    one_layer_chain(8, jax.random.key(6))
    layer_b8_s = time.perf_counter() - t0

    layer_b1_s = generation_s / 4.0
    measured_costs = {1: layer_b1_s, 8: layer_b8_s}
    naive_25x4_s = 25.0 * generation_s  # 25 sequential B=1 4-layer chains
    batched_25x4_s = float(np.ceil(25 / 8)) * 4.0 * layer_b8_s
    mixed_plan = plan_workload(25, measured_costs)
    mixed_25x4_s = 4.0 * sum(measured_costs[b] for b in mixed_plan)
    workload_25x4_s = min(naive_25x4_s, batched_25x4_s, mixed_25x4_s)
    # END-TO-END measurement of the mixed plan (generate_workload through the
    # real execution path), when scripts/measure_workload.py has run on this
    # machine — otherwise the composed-from-primitives projection above.
    mixed_measured_s = None
    try:
        import os

        probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "runs", "probes", "workload_25x4.json")
        with open(probe) as f:
            mixed_measured_s = float(json.load(f)["measured_s"])
        # The measured end-to-end number REPLACES the mixed projection in the
        # headline min (even if slower — honesty over optimism).
        workload_25x4_s = min(naive_25x4_s, batched_25x4_s, mixed_measured_s)
    except (OSError, KeyError, ValueError):
        pass

    # ---- 3. 512^2 novel-view render of the final generated layer -------------
    S = 512
    bounds = np.asarray([[-1.0, -1.2, -1.0], [1.0, 1.2, 1.0]], np.float32)
    final = next(reversed(layers.values()))[0]
    planes = planes_image_to_triplane(jnp.asarray(final, jnp.bfloat16))
    decoder = NeRFDecoder(d_in=27)
    dec_params = decoder.init(
        jax.random.key(3), jnp.zeros((8, 27)), jnp.zeros((8, 3))
    )
    dec_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), dec_params)
    cams = NovelViewCameras(image_size=S)
    K, R, T = cams.camera(0)
    ro, rd, near, far, mask = full_image_rays(S, S, K, R, T, bounds)
    cfg = RenderConfig(n_samples=128, n_importance=128, perturb=False,
                       density_noise=False)

    # The default decode tier: density-grid coarse pass + empty-ray termination
    # (nerf/fastpath.py). A random-init decoder gives diffuse density, so NO rays
    # terminate here — this is the worst case; real scenes run ~3x faster.
    from humanliff_tpu.nerf.fastpath import build_density_grid, render_image_fast

    def render_once():
        grid = build_density_grid(decoder, dec_params, planes, bounds,
                                  resolution=128)
        out = render_image_fast(
            decoder, dec_params, planes, grid, ro, rd, near, far, mask,
            bounds, cfg, outputs=("rgb",),
        )
        return out

    render_once()  # warmup / compile
    t0 = time.perf_counter()
    render_once()
    render_s = time.perf_counter() - t0

    def render_exact():
        out = render_image_masked(
            decoder, dec_params, planes, ro, rd, near, far, mask,
            jnp.asarray(bounds), cfg, outputs=("rgb",),
        )
        return out

    render_exact()
    t0 = time.perf_counter()
    render_exact()
    render_exact_s = time.perf_counter() - t0

    total_s = generation_s + render_s
    target_s = 30.0  # BASELINE.md: <30 s on a v5e-8 (we run on len(jax.devices()))
    print(
        json.dumps(
            {
                "metric": "fourlayer_gen_plus_512render_wallclock",
                "value": round(total_s, 2),
                "unit": f"s_on_{len(jax.devices())}_chip",
                "vs_baseline": round(target_s / total_s, 3),
                "generation_s": round(generation_s, 2),
                "render_s": round(render_s, 2),
                "render_exact_s": round(render_exact_s, 2),
                "denoise_steps_per_s": round(steps_per_s, 2),
                "mfu": None if mfu is None else round(mfu, 4),
                "workload_25x4_generation_s": round(workload_25x4_s, 1),
                "workload_25x4_naive_b1_s": round(naive_25x4_s, 1),
                "workload_25x4_batched_b8_s": round(batched_25x4_s, 1),
                "workload_25x4_mixed_s": round(mixed_25x4_s, 1),
                "workload_25x4_mixed_measured_s": (
                    None if mixed_measured_s is None
                    else round(mixed_measured_s, 1)),
                "workload_25x4_plan": mixed_plan,
            }
        )
    )


if __name__ == "__main__":
    main()

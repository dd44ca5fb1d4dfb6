"""Picard window-parallel sampling: measured (tol, wall-clock, fidelity) curve.

VERDICT r3 item 5: the multi-chip generation-scaling story rested on a
projection; this probe measures the real operating points on the actual chip
at flagship scale (256x256x27 ControlNet UNet, 250 respaced steps, B=1):

- wall-clock + model-call count + slide coefficient (mean accepted steps per
  window iteration) for tol in {0, 1e-3, 5e-3, 1e-2},
- plane-space PSNR of each tol's sample against the tol=0 sample (which is
  bit-equal to the sequential chain per tests/test_parallel_sampling.py),
- the sequential-chain baseline on the same key.

Writes runs/probes/picard_tol.json and prints a markdown table for
docs/MIGRATION.md. Run only when nothing else owns the TPU.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TOLS = (0.0, 1e-3, 5e-3, 1e-2)
WINDOW = 8


def main():
    import jax
    import jax.numpy as jnp

    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.factory import create_model
    from humanliff_tpu.sampling.layered import generate_layer
    from humanliff_tpu.sampling.parallel import parallel_p_sample_loop
    from humanliff_tpu.utils.profiling import force_sync
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
        def apply(self, p, x, t, xc, y=None, **kw):
            kwargs = {} if y is None else {"y": y}
            out = model.apply(
                p, x.astype(jnp.bfloat16), t,
                None if xc is None else xc.astype(jnp.bfloat16),
                **kwargs, **kw,
            )
            return out.astype(jnp.float32)

        def __hash__(self):
            return id(self)

        def __eq__(self, other):
            return self is other

    wrap = Bf16Model()
    shape = (1, 256, 256, 27)
    key = jax.random.key(42)
    T = diffusion.num_timesteps

    # Sequential baseline (the production path).
    def seq_run():
        out = generate_layer(wrap, params, diffusion, 0, None, key, 1, 256, 27)
        force_sync(out)
        return out

    seq_run()  # compile
    t0 = time.perf_counter()
    seq_run()
    seq_s = time.perf_counter() - t0

    results = {"window": WINDOW, "sequential_s": round(seq_s, 2),
               "sequential_model_calls": T, "tols": {}}
    ref_sample = None
    for tol in TOLS:
        # warmup compile on the first tol only (same programs for all tols)
        if tol == TOLS[0]:
            parallel_p_sample_loop(
                diffusion, wrap, params, shape, key, window=WINDOW, tol=tol)
        t0 = time.perf_counter()
        sample, iters = parallel_p_sample_loop(
            diffusion, wrap, params, shape, key, window=WINDOW, tol=tol)
        sample = np.asarray(sample, np.float32)  # readback = sync
        wall = time.perf_counter() - t0
        if tol == 0.0:
            ref_sample = sample
            psnr = float("inf")
        else:
            mse = float(np.mean((sample - ref_sample) ** 2))
            psnr = -10.0 * np.log10(max(mse, 1e-12))
        slide = T / iters
        results["tols"][str(tol)] = {
            "wall_s": round(wall, 2),
            "iterations": int(iters),
            "slide": round(slide, 3),
            "psnr_vs_tol0_db": None if psnr == float("inf") else round(psnr, 2),
        }
        print(f"tol={tol}: {wall:.1f}s, {iters} iters, slide {slide:.2f}, "
              f"psnr {psnr:.1f}")

    os.makedirs("runs/probes", exist_ok=True)
    with open("runs/probes/picard_tol.json", "w") as f:
        json.dump(results, f, indent=2)

    print("\n| tol | wall (s) | model-call iters | slide k̄ | PSNR vs tol=0 (dB) |")
    print("|---|---|---|---|---|")
    for tol, r in results["tols"].items():
        p = "exact" if r["psnr_vs_tol0_db"] is None else f"{r['psnr_vs_tol0_db']:.1f}"
        print(f"| {tol} | {r['wall_s']} | {r['iterations']} | {r['slide']} | {p} |")
    print(f"| sequential | {results['sequential_s']} | {T} | 1.0 | exact |")


if __name__ == "__main__":
    main()

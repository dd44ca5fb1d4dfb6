"""Reproducible decode-workload benchmark: exact vs fast render tier on a
FITTED scene (VERDICT r2 item 9 — the fastpath claims become a committed,
regenerable artifact instead of ad-hoc session prose).

Reuses the quality campaign's trained checkpoint (scripts/quality_eval.sh) so
the scene statistics are realistic (converged fits terminate most empty rays);
falls back to a quick fit when absent. Reports per-view wall-clock for the
exact masked tier and the density-grid fast tier (grid build amortized), the
fast-vs-exact PSNR, and writes one JSON artifact.

Reference measurement this mirrors: all_test.py:153-156 "Time per image" and
the 40-view decode loop of triplane_sample_layered.py:155-176.

    bash scripts/bench_decode.sh            # uses runs/quality
    python -m humanliff_tpu.cli.bench_decode --ckpt_dir runs/quality/train
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("humanliff bench-decode")
    p.add_argument("--ckpt_dir", type=str, default="runs/quality/train")
    p.add_argument("--out_json", type=str, default="runs/quality/bench_decode.json")
    p.add_argument("--num_views", type=int, default=8)
    p.add_argument("--render_size", type=int, default=512)
    p.add_argument("--subject", type=int, default=0)
    p.add_argument("--layer", type=int, default=3)
    p.add_argument("--grid_resolution", type=int, default=128)
    p.add_argument("--early_term_eps", type=float, default=1e-2)
    p.add_argument("--bf16", type=lambda s: s.lower() == "true", default=True)
    p.add_argument("--num_instance", type=int, default=2)
    p.add_argument("--train_image_size", type=int, default=128,
                   help="image size the checkpoint was fitted at (campaign "
                        "default); render_size rescales the same cameras")
    return p


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from humanliff_tpu.data.synthetic import SyntheticLayeredDataset
    from humanliff_tpu.eval.metrics import mse
    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.nerf.fastpath import GridCache, render_image_fast
    from humanliff_tpu.nerf.renderer import RenderConfig, render_image_masked
    from humanliff_tpu.train import checkpoint as ckpt

    restored, step = ckpt.restore_state(args.ckpt_dir)
    if restored is None:
        raise FileNotFoundError(
            f"no checkpoint under {args.ckpt_dir} — run scripts/quality_eval.sh "
            "first (the bench measures a FITTED scene)"
        )
    params = ckpt.get_field(restored, "params")
    print(f"[bench-decode] checkpoint step {step}")

    decoder = NeRFDecoder(d_in=27)
    cast = jnp.bfloat16 if args.bf16 else jnp.float32
    dec_params = jax.tree.map(
        lambda p: p.astype(cast) if str(getattr(p, "dtype", "")) == "float32" else p,
        params["decoder"],
    )
    planes = jnp.asarray(params["planes"][args.subject, args.layer], cast)

    # Render the fitted subject at render_size through the SAME camera model
    # the fit used (K scales linearly with image size).
    ds = SyntheticLayeredDataset(
        num_instances=args.num_instance, image_size=args.render_size,
        tight_bounds=True,
    )
    views = [
        ds.test_item(args.subject, args.layer, 145 + v, n_gt_samples=2)
        for v in range(args.num_views)
    ]  # GT quadrature irrelevant here (n_gt_samples=2 keeps item gen cheap)

    cfg = RenderConfig(n_samples=128, n_importance=128, perturb=False,
                       density_noise=False)

    def run_exact(item):
        return render_image_masked(
            decoder, dec_params, planes, item["rays_o"], item["rays_d"],
            item["near"], item["far"], item["ray_mask"], item["box_warp"],
            cfg, chunk=16384, outputs=("rgb",),
        )["rgb"]

    # Warm both tiers' compiles out of the timings.
    _ = run_exact(views[0])
    grids = GridCache(decoder, dec_params, planes,
                      resolution=args.grid_resolution)
    t0 = time.time()
    box0 = np.asarray(views[0]["box_warp"], np.float32)
    grid = grids.get(box0)
    _ = render_image_fast(
        decoder, dec_params, planes, grid, views[0]["rays_o"],
        views[0]["rays_d"], views[0]["near"], views[0]["far"],
        views[0]["ray_mask"], box0, cfg, outputs=("rgb",),
        early_term_eps=args.early_term_eps,
    )
    warm_s = time.time() - t0

    exact_times, fast_times, psnrs = [], [], []
    for vi, item in enumerate(views):
        t0 = time.time()
        rgb_exact = run_exact(item)
        exact_times.append(time.time() - t0)

        t0 = time.time()
        rgb_fast = render_image_fast(
            decoder, dec_params, planes, grid, item["rays_o"], item["rays_d"],
            item["near"], item["far"], item["ray_mask"],
            box0, cfg, outputs=("rgb",),
            early_term_eps=args.early_term_eps,
        )["rgb"]
        fast_times.append(time.time() - t0)

        mask = np.asarray(item["ray_mask"]).astype(bool)
        m = mse(rgb_fast[mask], rgb_exact[mask])
        psnrs.append(-10.0 * float(np.log10(max(m, 1e-12))))
        print(f"[bench-decode] view {vi}: exact {exact_times[-1]:.2f}s, "
              f"fast {fast_times[-1]:.2f}s, fast-vs-exact {psnrs[-1]:.1f} dB")

    # Grid build cost, measured warm (one rebuild of the same program).
    t0 = time.time()
    from humanliff_tpu.nerf.fastpath import build_density_grid

    g2 = build_density_grid(decoder, dec_params, planes, box0,
                            resolution=args.grid_resolution)
    float(jnp.sum(g2.table.astype(jnp.float32)))  # readback sync (tunnel-safe)
    grid_build_s = time.time() - t0

    result = {
        "checkpoint_step": int(step),
        "render_size": args.render_size,
        "num_views": args.num_views,
        "exact_s_per_view": float(np.mean(exact_times)),
        "fast_s_per_view": float(np.mean(fast_times)),
        "speedup": float(np.mean(exact_times) / np.mean(fast_times)),
        # Medians exclude the first-view compile/executable-load warmup the
        # means absorb — the honest steady-state comparison.
        "exact_s_per_view_median": float(np.median(exact_times)),
        "fast_s_per_view_median": float(np.median(fast_times)),
        "speedup_median": float(
            np.median(exact_times) / max(np.median(fast_times), 1e-9)
        ),
        "fast_vs_exact_psnr_db": float(np.mean(psnrs)),
        "grid_build_s": grid_build_s,
        "fast_first_view_incl_grid_s": warm_s,
        "early_term_eps": args.early_term_eps,
        "dtype": "bf16" if args.bf16 else "fp32",
    }
    os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main(sys.argv[1:])

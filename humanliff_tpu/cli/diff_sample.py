"""Layered sampling CLI (reference: scripts/triplane_sample_layered.py + triplane_sample.py).

Generates layer k conditioned on layer k-1 (EMA weights), optionally decodes each
sample with the frozen Stage-1 NeRF decoder into novel-view renders, an mp4, and a
marching-cubes mesh. Layers chain either in-process (--all_layers) or across runs
via --sample_npz (the reference's file contract).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.models.factory import (
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)
from humanliff_tpu.sampling.layered import (
    LAYER_NAMES,
    generate_all_layers,
    generate_layer,
    planes_image_to_triplane,
)
from humanliff_tpu.train import checkpoint as ckpt


def build_parser():
    p = argparse.ArgumentParser("humanliff diff-sample")
    for k, v in model_and_diffusion_defaults().items():
        t = type(v)
        p.add_argument(f"--{k}", type=(lambda s: s.lower() == "true") if t is bool else t,
                       default=v)
    p.add_argument("--model_dir", type=str, required=True,
                   help="stage-2 checkpoint dir (EMA weights are used)")
    p.add_argument("--model_step", type=int, default=None)
    p.add_argument("--ema_rate", type=str, default="0.9999")
    p.add_argument("--out_dir", type=str, default="./samples")
    p.add_argument("--num_samples", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--layer_idx", type=int, default=0)
    p.add_argument("--all_layers", action="store_true")
    p.add_argument("--auto_plan", type=lambda s: s.lower() == "true",
                   default=False,
                   help="all_layers mode: ignore --batch_size and split "
                        "--num_samples by the measured-cost DP plan over the "
                        "clean B=1/B=8 operating points "
                        "(sampling/layered.plan_workload)")
    p.add_argument("--sample_npz", type=str, default=None,
                   help="previous layer's samples npz (x_cond)")
    p.add_argument("--use_ddim", type=lambda s: s.lower() == "true", default=False)
    p.add_argument("--parallel_window", type=int, default=0,
                   help="sliding-window Picard sampling width (0 = sequential "
                        "reference chain); pays off when sharded over a "
                        "multi-chip mesh (sampling/parallel.py)")
    p.add_argument("--parallel_tol", type=float, default=5e-3)
    p.add_argument("--decode", action="store_true",
                   help="render novel views + mesh with the Stage-1 decoder")
    p.add_argument("--stage1_ckpt", type=str, default=None)
    p.add_argument("--view_dataset", type=str, default="orbit",
                   choices=("orbit", "synbody", "tightcap"),
                   help="camera/bounds source for decoding: real capture data "
                        "(synbody/tightcap, reference *View_datasets semantics) "
                        "or the labeled procedural-orbit fallback")
    p.add_argument("--data_root", type=str, default=None,
                   help="capture root for --view_dataset synbody/tightcap")
    p.add_argument("--cameras_json", type=str, default=None,
                   help="orbit mode: use this cameras.json instead of the orbit")
    p.add_argument("--smpl_model_path", type=str, default="assets/SMPL_NEUTRAL.pkl")
    p.add_argument("--smplx_model_dir", type=str, default="assets",
                   help="directory holding SMPLX_{GENDER}.npz/.pkl for "
                        "--view_dataset synbody")
    p.add_argument("--image_scaling", type=float, default=1.0)
    p.add_argument("--num_views", type=int, default=40)
    p.add_argument("--render_size", type=int, default=512)
    p.add_argument("--mesh_resolution", type=int, default=512)
    p.add_argument("--render_bf16", type=lambda s: s.lower() == "true", default=True,
                   help="bf16 NeRF decode (2.6x faster; max rgb err ~1.5e-3)")
    p.add_argument("--fast_render", type=lambda s: s.lower() == "true", default=True,
                   help="grid-guided coarse pass + empty-ray termination "
                        "(nerf/fastpath.py); exact fine pass, ~3x faster decode")
    p.add_argument("--grid_resolution", type=int, default=128)
    p.add_argument("--early_term_eps", type=float, default=1e-2,
                   help="fast_render: terminate rays whose grid transmittance "
                        "estimate stays below this (smaller = more exact)")
    p.add_argument("--report_fidelity", action="store_true",
                   help="score the layered-chain contract: change-region "
                        "fraction + outside-region PSNR between each layer "
                        "and its conditioning (eval/fidelity.py); writes "
                        "fidelity.json")
    p.add_argument("--fidelity_threshold", type=float, default=0.1)
    p.add_argument("--dump_trajectory", type=int, default=0, metavar="N",
                   help="record pred_xstart every N denoise steps to "
                        "trajectory_{layer}.npz (reference "
                        "p_sample_loop_progressive parity; 0 = off)")
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_ema_params(args):
    restored, step = ckpt.restore_state(args.model_dir, step=args.model_step)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {args.model_dir}")
    ema, rate_used = ckpt.get_ema(restored, args.ema_rate)
    # EMA burn-in guard: the EMA initializes AT the random init, so rate^step
    # of it is still that init — at 0.9999 and 6k steps that is 55%, and
    # sampling it produces saturated noise (round-4 campaign post-mortem).
    init_w = float(rate_used) ** max(int(step or 0), 0)
    if init_w > 0.1:
        print(f"WARNING: EMA({rate_used}) at step {step} still carries "
              f"{init_w:.1%} of the random init — sampling RAW params instead "
              "(use a faster --ema_rate for short trainings)")
        return ckpt.get_field(restored, "params")
    print(f"loaded EMA({rate_used}) weights from step {step}")
    return ema


_DEFORM_CACHE = {}


def _cached_deform_fn(smpl_model_path: str):
    fn = _DEFORM_CACHE.get(smpl_model_path)
    if fn is None:
        from humanliff_tpu.bodymodel.canonical import make_eval_deform_fn
        from humanliff_tpu.bodymodel.smpl import load_body_model

        fn = make_eval_deform_fn(load_body_model(smpl_model_path))
        _DEFORM_CACHE[smpl_model_path] = fn
    return fn


def _decode_views(args, layer_idx: int):
    """Yield per-view render inputs (dicts) from the chosen camera/bounds source.

    Real data (``--view_dataset synbody/tightcap``) reproduces the reference's
    *View_datasets semantics — per-view full-image rays against the subject's
    per-pose SMPL world bounds, canonical deform args for TightCap
    (SynBodyView_datasets.py:215-308, TightCapView_datasets.py:34-37). The
    procedural orbit is an explicitly-labeled fallback for data-free decoding.
    """
    S = args.render_size
    if args.view_dataset == "orbit":
        from humanliff_tpu.data.view_datasets import NovelViewCameras

        if args.cameras_json is None:
            print("[decode] NOTE: procedural-orbit fallback cameras + default "
                  "bounds (no --data_root / --cameras_json given)")
        bounds = np.asarray([[-1.0, -1.2, -1.0], [1.0, 1.2, 1.0]], np.float32)
        cams = NovelViewCameras(image_size=S, cameras_json=args.cameras_json)
        for v in range(args.num_views):
            item = cams.rays(v, bounds)
            item["box_warp"] = bounds
            yield item
        return

    views = list(range(145, 145 + args.num_views))
    if args.view_dataset == "synbody":
        from humanliff_tpu.bodymodel.smpl import load_body_model
        from humanliff_tpu.data.view_datasets import SynBodyViewDataset

        from humanliff_tpu.bodymodel.smpl import find_smplx_model

        models = {
            g: load_body_model(find_smplx_model(args.smplx_model_dir, g))
            for g in ("male", "female", "neutral")
        }
        ds = SynBodyViewDataset(
            data_root=args.data_root, body_models=models,
            image_scaling=args.image_scaling, layer_idx=layer_idx,
            output_views=views,
        )
    else:
        from humanliff_tpu.bodymodel.smpl import load_body_model
        from humanliff_tpu.data.view_datasets import TightCapViewDataset

        ds = TightCapViewDataset(
            data_root=args.data_root, body_model=load_body_model(args.smpl_model_path),
            image_scaling=args.image_scaling, layer_idx=layer_idx,
            output_views=views,
        )
    for i in range(min(args.num_views, len(ds))):
        yield ds.item(i)


def _decode_samples(args, samples_nhwc: np.ndarray, layer_name: str):
    """Render generated planes to novel views + export video and mesh
    (triplane_sample_layered.py:155-207)."""
    import imageio.v2 as imageio

    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.nerf.geometry import extract_mesh
    from humanliff_tpu.nerf.renderer import RenderConfig, render_image_masked
    from humanliff_tpu.mesh import write_ply

    s1, _ = ckpt.restore_state(args.stage1_ckpt)
    if s1 is None:
        raise FileNotFoundError(f"no stage-1 checkpoint under {args.stage1_ckpt}")
    decoder_params = ckpt.get_field(s1, "params")["decoder"]
    decoder = NeRFDecoder(d_in=args.in_channels)
    cast_dtype = jnp.bfloat16 if getattr(args, "render_bf16", True) else jnp.float32
    decoder_params = jax.tree.map(
        lambda p: p.astype(cast_dtype)
        if getattr(p, "dtype", None) == np.float32 or str(getattr(p, "dtype", "")) == "float32"
        else p,
        decoder_params,
    )
    cfg = RenderConfig(n_samples=128, n_importance=128, perturb=False,
                       density_noise=False)

    layer_idx = LAYER_NAMES.index(layer_name)
    deform_fn = None
    if args.view_dataset == "tightcap":
        # Canonical-space decode: render through inverse-LBS with big-pose
        # bounds (TightCapView semantics; all_test.py:231-327). Cached across
        # layers — the fastpath/renderer jit caches key on id(deform_fn), so a
        # fresh closure per layer would recompile every render program.
        deform_fn = _cached_deform_fn(args.smpl_model_path)

    view_items = list(_decode_views(args, layer_idx))
    S = args.render_size
    # Mesh bounds: canonical big-pose bounds for TightCap, else the (shared)
    # world bounds of the first view item.
    bounds = np.asarray(view_items[0]["box_warp"], np.float32)

    for si, sample in enumerate(samples_nhwc):
        planes = planes_image_to_triplane(jnp.asarray(sample, cast_dtype))
        grids = None
        if args.fast_render:
            # One grid per (sample, layer), reused across all views (rebuilt if
            # a view carries different bounds) — the grid lives in the planes'
            # own (canonical) space.
            from humanliff_tpu.nerf.fastpath import GridCache, render_image_fast

            grids = GridCache(decoder, decoder_params, planes,
                              resolution=args.grid_resolution)
        # Cross-view batching: when every view shares the box and there is no
        # per-view deform (SynBody/orbit), all views' rays render through ONE
        # call — full tiles instead of per-view padding/dispatch. The canonical
        # (TightCap) path keeps the per-view loop: its deform_args differ per
        # view and tiles must not span views.
        shapes = [
            (int(it["hw"][0]), int(it["hw"][1])) if "hw" in it else (S, S)
            for it in view_items
        ]
        same_box = all(
            np.array_equal(np.asarray(it["box_warp"], np.float32),
                           np.asarray(view_items[0]["box_warp"], np.float32))
            for it in view_items
        )
        if len(jax.devices()) > 1 and same_box:
            # Multi-chip: tiles of masked rays shard across the data mesh
            # (nerf/sharded.py) — the jax form of the reference's cross-rank
            # inference split (triplane_sample_layered.py:211-219). Exact
            # renderer; numerically identical to the single-chip path.
            from humanliff_tpu.nerf.sharded import render_views_sharded
            from humanliff_tpu.parallel import make_mesh

            dargs_fn = None
            if deform_fn is not None:
                dargs_fn = lambda it: {
                    k: it[k]
                    for k in ("poses", "betas", "t_poses", "R", "Th", "smpl_verts")
                }
            outs = render_views_sharded(
                decoder, decoder_params, planes, view_items, cfg,
                make_mesh(), deform_fn=deform_fn, deform_args_fn=dargs_fn,
                outputs=("rgb",),
            )
            rgb_views = [o["rgb"] for o in outs]
        elif grids is not None and deform_fn is None and same_box:
            cat = {
                k: np.concatenate([np.asarray(it[k]) for it in view_items])
                for k in ("rays_o", "rays_d", "near", "far", "ray_mask")
            }
            box0 = np.asarray(view_items[0]["box_warp"], np.float32)
            out = render_image_fast(
                decoder, decoder_params, planes, grids.get(box0),
                cat["rays_o"], cat["rays_d"], cat["near"], cat["far"],
                cat["ray_mask"], box0, cfg, outputs=("rgb",),
                early_term_eps=args.early_term_eps,
            )
            rgb_views = np.split(
                out["rgb"], np.cumsum([h * w for h, w in shapes])[:-1]
            )
        else:
            rgb_views = []
            for item in view_items:
                dargs = None
                if deform_fn is not None:
                    dargs = {k: item[k] for k in
                             ("poses", "betas", "t_poses", "R", "Th", "smpl_verts")}
                if grids is not None:
                    item_box = np.asarray(item["box_warp"], np.float32)
                    out = render_image_fast(
                        decoder, decoder_params, planes, grids.get(item_box),
                        item["rays_o"], item["rays_d"], item["near"], item["far"],
                        item["ray_mask"], item_box,
                        cfg, deform_fn=deform_fn, deform_args=dargs,
                        outputs=("rgb",), early_term_eps=args.early_term_eps,
                    )
                else:
                    out = render_image_masked(
                        decoder, decoder_params, planes,
                        item["rays_o"], item["rays_d"], item["near"], item["far"],
                        item["ray_mask"], np.asarray(item["box_warp"], np.float32),
                        cfg, deform_fn=deform_fn, deform_args=dargs,
                        outputs=("rgb",),
                    )
                rgb_views.append(out["rgb"])

        frames = []
        for v, ((H, W), rgb) in enumerate(zip(shapes, rgb_views)):
            img = (np.clip(np.asarray(rgb).reshape(H, W, 3), 0, 1) * 255
                   ).astype(np.uint8)
            frames.append(img)
            imageio.imwrite(
                os.path.join(args.out_dir, f"{layer_name}_s{si}_v{v:03d}.png"), img
            )
        # mp4 when an ffmpeg backend exists (the reference contract,
        # triplane_sample_layered.py:180-199); first-party MJPEG-AVI fallback
        # otherwise (utils/video.py) — never silently PNG-only.
        from humanliff_tpu.utils.video import write_video

        write_video(
            os.path.join(args.out_dir, f"{layer_name}_s{si}.mp4"), frames,
            fps=20,
        )

        verts, tris = extract_mesh(
            decoder, decoder_params, planes, bounds,
            resolution=args.mesh_resolution,
        )
        write_ply(os.path.join(args.out_dir, f"{layer_name}_s{si}.ply"), verts, tris)
        print(f"decoded sample {si}: {args.num_views} views, mesh "
              f"{len(verts)} verts / {len(tris)} tris")


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    model, diffusion = create_model_and_diffusion(
        **{k: getattr(args, k) for k in model_and_diffusion_defaults()}
    )
    object.__setattr__(diffusion, "channel_axis", -1)
    params = _load_ema_params(args)

    key = jax.random.key(args.seed)
    S, C = args.image_size, args.in_channels

    parallel_mesh = None
    if args.parallel_window and len(jax.devices()) > 1:
        # Multi-chip: shard the Picard window across the data mesh (the
        # single-chip window cannot beat the sequential chain; CLAUDE.md).
        from humanliff_tpu.parallel import make_mesh

        parallel_mesh = make_mesh()

    if args.all_layers:
        if args.auto_plan and not args.parallel_window:
            # Mixed-batch DP plan over the clean operating points (B=1/B=8):
            # e.g. N=25 -> [8, 8, 8, 1], ~9% faster than naive B=1 and ~17%
            # faster than pure B=8 with its pad-to-32 waste (VERDICT r3).
            from humanliff_tpu.sampling.layered import plan_workload

            plan = plan_workload(args.num_samples)
            print(f"[plan] mixed-batch plan for {args.num_samples}: {plan}")
        else:
            import math

            plan = [args.batch_size] * math.ceil(
                args.num_samples / args.batch_size)
        all_samples = {name: [] for name in LAYER_NAMES}
        done = 0
        for B in plan:
            key, sub = jax.random.split(key)
            layers = generate_all_layers(
                model, params, diffusion, sub, batch_size=B,
                image_size=S, channels=C, use_ddim=args.use_ddim,
                parallel_window=args.parallel_window,
                parallel_tol=args.parallel_tol, parallel_mesh=parallel_mesh,
            )
            for name, x in layers.items():
                all_samples[name].append(np.asarray(x))
            done += B
            print(f"sampled {min(done, args.num_samples)}/{args.num_samples}")
        for k_name, chunks in all_samples.items():
            arr = np.concatenate(chunks)[: args.num_samples]
            path = os.path.join(args.out_dir, f"samples_{k_name}.npz")
            ckpt.save_samples_npz(path, arr)
            print("wrote", path)
            if args.decode:
                _decode_samples(args, arr, k_name)
        if args.report_fidelity:
            import json

            from humanliff_tpu.eval.fidelity import chain_fidelity_report

            stacked = {
                name: np.concatenate(chunks)[: args.num_samples]
                for name, chunks in all_samples.items()
            }
            report = chain_fidelity_report(stacked, args.fidelity_threshold)
            fpath = os.path.join(args.out_dir, "fidelity.json")
            with open(fpath, "w") as f:
                json.dump(report, f, indent=2)
            for pair, m in report.items():
                print(f"[fidelity] {pair}: {m}")
            print("wrote", fpath)
        return

    prev = None
    if args.sample_npz:
        prev = ckpt.load_samples_npz(args.sample_npz).astype(np.float32)
        if prev.shape[0] < args.num_samples:
            raise ValueError(
                f"--sample_npz has {prev.shape[0]} previous-layer samples but "
                f"--num_samples={args.num_samples}; the layered chain needs a "
                "1:1 correspondence (triplane_sample_layered.py:131-132)"
            )
    outs = []
    done = 0
    while done < args.num_samples:
        key, sub = jax.random.split(key)
        # Each batch conditions on its OWN slice of the previous layer's
        # samples, keeping the per-index chain correspondence across runs.
        xc = None
        if prev is not None:
            xc = prev[done : done + args.batch_size]
            if xc.shape[0] < args.batch_size:  # ragged tail: pad (trimmed below)
                pad = args.batch_size - xc.shape[0]
                xc = np.concatenate([xc, np.repeat(xc[-1:], pad, axis=0)])
        if args.dump_trajectory:
            from humanliff_tpu.sampling.layered import generate_layer_progressive

            samples, traj = generate_layer_progressive(
                model, params, diffusion, args.layer_idx,
                None if xc is None else jnp.asarray(xc), sub,
                args.batch_size, S, C, record_every=args.dump_trajectory,
                use_ddim=args.use_ddim,
            )
            tpath = os.path.join(
                args.out_dir,
                f"trajectory_{LAYER_NAMES[args.layer_idx]}_b{done}.npz",
            )
            np.savez_compressed(
                tpath,
                t=np.asarray([t for t, _ in traj], np.int32),
                pred_xstart=np.stack([p for _, p in traj]),
            )
            print("wrote", tpath)
        else:
            samples = generate_layer(
                model, params, diffusion, args.layer_idx, xc, sub,
                args.batch_size, S, C, use_ddim=args.use_ddim,
                parallel_window=args.parallel_window, parallel_tol=args.parallel_tol,
                parallel_mesh=parallel_mesh,
            )
        outs.append(np.asarray(samples))
        done += args.batch_size
        print(f"sampled {done}/{args.num_samples}")
    arr = np.concatenate(outs)[: args.num_samples]
    name = LAYER_NAMES[args.layer_idx]
    path = os.path.join(args.out_dir, f"samples_{name}.npz")
    ckpt.save_samples_npz(path, arr)
    print("wrote", path)
    if args.report_fidelity and prev is not None:
        import json

        from humanliff_tpu.eval.fidelity import plane_fidelity

        rows = [
            plane_fidelity(arr[i], prev[i], args.fidelity_threshold)
            for i in range(arr.shape[0])
        ]
        report = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        fpath = os.path.join(args.out_dir, f"fidelity_{name}.json")
        with open(fpath, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[fidelity] prev->{name}: {report}")
        print("wrote", fpath)
    if args.decode:
        _decode_samples(args, arr, name)


if __name__ == "__main__":
    main(sys.argv[1:])

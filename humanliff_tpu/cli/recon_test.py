"""Stage-1 evaluation CLI (reference: recon_NeRF/lib/all_test.py via run_nerf_batch --test).

Loads the shared decoder + per-subject fine-tuned planes, renders the held-out
views, and writes metrics.json/metrics.npy + pred/gt PNGs.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from humanliff_tpu.eval.harness import default_test_views, evaluate_views
from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig
from humanliff_tpu.train import checkpoint as ckpt
from humanliff_tpu.utils import config as cfglib


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    parser = cfglib.stage1_parser()
    parser.add_argument("--triplane_dir", type=str, default="./triplanes")
    parser.add_argument("--savedir", type=str, default=None)
    parser.add_argument("--fast_eval", type=lambda s: s.lower() == "true",
                        default=False,
                        help="density-grid fast render tier for eval views "
                             "(nerf/fastpath.py); default keeps the exact "
                             "reference hierarchy")
    args = cfglib.parse_with_config(parser, argv)
    args.train_split = "test"

    expdir = os.path.join(args.basedir, args.expname)
    restored, step = ckpt.restore_state(expdir)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {expdir}")
    decoder = NeRFDecoder(d_in=args.triplane_ch)
    decoder_params = ckpt.get_field(restored, "params")["decoder"]
    savedir = args.savedir or os.path.join(expdir, f"testset_{step:06d}")

    from humanliff_tpu.cli.recon_train import build_dataset

    dataset, body_model = build_dataset(args)
    dataset.split = "test"

    cfg = RenderConfig(
        n_samples=args.n_samples, n_importance=args.n_importance,
        perturb=False, density_noise=False, white_bkgd=args.white_bkgd,
    )

    # TightCap canonical-space eval (all_test.py:231-327): render through the
    # inverse-LBS deform with the big-pose bounds as box_warp (the dataset items
    # already carry box_warp = t_world_bounds and the per-view SMPL tensors).
    deform_fn = None
    deform_args_fn = None
    if getattr(args, "use_canonical_space", False):
        from humanliff_tpu.bodymodel.canonical import make_eval_deform_fn

        if body_model is None:
            raise ValueError(
                "--use_canonical_space needs a body model (TightCap dataset)"
            )
        deform_fn = make_eval_deform_fn(body_model)
        deform_args_fn = lambda item: {
            k: item[k] for k in ("poses", "betas", "t_poses", "R", "Th", "smpl_verts")
        }

    all_metrics = {}
    for subj in range(args.start_idx, min(args.end_idx, args.num_instance)):
        plane_path = os.path.join(args.triplane_dir, f"subject{subj:04d}_002000.npz")
        planes_all = ckpt.load_subject_planes(plane_path)  # (L, 3, C3, D, D)
        layers = (
            [args.test_layer_id] if args.test_layer_id is not None else range(4)
        )
        for layer in layers:
            views = default_test_views(layer, args.test_layer_id)
            per_layer = dataset.poses_num * dataset.views_num
            items = [
                dataset.item(subj * 4 * per_layer + layer * per_layer + v)
                for v in views
                if v < dataset.views_num
            ]
            agg = evaluate_views(
                decoder, decoder_params, planes_all[layer], items, cfg,
                savedir=savedir, tag=f"s{subj:04d}_l{layer}",
                deform_fn=deform_fn, deform_args_fn=deform_args_fn,
                fast=bool(getattr(args, "fast_eval", False)),
            )
            all_metrics[f"subject{subj}_layer{layer}"] = agg
            print(f"subject {subj} layer {layer}: {agg}")

    import json

    with open(os.path.join(savedir, "metrics.json"), "w") as f:
        json.dump(all_metrics, f, indent=2)
    np.save(os.path.join(savedir, "metrics.npy"), all_metrics)


if __name__ == "__main__":
    main(sys.argv[1:])

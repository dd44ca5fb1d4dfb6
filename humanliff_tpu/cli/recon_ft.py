"""Per-subject fine-tune CLI (reference: recon_NeRF/run_nerf_batch_ft.py).

Loads the shared-decoder checkpoint, freezes the decoder, and fits a fresh
tri-plane per (subject in [start_idx, end_idx)) x (4 layers), saving per-subject
plane artifacts for the diffusion stage.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.train import checkpoint as ckpt
from humanliff_tpu.train.stage1 import Stage1Config
from humanliff_tpu.train.stage1_ft import FinetuneConfig, finetune_subject
from humanliff_tpu.nerf.renderer import RenderConfig
from humanliff_tpu.utils import config as cfglib


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    parser = cfglib.stage1_parser()
    parser.add_argument("--ft_steps", type=int, default=2000)
    parser.add_argument("--out_dir", type=str, default="./triplanes")
    parser.add_argument("--subjects_per_batch", type=int, default=1,
                        help=">1 fits that many subjects CONCURRENTLY per "
                             "jitted step (frozen decoder makes them "
                             "independent; train/stage1_ft.py). On a "
                             "multi-chip mesh the plane table shards by "
                             "instance — the reference's subject-per-GPU "
                             "split (run_nerf_batch_ft.py:348-360) in one "
                             "program.")
    args = cfglib.parse_with_config(parser, argv)

    expdir = os.path.join(args.basedir, args.expname)
    from humanliff_tpu.cli.recon_train import build_dataset

    cfg = Stage1Config(
        num_instances=args.num_instance,
        triplane_dim=args.triplane_dim,
        triplane_ch=args.triplane_ch,
        render=RenderConfig(
            n_samples=args.n_samples, n_importance=args.n_importance,
            perturb=args.perturb > 0, white_bkgd=args.white_bkgd,
        ),
        tv_loss_coef=args.tv_loss_coef if args.tv_loss else 0.0,
        l1_loss_coef=args.l1_loss_coef,
        use_clamp=args.use_clamp,
        use_canonical_space=args.use_canonical_space,
    )
    decoder = NeRFDecoder(d_in=args.triplane_ch)

    restored, step = ckpt.restore_state(expdir)
    if restored is None:
        raise FileNotFoundError(f"no shared checkpoint under {expdir}")
    shared_params = ckpt.get_field(restored, "params")
    print(f"loaded shared checkpoint at step {step}")

    key = jax.random.key(args.seed)
    dataset, body_model = build_dataset(args)

    def make_subject_batches(subj, ds=dataset):
        def subject_batches(layer: int, k: jax.Array):
            # Assemble a batch of batch_size items for this (subject, layer).
            rng = np.random.default_rng(int(jax.random.randint(k, (), 0, 2**31 - 1)))
            per_layer = getattr(ds, "poses_num", 1) * getattr(ds, "views_num", 64)
            items = []
            for _ in range(args.batch_size):
                view = int(rng.integers(0, per_layer))
                idx = subj * 4 * per_layer + layer * per_layer + view
                it = dict(ds.item(idx, rng))
                it["instance_idx"] = np.int32(0)  # single-instance table
                items.append(it)
            return {
                kk: np.stack([it[kk] for it in items]) for kk in items[0]
            }

        return subject_batches

    subjects = list(range(args.start_idx, min(args.end_idx, args.num_instance)))
    group = max(1, args.subjects_per_batch)
    if group == 1:
        for subj in subjects:
            key, sub = jax.random.split(key)
            finetune_subject(
                decoder, shared_params, make_subject_batches(subj), cfg,
                FinetuneConfig(steps_per_layer=args.ft_steps,
                               sync_every=args.dispatch_sync_every),
                args.out_dir, f"subject{subj:04d}", sub, body_model,
            )
            print(f"finished subject {subj}")
    else:
        from humanliff_tpu.train.stage1_ft import finetune_subjects_batched

        mesh = None
        if len(jax.devices()) > 1:
            from humanliff_tpu.parallel import make_mesh

            mesh = make_mesh()
        for g0 in range(0, len(subjects), group):
            chunk_subjects = subjects[g0 : g0 + group]
            fns = [make_subject_batches(s) for s in chunk_subjects]
            key, sub = jax.random.split(key)
            finetune_subjects_batched(
                decoder, shared_params,
                lambda pos, layer, k: fns[pos](layer, k),
                cfg, FinetuneConfig(steps_per_layer=args.ft_steps,
                                    sync_every=args.dispatch_sync_every),
                args.out_dir,
                [f"subject{s:04d}" for s in chunk_subjects],
                sub, body_model, mesh=mesh,
            )
            print(f"finished subjects {chunk_subjects}")


if __name__ == "__main__":
    main(sys.argv[1:])

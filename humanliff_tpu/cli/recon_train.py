"""Stage-1 shared-decoder training CLI (reference: recon_NeRF/run_nerf_batch.py).

Usage:
  python -m humanliff_tpu.cli.recon_train --config configs/SynBody.txt ...
  python -m humanliff_tpu.cli.recon_train --data_set_type synthetic --n_iteration 200

Distributed: no torch.distributed.launch — one process per host with
``jax.distributed.initialize()`` (multihost) and a data mesh; single host uses all
local devices automatically.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig
from humanliff_tpu.parallel import make_mesh, shard_batch
from humanliff_tpu.parallel.mesh import shard_stage1_params
from humanliff_tpu.train import checkpoint as ckpt
from humanliff_tpu.train.optim import make_stage1_optimizer
from humanliff_tpu.train.stage1 import (
    Stage1Config,
    TrainState,
    init_params,
    train_step,
)
from humanliff_tpu.utils import config as cfglib
from humanliff_tpu.utils import logger as loglib


def build_dataset(args):
    if args.data_set_type == "synthetic":
        from humanliff_tpu.data.synthetic import SyntheticLayeredDataset

        ds = SyntheticLayeredDataset(
            num_instances=args.num_instance,
            n_rays=args.n_rand,
            image_size=getattr(args, "synthetic_image_size", 64),
            tight_bounds=bool(getattr(args, "synthetic_tight_bounds", False)),
        )
        return ds, None
    if args.data_set_type == "SynBody":
        from humanliff_tpu.bodymodel.smpl import find_smplx_model, load_body_model
        from humanliff_tpu.data.synbody import SynBodyDataset

        models = {
            g: load_body_model(find_smplx_model(args.smplx_model_dir, g))
            for g in ("male", "female", "neutral")
        }
        ds = SynBodyDataset(
            data_root=args.data_root,
            body_models=models,
            num_instances=args.num_instance,
            pose_start=args.start,
            pose_interval=args.interval,
            poses_num=args.poses_num,
            views_num=args.views_num,
            n_rays=args.n_rand,
            image_scaling=args.image_scaling,
            layer_idx=args.layer_idx,
        )
        return ds, None
    if args.data_set_type == "TightCap":
        from humanliff_tpu.bodymodel.smpl import load_body_model
        from humanliff_tpu.data.tightcap import TightCapDataset

        body = load_body_model(args.smpl_model_path)
        ds = TightCapDataset(
            data_root=args.data_root,
            body_model=body,
            num_instances=args.num_instance,
            pose_start=args.start,
            pose_interval=args.interval,
            poses_num=args.poses_num,
            views_num=args.views_num,
            n_rays=args.n_rand,
            image_scaling=args.image_scaling,
            layer_idx=args.layer_idx,
        )
        return ds, body
    raise ValueError(args.data_set_type)


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    args = cfglib.parse_with_config(cfglib.stage1_parser(), argv)
    cfglib.print_args(args)

    expdir = os.path.join(args.basedir, args.expname)
    os.makedirs(expdir, exist_ok=True)
    with open(os.path.join(expdir, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    log = loglib.configure(expdir, ["stdout", "csv", "json"])

    dataset, body_model = build_dataset(args)

    cfg = Stage1Config(
        num_instances=args.num_instance,
        num_layers=4,
        triplane_dim=args.triplane_dim,
        triplane_ch=args.triplane_ch,
        render=RenderConfig(
            n_samples=args.n_samples,
            n_importance=args.n_importance,
            perturb=args.perturb > 0,
            white_bkgd=args.white_bkgd,
        ),
        tv_loss_coef=args.tv_loss_coef if args.tv_loss else 0.0,
        l1_loss_coef=args.l1_loss_coef,
        use_clamp=args.use_clamp,
        use_canonical_space=args.use_canonical_space,
        use_bf16=args.use_bf16,
    )

    decoder = NeRFDecoder(d_in=args.triplane_ch)
    tx = make_stage1_optimizer(args.lrate, args.tri_plane_lrate, args.lrate_decay)
    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    params = init_params(k_init, cfg, decoder)

    mesh = make_mesh()
    params = shard_stage1_params(params, mesh)
    state = TrainState(
        step=np.int32(0), params=params, opt_state=tx.init(params), tx=tx
    )

    restored, start = ckpt.restore_state(expdir, target=state)
    if restored is not None and not args.no_reload:
        state = state.replace(
            step=restored.step, params=restored.params, opt_state=restored.opt_state
        )
        print(f"resumed from step {start}")

    from humanliff_tpu.data.loader import BatchLoader

    loader = BatchLoader(
        num_items=len(dataset),
        item_fn=dataset.item,
        batch_size=args.batch_size,
        seed=args.seed,
        num_workers=4,
    )
    it = iter(loader)

    # Metrics stay ON DEVICE between prints: one stacked readback per i_print
    # window replaces 5 float() round-trips per step. The per-step scalar sync
    # below is SERIAL on purpose: the tunneled remote executor wedges whenever
    # a second program is dispatched while one is in flight (lagged/overlapped
    # sync, 10-deep windows, and device_prefetch all reproduced the wedge;
    # strictly-serial dispatch is the only pattern that has never wedged).
    aux_keys = ("loss", "img_loss", "acc_loss", "tv", "psnr")
    aux_buf = []

    t0 = time.time()
    step = int(state.step)
    while step < args.n_iteration:
        batch = shard_batch(next(it), mesh)
        key, sub = jax.random.split(key)
        state, aux = train_step(state, batch, sub, decoder, cfg, body_model)
        step += 1
        aux_buf.append(aux)

        if step % args.dispatch_sync_every == 0:
            float(aux["loss"])
        if step % args.i_print == 0:
            import jax.numpy as jnp

            stacked = jax.device_get(
                {k: jnp.stack([a[k] for a in aux_buf]) for k in aux_keys}
            )
            aux_buf.clear()
            for k in aux_keys:
                log.logkv(k, float(np.mean(stacked[k])))
            log.logkv("time_per_iter", (time.time() - t0) / args.i_print)
            t0 = time.time()
            log.dumpkvs(step)
        if step % args.i_weights == 0 or step == 5000:
            path = ckpt.save_state(expdir, step, state)
            # Compact decoder sidecar: with the per-subject plane exports it
            # reassembles a full checkpoint (recon_refit --refit_steps 0) if
            # the ~200 MB orbax dirs are ever pruned.
            ckpt.save_decoder_npz(
                os.path.join(expdir, f"decoder_{step:06d}.npz"),
                jax.device_get(state.params["decoder"]), step)
            print(f"saved checkpoint {path}")
    loader.close()
    ckpt.save_state(expdir, step, state)
    ckpt.save_decoder_npz(
        os.path.join(expdir, f"decoder_{step:06d}.npz"),
        jax.device_get(state.params["decoder"]), step)


if __name__ == "__main__":
    main(sys.argv[1:])

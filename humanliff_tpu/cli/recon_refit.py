"""Decoder recovery: rebuild a full stage-1 checkpoint from per-subject plane
exports by refitting the (small) shared decoder against the FROZEN planes.

Why this exists: the stage-1 -> stage-2 file contract (mirroring the
reference's) stores per-subject artifacts with ONLY ``tri_planes``
(run_nerf_batch_ft.py:323-333) — the shared decoder lives solely in the big
shared checkpoint (run_nerf_batch.py:321-330). If that checkpoint is lost or
pruned, every downstream consumer (sampling decode, triplane_sample_layered.py
:65-81; evaluation, all_test.py:97-98) is stranded even though the expensive
artifacts (the fitted planes) survive. The decoder is a 2-layer MLP; refitting
it against frozen planes on the training distribution re-converges in O(1k)
steps, recovering a consistent (planes, decoder) pair at ~1% of the original
campaign cost.

Mechanics:
- Planes load from the export npzs (instance order = file order) and are
  FROZEN by giving the plane group a 0 learning rate in the standard two-group
  optimizer: Adam updates are exactly 0 so the planes stay bit-identical, and
  the optimizer tree stays compatible with recon_train checkpoints (the saved
  state is resumable by recon_train).
- The decoder warm-starts from the latest surviving checkpoint under the
  target dir when one exists (an earlier step of the same run is a far better
  init than random).
- The checkpoint is stamped ``--save_step`` (default: the plane exports'
  embedded step) because the step number denotes PLANE provenance — that is
  what every downstream consumer keys on (quality_stage2 staleness checks,
  export filenames). A ``{step:06d}_REFIT.txt`` sidecar records the recovery.
"""

from __future__ import annotations

import glob
import os
import re
import sys
import time

import jax
import numpy as np


def _expand_plane_files(spec: str):
    parts = []
    for token in spec.split(","):
        token = token.strip()
        if not token:
            continue
        hits = sorted(glob.glob(token))
        parts.extend(hits if hits else [token])
    return parts


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.nerf.renderer import RenderConfig
    from humanliff_tpu.parallel import make_mesh, shard_batch
    from humanliff_tpu.parallel.mesh import shard_stage1_params
    from humanliff_tpu.train import checkpoint as ckpt
    from humanliff_tpu.train.optim import make_stage1_optimizer
    from humanliff_tpu.train.stage1 import Stage1Config, TrainState, init_params, train_step
    from humanliff_tpu.utils import config as cfglib
    from humanliff_tpu.utils import logger as loglib

    parser = cfglib.stage1_parser()
    parser.add_argument("--plane_files", type=str, required=True,
                        help="comma-separated npz paths or globs; file order "
                             "defines the instance index")
    parser.add_argument("--refit_steps", type=int, default=2500)
    parser.add_argument("--refit_lr", type=float, default=1e-3,
                        help="decoder lr for the refit (the standard staged "
                             "decay applies on top, from step 0)")
    parser.add_argument("--save_step", type=int, default=None,
                        help="step to stamp the recovered checkpoint with "
                             "(default: the exports' embedded step — plane "
                             "provenance)")
    parser.add_argument("--decoder_from", type=str, default=None,
                        help="checkpoint dir OR decoder_*.npz sidecar to "
                             "warm-start the decoder from (default: the "
                             "target dir's latest checkpoint); with "
                             "--refit_steps 0 this is pure reassembly — no "
                             "training, the pair (plane exports, decoder "
                             "npz) becomes a full checkpoint")
    args = cfglib.parse_with_config(parser, argv)

    plane_files = _expand_plane_files(args.plane_files)
    if not plane_files:
        raise FileNotFoundError(f"no plane files match {args.plane_files!r}")
    planes = np.stack([ckpt.load_subject_planes(p) for p in plane_files])
    n_inst = planes.shape[0]
    export_steps = [
        int(m.group(1)) for p in plane_files
        if (m := re.search(r"_(\d{6})\.npz$", os.path.basename(p)))
    ]
    save_step = args.save_step
    if save_step is None:
        if not export_steps:
            raise ValueError("--save_step required: plane filenames carry no "
                             "_{step:06d}.npz suffix to infer it from")
        save_step = max(export_steps)
    print(f"[refit] {n_inst} subjects from exports (steps {export_steps}), "
          f"checkpoint will be stamped step {save_step}")

    if args.num_instance != n_inst:
        # The synthetic dataset's per-instance geometry depends on
        # num_instance (one RNG stream); the caller must match the world the
        # planes were fitted in.
        raise ValueError(
            f"--num_instance {args.num_instance} != {n_inst} plane files — "
            "instance geometry must match the planes' original fit")

    expdir = os.path.join(args.basedir, args.expname)
    os.makedirs(expdir, exist_ok=True)
    log = loglib.configure(expdir, ["stdout", "csv", "json"])

    from humanliff_tpu.cli.recon_train import build_dataset

    dataset, body_model = build_dataset(args)

    cfg = Stage1Config(
        num_instances=n_inst,
        num_layers=int(planes.shape[1]),
        triplane_dim=args.triplane_dim,
        triplane_ch=args.triplane_ch,
        render=RenderConfig(
            n_samples=args.n_samples,
            n_importance=args.n_importance,
            perturb=args.perturb > 0,
            white_bkgd=args.white_bkgd,
        ),
        tv_loss_coef=0.0,  # plane regularizers are moot on frozen planes
        l1_loss_coef=0.0,
        use_clamp=False,  # keep frozen planes bit-identical to the exports
        use_canonical_space=args.use_canonical_space,
        use_bf16=args.use_bf16,
    )
    decoder = NeRFDecoder(d_in=args.triplane_ch)
    tx = make_stage1_optimizer(args.refit_lr, 0.0, args.lrate_decay)

    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    params = init_params(k_init, cfg, decoder)
    params["planes"] = planes.astype(np.float32)

    warm_dir = args.decoder_from or expdir
    if warm_dir.endswith(".npz"):
        params["decoder"] = ckpt.load_decoder_npz(warm_dir)
        warm_step = "sidecar"
        print(f"[refit] decoder loaded from sidecar {warm_dir}")
    else:
        warm, warm_step = ckpt.restore_state(warm_dir)
        if warm is not None:
            params["decoder"] = jax.tree.map(
                np.asarray, ckpt.get_field(warm, "params")["decoder"])
            print(f"[refit] decoder warm-started from {warm_dir} "
                  f"step {warm_step}")
        elif args.refit_steps <= 0:
            raise FileNotFoundError(
                f"--refit_steps 0 is pure reassembly but {warm_dir} has no "
                "checkpoint/sidecar to take the decoder from")
        else:
            print("[refit] no checkpoint to warm-start from — random "
                  "decoder init")

    # Mesh sized so the instance-sharded plane table (and the batch) divide
    # evenly — a refit's instance count is small and arbitrary.
    import math

    n_mesh = max(1, math.gcd(math.gcd(len(jax.devices()), n_inst),
                             args.batch_size))
    mesh = make_mesh(n_devices=n_mesh)
    params = shard_stage1_params(params, mesh)
    state = TrainState(
        step=np.int32(0), params=params, opt_state=tx.init(params), tx=tx
    )

    from humanliff_tpu.data.loader import BatchLoader

    loader = BatchLoader(
        num_items=len(dataset),
        item_fn=dataset.item,
        batch_size=args.batch_size,
        seed=args.seed,
        num_workers=4,
    )
    it = iter(loader)

    # Same serial-dispatch + windowed-metrics pattern as recon_train (the
    # tunneled remote executor wedges on any dispatch-ahead; CLAUDE.md).
    aux_keys = ("loss", "img_loss", "acc_loss", "psnr")
    aux_buf = []
    t0 = time.time()
    for step in range(1, args.refit_steps + 1):
        batch = shard_batch(next(it), mesh)
        key, sub = jax.random.split(key)
        state, aux = train_step(state, batch, sub, decoder, cfg, body_model)
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
    loader.close()

    state = state.replace(step=np.int32(save_step))
    path = ckpt.save_state(expdir, save_step, state)
    ckpt.save_decoder_npz(
        os.path.join(expdir, f"decoder_{save_step:06d}.npz"),
        jax.device_get(state.params["decoder"]), save_step)
    with open(os.path.join(expdir, f"{save_step:06d}_REFIT.txt"), "w") as f:
        f.write(
            "Recovered checkpoint: planes are the UNMODIFIED exports below "
            f"(frozen, plane lr 0); the decoder was refit against them for "
            f"{args.refit_steps} steps at lr {args.refit_lr} "
            f"(warm-start: {warm_dir} step {warm_step})\n"
            + "\n".join(os.path.abspath(p) for p in plane_files) + "\n"
        )
    print(f"[refit] saved recovered checkpoint {path}")


if __name__ == "__main__":
    main(sys.argv[1:])

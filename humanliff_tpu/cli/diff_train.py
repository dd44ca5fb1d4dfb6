"""Stage-2 diffusion training CLI (reference: scripts/image_train.py).

Usage (flagship):
  python -m humanliff_tpu.cli.diff_train --data_dir packed_planes.npy \
      --batch_size 8 --microbatch 2 --lr 5e-5 --ema_rate 0.9999

``--data_dir synthetic`` trains on random planes for smoke testing. The
``DIFFUSION_TRAINING_TEST`` env var triggers an early exit after the first save,
matching the reference's smoke-test hook (train_util.py:181-185).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.models.factory import (
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)
from humanliff_tpu.parallel import make_mesh, replicate, shard_batch
from humanliff_tpu.train import checkpoint as ckpt
from humanliff_tpu.train.stage2 import Stage2Config, create_stage2_state, train_step
from humanliff_tpu.utils import logger as loglib


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("humanliff diff-train")
    for k, v in model_and_diffusion_defaults().items():
        t = type(v)
        p.add_argument(f"--{k}", type=(lambda s: s.lower() == "true") if t is bool else t,
                       default=v)
    p.add_argument("--data_dir", type=str, default="synthetic")
    p.add_argument("--data_name", type=str, default="triplane",
                   help="'imagenet' trains on a plain image folder "
                        "(reference image_train.py:54-60); default: packed "
                        "tri-planes (or 'synthetic' random planes)")
    p.add_argument("--logdir", type=str, default="./logs/diffusion")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--microbatch", type=int, default=0)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--lr_anneal_steps", type=int, default=0)
    p.add_argument("--ema_rate", type=str, default="0.9999")
    p.add_argument("--grad_clip_norm", type=float, default=1.0,
                   help="global-norm gradient clip on top of the reference's "
                        "element-value clip — the guard its fp16 loss-scaler "
                        "gave implicitly (one unclipped catastrophic batch "
                        "collapsed a flagship campaign; train/optim.py). "
                        "0 disables")
    p.add_argument("--schedule_sampler", type=str, default="uniform")
    p.add_argument("--use_amp", type=lambda s: s.lower() == "true", default=True)
    p.add_argument("--zero_shard", type=lambda s: s.lower() == "true", default=True,
                   help="ZeRO-1: partition Adam moments + EMA across the data "
                        "mesh (no-op on one device); see parallel/mesh.py")
    p.add_argument("--device_data", type=str, default="auto",
                   choices=("auto", "true", "false"),
                   help="keep the packed tri-plane dataset resident on device "
                        "and gather batches by index inside the jitted step "
                        "(auto: single device and dataset <= 1 GB). On the "
                        "tunneled chip the per-step batch upload otherwise "
                        "dominates the step time.")
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--save_interval", type=int, default=50000)
    p.add_argument("--light_final_save", type=lambda s: s.lower() == "true",
                   default=False,
                   help="final checkpoint holds only {step, params, "
                        "ema_params} (no Adam moments) — halves the "
                        "device->host readback on the tunneled chip (~8 GB "
                        "-> ~4 GB for the flagship). Sampling/scoring only "
                        "need EMA; resuming from a light save restarts the "
                        "optimizer state fresh (warned at resume)")
    p.add_argument("--skip_final_save", type=lambda s: s.lower() == "true",
                   default=False,
                   help="write NO final checkpoint; main() returns the final "
                        "TrainState so an in-process caller (e.g. "
                        "cli/quality_stage2 --final_save none) can sample and "
                        "score the in-memory weights directly — the flagship "
                        "state otherwise costs ~11-22 min of device->host "
                        "readback on the tunneled chip")
    p.add_argument("--mid_save", type=str, default="full",
                   choices=("full", "light"),
                   help="periodic-save payload: 'light' keeps only {step, "
                        "params, ema_params} (~half the flagship's ~22 min "
                        "tunnel readback per save). Resuming from a light "
                        "save restarts the optimizer fresh (warned) — the "
                        "trade long tunneled campaigns take so wedge recovery "
                        "(CLAUDE.md) is bounded without full-save stalls")
    p.add_argument("--total_steps", type=int, default=300000)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)
    os.makedirs(args.logdir, exist_ok=True)
    log = loglib.configure(args.logdir, ["stdout", "csv", "json"])

    model, diffusion = create_model_and_diffusion(
        **{k: getattr(args, k) for k in model_and_diffusion_defaults()}
    )
    object.__setattr__(diffusion, "channel_axis", -1)  # NHWC pipeline

    S, C = args.image_size, args.in_channels
    x0 = np.zeros((1, S, S, C), np.float32)
    params = jax.jit(model.init)(
        jax.random.key(args.seed), x0, np.zeros((1,), np.float32), x0,
        np.zeros((1,), np.int32),
    )
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"UNet params: {n_params / 1e6:.1f}M")

    cfg = Stage2Config(
        lr=args.lr,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        ema_rates=tuple(float(r) for r in args.ema_rate.split(",")),
        grad_clip_norm=args.grad_clip_norm,
        microbatch=args.microbatch,
        use_bf16=args.use_amp,
        schedule_sampler=args.schedule_sampler,
        class_cond=args.class_cond,
    )
    state = create_stage2_state(params, cfg, diffusion.num_timesteps)

    try:
        restored, start = ckpt.restore_state(args.logdir, target=state)
    except Exception:
        # A --light_final_save checkpoint (params+EMA only) does not match
        # the full-state target; resume what it has with a fresh optimizer.
        restored, start = ckpt.restore_state(args.logdir)
        if restored is not None:
            state = state.replace(
                step=jnp.asarray(restored["step"], jnp.int32),
                params=restored["params"],
                ema_params=restored["ema_params"],
            )
            print(f"resumed from LIGHT checkpoint at step {start} "
                  "(optimizer state restarted fresh)")
            restored = None
    if restored is not None:
        state = state.replace(
            step=restored.step, params=restored.params,
            opt_state=restored.opt_state, ema_params=restored.ema_params,
            sampler_state=restored.sampler_state,
        )
        print(f"resumed from step {start}")

    # The data axis must divide the batch (shard_batch places the leading
    # axis across it). When it doesn't, cap the mesh at the largest divisor
    # of batch_size instead of crashing — the single-host analog of the
    # reference's per-rank batches (train_util.py:200-246), where every rank
    # simply gets its own batch_size and world size never constrains it.
    n_dev = len(jax.devices())
    mesh_n = max(
        d for d in range(1, min(n_dev, args.batch_size) + 1)
        if args.batch_size % d == 0
    )
    if mesh_n != n_dev:
        print(f"mesh capped to {mesh_n}/{n_dev} devices: batch_size "
              f"{args.batch_size} does not divide across {n_dev} "
              "(raise --batch_size to a multiple of the device count to use "
              "every chip)")
    mesh = make_mesh(mesh_n)
    if args.zero_shard and mesh.devices.size > 1:
        from humanliff_tpu.parallel import (
            place_with_shardings,
            stage2_zero_shardings,
            zero_parallel_jit,
        )

        shardings = stage2_zero_shardings(state, mesh)
        state = place_with_shardings(state, shardings)
        step_fn = zero_parallel_jit(
            lambda s, b, k: train_step(s, b, k, model, diffusion, cfg),
            mesh, shardings, donate_argnums=0,
        )
    else:
        state = replicate(state, mesh)
        step_fn = lambda s, b, k: train_step(s, b, k, model, diffusion, cfg)

    planes_dev = None
    if args.data_name == "imagenet":
        if not os.path.isdir(args.data_dir):
            raise ValueError(
                f"--data_name imagenet needs --data_dir pointing at an image "
                f"folder (got {args.data_dir!r})"
            )
        # Plain image-folder training (reference image_train.py:54-60).
        from humanliff_tpu.data.image_folder import load_image_data

        images = load_image_data(
            args.data_dir, args.batch_size, S, class_cond=args.class_cond,
            seed=args.seed,
        )

        def next_image_batch():
            b = next(images)
            b.setdefault("y", np.zeros((args.batch_size,), np.int32))
            b["x_cond"] = np.zeros_like(b["x"])
            return b

        batches = iter(next_image_batch, None)
    elif args.data_dir == "synthetic":
        rng = np.random.default_rng(args.seed)

        def next_batch():
            x = rng.normal(scale=0.4, size=(args.batch_size, S, S, C)).astype(np.float32)
            y = rng.integers(0, 4, size=(args.batch_size,)).astype(np.int32)
            return {"x": x, "x_cond": np.zeros_like(x), "y": y}

        batches = iter(next_batch, None)
    else:
        from humanliff_tpu.data.loader import BatchLoader
        from humanliff_tpu.data.triplane_data import TriplaneDataset

        ds = TriplaneDataset(args.data_dir)
        n_mesh = mesh.devices.size
        n_items = ds.planes.shape[0] * ds.num_layers
        # Multi-device: the packed table shards BY EXAMPLE across the data
        # axis (the stage-1 instance-sharded-table design, parallel/mesh.py)
        # — per-chip HBM holds 1/n of the dataset and the jitted step's
        # planes[idx] gather rides ICI collectives, never the host link.
        # Requires the item count to divide the mesh; odd counts fall back
        # to the host loader (real pods stream from per-host loaders anyway).
        use_device_data = (
            args.device_data == "true"
            or (args.device_data == "auto" and ds.planes.nbytes <= 1 << 30)
        ) and n_items % n_mesh == 0
        if args.device_data == "true" and not use_device_data:
            print(f"--device_data disabled: {n_items} items do not divide "
                  f"across the {n_mesh}-device mesh")
        if use_device_data:
            # Upload the whole packed dataset ONCE; per step only (idx, y)
            # cross the host<->device link and train_step gathers
            # (x, x_cond) on device (see train/stage2.py). NCHW storage ->
            # NHWC flat (N*L, D, D, C) to match the UNet layout.
            from jax.sharding import NamedSharding, PartitionSpec as P

            L = ds.num_layers
            flat = np.asarray(ds.planes, np.float32)
            flat = flat.reshape(-1, *flat.shape[2:]).transpose(0, 2, 3, 1)
            planes_dev = jax.device_put(
                np.ascontiguousarray(flat), NamedSharding(mesh, P("data")))
            print(f"device-resident dataset: {flat.nbytes / 1e6:.0f} MB, "
                  f"{flat.shape[0]} items, example-sharded over "
                  f"{n_mesh} device(s)")

            def item_idx(index, rng=None):
                return {"idx": np.int32(index), "y": np.int32(index % L)}

            loader = BatchLoader(
                len(ds), item_idx, args.batch_size, seed=args.seed)
        else:
            loader = BatchLoader(
                len(ds), ds.item, args.batch_size, seed=args.seed)
        batches = iter(loader)

    key = jax.random.key(args.seed + 1)
    step = int(state.step)
    t0 = time.time()
    # Metrics stay on device between log intervals (a float() per step is a
    # synchronous tunnel round-trip); one stacked readback per interval.
    metric_keys = ["loss", "grad_norm"] + [f"loss_q{q}" for q in range(4)]
    m_buf = []
    while step < args.total_steps:
        batch = shard_batch(next(batches), mesh)
        if planes_dev is not None:
            # Already on device — attach after shard_batch so it is never
            # re-uploaded or batch-sharded.
            batch["planes"] = planes_dev
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub)
        step += 1
        m_buf.append(m)
        # Strictly-serial per-step sync: tunneled remote executors wedge when
        # a second program is dispatched while one is in flight (see
        # cli/recon_train.py); the windowed metric readback above still
        # removes the other 5 round-trips per step.
        float(m["loss"])
        if step % args.log_interval == 0:
            stacked = jax.device_get(
                {k: jnp.stack([mm[k] for mm in m_buf]) for k in metric_keys}
            )
            m_buf.clear()
            for k in metric_keys:
                log.logkv(k, float(np.mean(stacked[k])))
            log.logkv("steps_per_sec", args.log_interval / (time.time() - t0))
            t0 = time.time()
            log.dumpkvs(step)
        # The unconditional step-20000 save is reference parity
        # (train_util.py:181), not debug leftover.
        if step % args.save_interval == 0 or step == 20000:
            # A periodic save landing ON the final step defers to the
            # final-save policy below: with --skip_final_save it would
            # otherwise write the full ~8 GB state the flag exists to avoid
            # (and then claim nothing was written); with --light_final_save
            # it would shadow the light save with a full one.
            if step == args.total_steps and (
                    args.skip_final_save or args.light_final_save):
                pass
            elif args.mid_save == "light":
                print("saved (light: params+EMA only)",
                      ckpt.save_state(args.logdir, step,
                                      _light_state(step, state)))
            else:
                print("saved", ckpt.save_state(args.logdir, step, state))
            if os.environ.get("DIFFUSION_TRAINING_TEST"):
                print("DIFFUSION_TRAINING_TEST set: early exit after first save")
                return state
    if args.skip_final_save:
        print("skip_final_save: no final checkpoint written "
              "(final state returned in-memory)")
    elif args.light_final_save:
        print("saved (light: params+EMA only)",
              ckpt.save_state(args.logdir, step, _light_state(step, state)))
    else:
        ckpt.save_state(args.logdir, step, state)
    return state


def _light_state(step: int, state):
    """params+EMA-only checkpoint payload (no Adam moments — half the
    device->host readback; resume restarts the optimizer fresh)."""
    return {"step": np.asarray(step, np.int32), "params": state.params,
            "ema_params": state.ema_params}


if __name__ == "__main__":
    main(sys.argv[1:])

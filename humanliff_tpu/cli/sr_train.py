"""Super-resolution diffusion training CLI (reference: scripts/super_res_train.py).

Legacy improved-diffusion capability retained for parity: a UNet conditioned on a
bilinear-upsampled low-res image via channel concat (unet.py:651-671). Trains on
(high, low) pairs; ``--data_dir synthetic`` generates random pairs for smoke runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.diffusion.respace import create_diffusion
from humanliff_tpu.models.unet import SuperResModel, UNetModel
from humanliff_tpu.train import checkpoint as ckpt
from humanliff_tpu.train.stage2 import Stage2Config, create_stage2_state
from humanliff_tpu.utils import logger as loglib


def build_sr_model(args) -> SuperResModel:
    from humanliff_tpu.models.factory import channel_mult_for

    attention_ds = tuple(
        args.large_size // int(r) for r in args.attention_resolutions.split(",")
    )
    unet = UNetModel(
        in_channels=args.in_channels * 2,  # x concat upsampled low-res
        model_channels=args.num_channels,
        out_channels=args.in_channels if not args.learn_sigma else args.in_channels * 2,
        num_res_blocks=args.num_res_blocks,
        attention_resolutions=attention_ds,
        channel_mult=channel_mult_for(args.large_size),
        num_classes=4 if args.class_cond else None,
        num_heads=args.num_heads,
        use_scale_shift_norm=True,
        cond_type="",
    )
    return SuperResModel(unet=unet)


def build_parser():
    p = argparse.ArgumentParser("humanliff sr-train")
    p.add_argument("--large_size", type=int, default=256)
    p.add_argument("--small_size", type=int, default=64)
    p.add_argument("--in_channels", type=int, default=3)
    p.add_argument("--num_channels", type=int, default=128)
    p.add_argument("--num_res_blocks", type=int, default=2)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--attention_resolutions", type=str, default="16,8")
    p.add_argument("--learn_sigma", type=lambda s: s.lower() == "true", default=False)
    p.add_argument("--class_cond", type=lambda s: s.lower() == "true", default=False)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", type=str, default="linear")
    p.add_argument("--data_dir", type=str, default="synthetic")
    p.add_argument("--logdir", type=str, default="./logs/sr")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ema_rate", type=str, default="0.9999")
    p.add_argument("--total_steps", type=int, default=200000)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--save_interval", type=int, default=50000)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)
    os.makedirs(args.logdir, exist_ok=True)
    log = loglib.configure(args.logdir, ["stdout", "csv", "json"])

    model = build_sr_model(args)
    diffusion = create_diffusion(
        steps=args.diffusion_steps, noise_schedule=args.noise_schedule,
        learn_sigma=args.learn_sigma,
    )
    object.__setattr__(diffusion, "channel_axis", -1)

    S, s, C = args.large_size, args.small_size, args.in_channels
    x0 = jnp.zeros((1, S, S, C))
    low0 = jnp.zeros((1, s, s, C))
    params = jax.jit(model.init)(
        jax.random.key(args.seed), x0, jnp.zeros((1,)), low0
    )
    cfg = Stage2Config(lr=args.lr, ema_rates=tuple(float(r) for r in args.ema_rate.split(",")),
                       class_cond=False)
    state = create_stage2_state(params, cfg, diffusion.num_timesteps)

    import optax

    tx = state.tx
    rng = np.random.default_rng(args.seed)

    @jax.jit
    def step_fn(state, x, low, key):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (x.shape[0],), 0, diffusion.num_timesteps)

        def loss_fn(p):
            model_fn = lambda xx, ts, xc: model.apply(p, xx, ts, low)
            terms = diffusion.training_losses(model_fn, x, None, t, k_n)
            return terms["loss"].mean()

        loss, g = jax.value_and_grad(loss_fn)(state.params)
        updates, opt = tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = {
            r: jax.tree.map(lambda e, q: e * float(r) + q * (1 - float(r)), e_, new_params)
            for r, e_ in state.ema_params.items()
        }
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt, ema_params=ema), loss

    if args.data_dir != "synthetic" and not os.path.isdir(args.data_dir):
        raise ValueError(f"--data_dir {args.data_dir!r} is not a directory")
    if args.data_dir != "synthetic":
        # Real (high, low) pairs from an image folder: the reference's
        # load_superres_data (super_res_train.py:64 + image_datasets.py).
        from humanliff_tpu.data.image_folder import area_downsample, load_image_data

        batches = load_image_data(args.data_dir, args.batch_size, S, seed=args.seed)

        def next_pair():
            x = next(batches)["x"]
            return x, area_downsample(x, s)
    else:
        def next_pair():
            hi = rng.normal(scale=0.4, size=(args.batch_size, S, S, C)).astype(np.float32)
            return hi, hi[:, ::S // s, ::S // s]

    key = jax.random.key(args.seed + 1)
    t0 = time.time()
    for i in range(args.total_steps):
        hi, lo = next_pair()
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, jnp.asarray(hi), jnp.asarray(lo), sub)
        log.logkv_mean("loss", float(loss))
        if (i + 1) % args.log_interval == 0:
            log.logkv("steps_per_sec", args.log_interval / (time.time() - t0))
            t0 = time.time()
            log.dumpkvs(i + 1)
        if (i + 1) % args.save_interval == 0:
            ckpt.save_state(args.logdir, i + 1, state)
            if os.environ.get("DIFFUSION_TRAINING_TEST"):
                return


if __name__ == "__main__":
    main(sys.argv[1:])

"""Super-resolution sampling CLI (reference: scripts/super_res_sample.py).

Upsamples low-res inputs by sampling the SR diffusion model conditioned on them.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.cli.sr_train import build_parser, build_sr_model
from humanliff_tpu.diffusion.respace import create_diffusion
from humanliff_tpu.train import checkpoint as ckpt


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = build_parser()
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--low_res_npz", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--timestep_respacing", type=str, default="250")
    p.add_argument("--out_dir", type=str, default="./sr_samples")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    model = build_sr_model(args)
    diffusion = create_diffusion(
        steps=args.diffusion_steps, noise_schedule=args.noise_schedule,
        learn_sigma=args.learn_sigma, timestep_respacing=args.timestep_respacing,
    )
    object.__setattr__(diffusion, "channel_axis", -1)

    restored, step = ckpt.restore_state(args.model_dir)
    if restored is None:
        raise FileNotFoundError(args.model_dir)
    params = ckpt.get_field(restored, "ema_params")[args.ema_rate.split(",")[0]]
    print(f"loaded EMA weights from step {step}")

    S, s, C = args.large_size, args.small_size, args.in_channels
    if args.low_res_npz:
        low = ckpt.load_samples_npz(args.low_res_npz)[: args.num_samples]
    else:
        low = np.random.default_rng(0).normal(
            scale=0.4, size=(args.num_samples, s, s, C)
        ).astype(np.float32)

    import functools

    @functools.partial(jax.jit, static_argnames=("B",))
    def sr_sample_jit(params, lo, key, B):
        def model_fn(x, ts, xc, lo=lo):
            return model.apply(params, x, ts, lo)

        return diffusion.p_sample_loop(model_fn, (B, S, S, C), key)

    outs = []
    key = jax.random.key(args.seed)
    for i in range(0, len(low), args.batch_size):
        lo = jnp.asarray(low[i : i + args.batch_size])
        key, sub = jax.random.split(key)
        sample = sr_sample_jit(params, lo, sub, lo.shape[0])
        outs.append(np.asarray(sample))
        print(f"upsampled {i + lo.shape[0]}/{len(low)}")
    arr = np.concatenate(outs)
    path = os.path.join(args.out_dir, f"sr_samples_{S}.npz")
    ckpt.save_samples_npz(path, arr)
    print("wrote", path)


if __name__ == "__main__":
    main(sys.argv[1:])

"""Stock image sampling CLI (reference: scripts/image_sample.py).

Legacy improved-diffusion capability: sample (optionally class-conditional) images
from a trained model without the layer-conditioning chain.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.cli.diff_sample import _load_ema_params, build_parser
from humanliff_tpu.models.factory import (
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)
from humanliff_tpu.sampling.layered import _sample_layer_jit
from humanliff_tpu.train import checkpoint as ckpt


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

    S, C = args.image_size, args.in_channels
    key = jax.random.key(args.seed)
    outs, labels = [], []
    done = 0
    while done < args.num_samples:
        key, k_y, k_s = jax.random.split(key, 3)
        B = args.batch_size
        y = (
            jax.random.randint(k_y, (B,), 0, 4)
            if args.class_cond
            else jnp.zeros((B,), jnp.int32)
        )
        x_cond = jnp.zeros((B, S, S, C))
        # Jitted with y/x_cond as traced args: one compilation for all batches.
        sample = _sample_layer_jit(
            model, diffusion, params, x_cond, y, k_s, (B, S, S, C),
            args.use_ddim, True,
        )
        outs.append(np.asarray(sample))
        # Labels go in the npz only for class-conditional sampling (the jit
        # refactor made y always an array, so this must gate on the flag).
        if args.class_cond:
            labels.append(np.asarray(y))
        done += B
        print(f"created {done}/{args.num_samples} samples")

    arr = np.concatenate(outs)[: args.num_samples]
    path = os.path.join(args.out_dir, f"samples_{arr.shape[0]}x{S}x{S}x{C}.npz")
    if labels:
        np.savez(path, arr, np.concatenate(labels)[: args.num_samples])
    else:
        np.savez(path, arr)
    print("wrote", path)


if __name__ == "__main__":
    main(sys.argv[1:])

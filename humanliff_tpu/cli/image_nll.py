"""Bits-per-dim evaluation CLI (reference: scripts/image_nll.py).

Runs the full VLB over a dataset of tri-planes with the trained model — a numerical
probe of the diffusion math (gaussian_diffusion.py:792-847).
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from humanliff_tpu.cli.diff_sample import build_parser, _load_ema_params
from humanliff_tpu.models.factory import (
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = build_parser()
    p.add_argument("--data_npz", type=str, default=None,
                   help="npz of (N, H, W, C) images to evaluate; default random")
    p.add_argument("--data_dir", type=str, default=None,
                   help="image folder to evaluate (reference image_nll data_dir)")
    args = p.parse_args(argv)

    model, diffusion = create_model_and_diffusion(
        **{k: getattr(args, k) for k in model_and_diffusion_defaults()}
    )
    object.__setattr__(diffusion, "channel_axis", -1)
    params = _load_ema_params(args)

    S, C = args.image_size, args.in_channels
    if args.data_npz:
        with np.load(args.data_npz) as z:
            data = z[z.files[0]].astype(np.float32)
    elif args.data_dir:
        # Reference image_nll.py:38 evaluates a real image folder
        # (deterministic order) via image_datasets.load_data.
        from humanliff_tpu.data.image_folder import ImageFolderDataset

        ds = ImageFolderDataset(args.data_dir, S)
        n = min(len(ds), args.num_samples)
        data = np.stack([ds.item(i)[0] for i in range(n)])
    else:
        data = np.random.default_rng(0).normal(
            scale=0.3, size=(args.num_samples, S, S, C)
        ).astype(np.float32)

    def model_fn(x, ts, xc, y=None):
        B = x.shape[0]
        xc = np.zeros_like(x) if xc is None else xc
        yv = np.zeros((B,), np.int32) if y is None else y
        return model.apply(params, x, ts, xc, yv)

    key = jax.random.key(args.seed)
    bpds = []
    for i in range(0, len(data), args.batch_size):
        x = data[i : i + args.batch_size]
        key, sub = jax.random.split(key)
        out = diffusion.calc_bpd_loop(model_fn, x, sub)
        bpds.extend(np.asarray(out["total_bpd"]).tolist())
        print(f"batch {i // args.batch_size}: mean bpd so far {np.mean(bpds):.4f}")
    print(f"final bits/dim: {np.mean(bpds):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])

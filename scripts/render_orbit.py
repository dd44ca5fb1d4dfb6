"""Orbit video of generated tri-plane samples through the frozen stage-1 decoder.

The reference decodes each generated sample into 40 novel views and an mp4
(triplane_sample_layered.py:155-199). The in-process campaign
(cli/quality_stage2.py --final_save none) never writes a stage-2 checkpoint,
so cli/diff_sample's decode leg cannot run afterwards — this script renders
the committed samples npz directly: samples + decoder sidecar -> orbit video
per layer (mp4 when ffmpeg exists, first-party MJPEG AVI otherwise).

    python scripts/render_orbit.py \
        --samples 'runs/quality/stage2/samples/samples_*.npz' \
        --decoder runs/quality/train/decoder_060000.npz \
        --out_dir runs/quality/stage2/samples --views 20 --size 256
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("humanliff render-orbit")
    p.add_argument("--samples", type=str, required=True,
                   help="samples npz path or glob (one video per file)")
    p.add_argument("--decoder", type=str, required=True,
                   help="decoder sidecar npz (train/checkpoint.py "
                        "save_decoder_npz)")
    p.add_argument("--out_dir", type=str, default=None,
                   help="default: alongside each samples file")
    p.add_argument("--sample_idx", type=int, default=0)
    p.add_argument("--views", type=int, default=20)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--n_importance", type=int, default=128)
    p.add_argument("--fps", type=int, default=10)
    # The generated planes live in normalized plane space; any shared box gives
    # a consistent scene. Default: the union of the campaign subjects' tight
    # AABBs (matches cli/quality_stage2.py's decode box).
    p.add_argument("--num_instance", type=int, default=2)
    p.add_argument("--ft_subjects", type=int, default=3)
    p.add_argument("--bounds", type=float, nargs=6, default=None,
                   help="xmin ymin zmin xmax ymax zmax (overrides the "
                        "synthetic-union default)")
    return p


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from humanliff_tpu.data.view_datasets import NovelViewCameras
    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.nerf.renderer import RenderConfig, render_image_masked
    from humanliff_tpu.sampling.layered import planes_image_to_triplane
    from humanliff_tpu.train import checkpoint as ckpt
    from humanliff_tpu.utils.video import write_video

    if args.bounds is not None:
        box = np.asarray(args.bounds, np.float32).reshape(2, 3)
    else:
        from humanliff_tpu.data.synthetic import SyntheticLayeredDataset

        n = args.num_instance + args.ft_subjects
        ds = SyntheticLayeredDataset(num_instances=n, image_size=args.size,
                                     tight_bounds=True)
        boxes = np.stack([ds.instance_bounds(i) for i in range(n)])
        box = np.stack([boxes[:, 0].min(0), boxes[:, 1].max(0)])

    dec_params = ckpt.load_decoder_npz(args.decoder)

    paths = sorted(glob.glob(args.samples)) or [args.samples]
    sample0 = ckpt.load_samples_npz(paths[0])
    d_in = sample0.shape[-1]
    decoder = NeRFDecoder(d_in=d_in)
    cfg = RenderConfig(n_samples=args.n_samples,
                       n_importance=args.n_importance,
                       perturb=False, density_noise=False)
    cams = NovelViewCameras(image_size=args.size,
                            views=list(range(args.views)))

    S = args.size
    for path in paths:
        arr = ckpt.load_samples_npz(path)
        planes = planes_image_to_triplane(
            jnp.asarray(arr[args.sample_idx], jnp.float32))
        frames = []
        for v in range(args.views):
            r = cams.rays(v, box)
            out = render_image_masked(
                decoder, dec_params, planes, r["rays_o"], r["rays_d"],
                r["near"], r["far"], r["ray_mask"],
                jnp.asarray(box, jnp.float32), cfg, outputs=("rgb",),
            )
            rgb = np.asarray(out["rgb"], np.float32).reshape(S, S, 3)
            frames.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            print(f"{os.path.basename(path)}: view {v + 1}/{args.views}")
        out_dir = args.out_dir or os.path.dirname(path)
        name = os.path.splitext(os.path.basename(path))[0]
        dst = write_video(
            os.path.join(out_dir, f"orbit_{name}_s{args.sample_idx}.mp4"),
            frames, fps=args.fps)
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()

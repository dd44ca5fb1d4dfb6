"""Layered sampling CLI (reference: scripts/triplane_sample_layered.py + triplane_sample.py).

Generates layer k conditioned on layer k-1 (EMA weights), optionally decodes each
sample with the frozen Stage-1 NeRF decoder into novel-view renders, an mp4, and a
marching-cubes mesh. Layers chain either in-process (--all_layers) or across runs
via --sample_npz (the reference's file contract).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.models.factory import (
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)
from humanliff_tpu.sampling.layered import (
    LAYER_NAMES,
    generate_all_layers,
    generate_layer,
    planes_image_to_triplane,
)
from humanliff_tpu.train import checkpoint as ckpt


def build_parser():
    p = argparse.ArgumentParser("humanliff diff-sample")
    for k, v in model_and_diffusion_defaults().items():
        t = type(v)
        p.add_argument(f"--{k}", type=(lambda s: s.lower() == "true") if t is bool else t,
                       default=v)
    p.add_argument("--model_dir", type=str, required=True,
                   help="stage-2 checkpoint dir (EMA weights are used)")
    p.add_argument("--model_step", type=int, default=None)
    p.add_argument("--ema_rate", type=str, default="0.9999")
    p.add_argument("--out_dir", type=str, default="./samples")
    p.add_argument("--num_samples", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--layer_idx", type=int, default=0)
    p.add_argument("--all_layers", action="store_true")
    p.add_argument("--sample_npz", type=str, default=None,
                   help="previous layer's samples npz (x_cond)")
    p.add_argument("--use_ddim", type=lambda s: s.lower() == "true", default=False)
    p.add_argument("--decode", action="store_true",
                   help="render novel views + mesh with the Stage-1 decoder")
    p.add_argument("--stage1_ckpt", type=str, default=None)
    p.add_argument("--num_views", type=int, default=40)
    p.add_argument("--render_size", type=int, default=512)
    p.add_argument("--mesh_resolution", type=int, default=512)
    p.add_argument("--render_bf16", type=lambda s: s.lower() == "true", default=True,
                   help="bf16 NeRF decode (2.6x faster; max rgb err ~1.5e-3)")
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_ema_params(args):
    restored, step = ckpt.restore_state(args.model_dir, step=args.model_step)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {args.model_dir}")
    ema = ckpt.get_field(restored, "ema_params")[args.ema_rate]
    print(f"loaded EMA({args.ema_rate}) weights from step {step}")
    return ema


def _decode_samples(args, samples_nhwc: np.ndarray, layer_name: str):
    """Render generated planes to novel views + export video and mesh
    (triplane_sample_layered.py:155-207)."""
    import imageio.v2 as imageio

    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.nerf.geometry import extract_mesh
    from humanliff_tpu.nerf.renderer import RenderConfig, render_image_chunked
    from humanliff_tpu.data.raygen import full_image_rays
    from humanliff_tpu.data.synthetic import SyntheticLayeredDataset
    from humanliff_tpu.mesh import write_ply

    s1, _ = ckpt.restore_state(args.stage1_ckpt)
    if s1 is None:
        raise FileNotFoundError(f"no stage-1 checkpoint under {args.stage1_ckpt}")
    decoder_params = ckpt.get_field(s1, "params")["decoder"]
    decoder = NeRFDecoder(d_in=args.in_channels)
    cast_dtype = jnp.bfloat16 if getattr(args, "render_bf16", True) else jnp.float32
    decoder_params = jax.tree.map(
        lambda p: p.astype(cast_dtype)
        if getattr(p, "dtype", None) == np.float32 or str(getattr(p, "dtype", "")) == "float32"
        else p,
        decoder_params,
    )
    cfg = RenderConfig(n_samples=128, n_importance=128, perturb=False,
                       density_noise=False)

    bounds = np.asarray([[-1.0, -1.2, -1.0], [1.0, 1.2, 1.0]], np.float32)
    S = args.render_size
    cam_src = SyntheticLayeredDataset(image_size=S)

    for si, sample in enumerate(samples_nhwc):
        planes = planes_image_to_triplane(jnp.asarray(sample, cast_dtype))
        frames = []
        for v in range(args.num_views):
            K, R, T = cam_src._camera(v)
            ro, rd, near, far, _ = full_image_rays(S, S, K, R, T, bounds)
            out = render_image_chunked(
                decoder, decoder_params, planes, ro, rd, near, far,
                np.stack(bounds, 0), cfg, chunk=S * S // 16,
            )
            img = (np.clip(np.asarray(out["rgb"]).reshape(S, S, 3), 0, 1) * 255
                   ).astype(np.uint8)
            frames.append(img)
            imageio.imwrite(
                os.path.join(args.out_dir, f"{layer_name}_s{si}_v{v:03d}.png"), img
            )
        try:
            imageio.mimwrite(
                os.path.join(args.out_dir, f"{layer_name}_s{si}.mp4"),
                frames, fps=20,
            )
        except Exception as e:  # mp4 writer may be unavailable offline
            print(f"video export skipped: {e}")

        verts, tris = extract_mesh(
            decoder, decoder_params, planes, bounds,
            resolution=args.mesh_resolution,
        )
        write_ply(os.path.join(args.out_dir, f"{layer_name}_s{si}.ply"), verts, tris)
        print(f"decoded sample {si}: {args.num_views} views, mesh "
              f"{len(verts)} verts / {len(tris)} tris")


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

    key = jax.random.key(args.seed)
    S, C = args.image_size, args.in_channels

    if args.all_layers:
        all_samples = {name: [] for name in LAYER_NAMES}
        done = 0
        while done < args.num_samples:
            key, sub = jax.random.split(key)
            layers = generate_all_layers(
                model, params, diffusion, sub, batch_size=args.batch_size,
                image_size=S, channels=C, use_ddim=args.use_ddim,
            )
            for name, x in layers.items():
                all_samples[name].append(np.asarray(x))
            done += args.batch_size
            print(f"sampled {done}/{args.num_samples}")
        for k_name, chunks in all_samples.items():
            arr = np.concatenate(chunks)[: args.num_samples]
            path = os.path.join(args.out_dir, f"samples_{k_name}.npz")
            ckpt.save_samples_npz(path, arr)
            print("wrote", path)
            if args.decode:
                _decode_samples(args, arr, k_name)
        return

    prev = None
    if args.sample_npz:
        prev = ckpt.load_samples_npz(args.sample_npz).astype(np.float32)
        if prev.shape[0] < args.num_samples:
            raise ValueError(
                f"--sample_npz has {prev.shape[0]} previous-layer samples but "
                f"--num_samples={args.num_samples}; the layered chain needs a "
                "1:1 correspondence (triplane_sample_layered.py:131-132)"
            )
    outs = []
    done = 0
    while done < args.num_samples:
        key, sub = jax.random.split(key)
        # Each batch conditions on its OWN slice of the previous layer's
        # samples, keeping the per-index chain correspondence across runs.
        xc = None
        if prev is not None:
            xc = prev[done : done + args.batch_size]
            if xc.shape[0] < args.batch_size:  # ragged tail: pad (trimmed below)
                pad = args.batch_size - xc.shape[0]
                xc = np.concatenate([xc, np.repeat(xc[-1:], pad, axis=0)])
        samples = generate_layer(
            model, params, diffusion, args.layer_idx, xc, sub,
            args.batch_size, S, C, use_ddim=args.use_ddim,
        )
        outs.append(np.asarray(samples))
        done += args.batch_size
        print(f"sampled {done}/{args.num_samples}")
    arr = np.concatenate(outs)[: args.num_samples]
    name = LAYER_NAMES[args.layer_idx]
    path = os.path.join(args.out_dir, f"samples_{name}.npz")
    ckpt.save_samples_npz(path, arr)
    print("wrote", path)
    if args.decode:
        _decode_samples(args, arr, name)


if __name__ == "__main__":
    main(sys.argv[1:])

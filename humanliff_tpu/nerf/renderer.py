"""Tri-plane NeRF volume renderer as one jitted pure function.

Replaces the reference's ``Renderer.render``/``render_core`` (recon_NeRF/lib/
renderer.py:180-295) and the Python chunking loop around it (run_nerf_batch.py:29-67).
Design differences for TPU:

- Pure function of (decoder params, planes, rays); no module state. Randomness
  (stratified jitter renderer.py/run_nerf_batch.py:48-55, density noise renderer.py:221)
  comes from explicit PRNG keys.
- Static shapes end-to-end; per-image rendering tiles rays with ``lax.map`` over
  fixed-size chunks instead of a host loop.
- The coarse pass runs under ``stop_gradient`` (the reference's ``torch.no_grad``,
  renderer.py:258-269).

Parity quirks preserved (they affect trained quality): the fine-pass alpha uses raw
z-interval widths (NOT ||rays_d||-scaled — renderer.py's scaled recompute is dead
code), while the coarse up-sampler DOES scale by ||rays_d|| (renderer.py:171).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from humanliff_tpu.ops.compositing import composite_rays
from humanliff_tpu.ops.sampling import (
    merge_z_vals,
    stratified_z_vals,
    upsample_z_vals,
)
from humanliff_tpu.ops.triplane import (
    sample_triplane_features,
    sample_triplane_features_xyz,
)

# A deform_fn canonicalizes observation-space points (and optionally view dirs) into
# the tri-plane's canonical frame: (pts (M,3), dirs (M,3)|None) -> (pts, dirs|None).
# When per-call data is needed (pose-dependent inverse-LBS at eval), pass it via
# ``deform_args``: the signature becomes (pts, dirs, deform_args) and the args are
# TRACED jit operands — one compilation serves every view/pose instead of baking
# each pose's SMPL tensors in as HLO constants (a recompile per view otherwise).
DeformFn = Callable[
    [jnp.ndarray, Optional[jnp.ndarray]], Tuple[jnp.ndarray, Optional[jnp.ndarray]]
]


def _apply_deform(deform_fn, pts, dirs, deform_args):
    if deform_args is None:
        return deform_fn(pts, dirs)
    return deform_fn(pts, dirs, deform_args)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    n_samples: int = 128
    n_importance: int = 128
    perturb: bool = True
    white_bkgd: bool = False
    density_noise: bool = True  # reference training-time alpha noise


def render_rays(
    decoder,
    decoder_params,
    planes: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    box_warp: jnp.ndarray,
    cfg: RenderConfig,
    key: Optional[jax.Array] = None,
    deform_fn: Optional[DeformFn] = None,
    deform_args=None,
) -> Dict[str, jnp.ndarray]:
    """Render one set of rays against one (instance, layer) tri-plane.

    Args:
      decoder: a ``NeRFDecoder`` module.
      decoder_params: its variables.
      planes: ``(3, C3, D, D)``.
      rays_o / rays_d: ``(R, 3)`` (rays_d un-normalized, reference convention).
      near / far: ``(R,)``.
      box_warp: ``(2, 3)`` AABB of the canonical (or world) space.
      key: PRNG key for stratified jitter + density noise; None = eval determinism.

    Returns dict with rgb (R, 3), acc (R,), depth (R,) (normalized to [0,1] by
    near/far, renderer.py:288), weights (R, S).
    """
    R = rays_o.shape[0]
    if key is not None:
        k_strat, k_fine, k_noise = jax.random.split(key, 3)
    else:
        k_strat = k_fine = k_noise = None

    z_vals = stratified_z_vals(
        near, far, cfg.n_samples, key=k_strat if cfg.perturb else None
    )

    def features_at(z: jnp.ndarray, dirs_flat: Optional[jnp.ndarray]):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        pts_flat = pts.reshape(-1, 3)
        if deform_fn is not None:
            pts_flat, dirs_flat = _apply_deform(deform_fn, pts_flat, dirs_flat, deform_args)
        feats = sample_triplane_features(planes, pts_flat, box_warp)
        # The fp32 lerp weights promote bf16 plane features to fp32 — cast back so
        # a bf16 plane set gets a true-bf16 decoder MLP (measured ~2x on the MXU).
        feats = feats.astype(planes.dtype)
        if dirs_flat is not None:
            dirs_flat = dirs_flat.astype(planes.dtype)
        return feats, dirs_flat

    if cfg.n_importance > 0:
        # Coarse pass: density only, no gradients (renderer.py:258-269).
        feats, _ = features_at(z_vals, None)
        _, dens = decoder.apply(decoder_params, feats)
        dens = jax.lax.stop_gradient(dens[..., 0].reshape(R, cfg.n_samples))
        new_z = upsample_z_vals(
            dens, jax.lax.stop_gradient(z_vals), rays_d, cfg.n_importance, key=k_fine
        )
        z_vals = merge_z_vals(z_vals, jax.lax.stop_gradient(new_z))

    S = z_vals.shape[-1]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dirs_flat = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(-1, 3)

    feats, dirs_flat = features_at(z_vals, dirs_flat)
    rgb_raw, dens_raw = decoder.apply(decoder_params, feats, dirs_flat)
    rgb = jax.nn.sigmoid(rgb_raw).reshape(R, S, 3)
    dens = dens_raw[..., 0].reshape(R, S)

    noise_key = k_noise if cfg.density_noise and key is not None else None
    rgb_map, acc_map, depth_map = composite_rays(
        rgb, dens, z_vals, noise_key=noise_key, white_bkgd=cfg.white_bkgd
    )
    depth_map = (depth_map - near) / (far - near + 1e-5)
    return {"rgb": rgb_map, "acc": acc_map, "depth": depth_map}


def render_rays_batch(
    decoder,
    decoder_params,
    planes: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    box_warp: jnp.ndarray,
    cfg: RenderConfig,
    key: Optional[jax.Array] = None,
    deform_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Natively-batched render: leading batch axis on everything.

    Deliberately NOT a vmap of ``render_rays``: vmapping batches the tri-plane
    gather, which XLA lowers ~3x slower than the flattened-table path inside
    ``sample_triplane_features`` (and the naive form ~100x slower).

    ``deform_fn`` (canonical-space mode) maps observation points into the planes'
    canonical frame, batched: (pts (B, M, 3), dirs (B, M, 3)|None) -> (pts, dirs).
    """
    B, R = rays_o.shape[:2]
    if key is not None:
        k_strat, k_fine, k_noise = jax.random.split(key, 3)
    else:
        k_strat = k_fine = k_noise = None

    z_vals = stratified_z_vals(
        near, far, cfg.n_samples, key=k_strat if cfg.perturb else None
    )

    def features_at(z, dirs=None):
        if deform_fn is not None:
            pts = rays_o[:, :, None, :] + rays_d[:, :, None, :] * z[..., None]
            pts, dirs = deform_fn(pts.reshape(B, -1, 3), dirs)
            comps = [pts[..., d] for d in range(3)]
        else:
            # Component-wise points: (B, R*S) arrays tile cleanly; an (M, 3) array
            # would be lane-padded 3 -> 128 by XLA (42.7x HBM expansion at scale).
            comps = [
                (rays_o[:, :, None, d] + rays_d[:, :, None, d] * z).reshape(B, -1)
                for d in range(3)
            ]
        feats = sample_triplane_features_xyz(planes, *comps, box_warp)
        # Keep the decoder MLP in the planes' dtype (fp32 lerp weights would
        # otherwise promote bf16 features back to fp32 compute).
        feats = feats.astype(planes.dtype)
        if dirs is not None:
            dirs = dirs.astype(planes.dtype)
        return feats, dirs

    if cfg.n_importance > 0:
        feats, _ = features_at(z_vals)
        _, dens = decoder.apply(decoder_params, feats)
        dens = jax.lax.stop_gradient(dens[..., 0].reshape(B, R, cfg.n_samples))
        new_z = upsample_z_vals(
            dens, jax.lax.stop_gradient(z_vals), rays_d, cfg.n_importance, key=k_fine
        )
        z_vals = merge_z_vals(z_vals, jax.lax.stop_gradient(new_z))

    S = z_vals.shape[-1]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dirs = jnp.broadcast_to(viewdirs[:, :, None, :], (B, R, S, 3)).reshape(B, -1, 3)

    feats, dirs = features_at(z_vals, dirs)
    rgb_raw, dens_raw = decoder.apply(decoder_params, feats, dirs)
    rgb = jax.nn.sigmoid(rgb_raw).reshape(B, R, S, 3)
    dens = dens_raw[..., 0].reshape(B, R, S)

    noise_key = k_noise if cfg.density_noise and key is not None else None
    rgb_map, acc_map, depth_map = composite_rays(
        rgb, dens, z_vals, noise_key=noise_key, white_bkgd=cfg.white_bkgd
    )
    depth_map = (depth_map - near) / (far - near + 1e-5)
    return {"rgb": rgb_map, "acc": acc_map, "depth": depth_map}


def render_image_masked(
    decoder,
    decoder_params,
    planes: jnp.ndarray,
    rays_o,
    rays_d,
    near,
    far,
    mask,
    box_warp,
    cfg: RenderConfig,
    chunk: int = 16384,
    deform_fn: Optional[DeformFn] = None,
    deform_args=None,
    bg_color: float = 0.0,
    outputs: Tuple[str, ...] = ("rgb", "acc", "depth"),
) -> Dict[str, jnp.ndarray]:
    """Full-image render that computes ONLY the rays whose AABB test passed.

    The reference renders every pixel and then zeroes the non-box ones
    (all_test.py:178 ``img_pred[~mask_at_box] = 0``); out-of-box rays get
    near=0/far=1 dummy bounds, so their compute is pure waste — typically
    60-75% of a 512^2 view. Here the valid rays are compacted host-side,
    padded to a multiple of ``chunk``, rendered tile-by-tile through ONE
    fixed-shape jitted program (no per-view recompiles), and scattered back;
    non-box pixels are filled with ``bg_color`` — bit-identical output to the
    dense path at a fraction of the cost.

    ``mask`` is the host-side boolean mask from ``full_image_rays``. All other
    args as in :func:`render_image_chunked`. Returns HOST numpy arrays.

    Data-movement note (tunneled TPU: host<->device runs at a few MB/s): the
    compacted rays upload once, per-tile access slices the device arrays, and
    only the compact per-ray results come back — scattered host-side.
    """
    import numpy as np

    mask = np.asarray(mask).reshape(-1).astype(bool)
    N = mask.shape[0]
    full = {
        "rgb": np.full((N, 3), bg_color, np.float32),
        "acc": np.zeros((N,), np.float32),
        "depth": np.zeros((N,), np.float32),
    }
    full = {k: full[k] for k in outputs}
    idx = np.flatnonzero(mask)
    n = idx.shape[0]
    if n == 0:
        return full
    pad = (-n) % chunk
    idx_p = np.concatenate([idx, np.full((pad,), idx[0], idx.dtype)])

    ro_d = jnp.asarray(np.ascontiguousarray(np.asarray(rays_o)[idx_p], np.float32))
    rd_d = jnp.asarray(np.ascontiguousarray(np.asarray(rays_d)[idx_p], np.float32))
    nr_d = jnp.asarray(np.ascontiguousarray(np.asarray(near)[idx_p], np.float32))
    fr_d = jnp.asarray(np.ascontiguousarray(np.asarray(far)[idx_p], np.float32))
    box = jnp.asarray(np.asarray(box_warp, np.float32))

    eval_cfg = dataclasses.replace(cfg, perturb=False, density_noise=False)
    tile_fn = _masked_tile_fn(decoder, eval_cfg, deform_fn)

    outs = []
    for s in range(0, idx_p.shape[0], chunk):
        sl = slice(s, s + chunk)
        outs.append(
            tile_fn(
                decoder_params, planes,
                ro_d[sl], rd_d[sl], nr_d[sl], fr_d[sl], box, deform_args,
            )
        )
        _maybe_serialize(outs[-1])
    for k in full:
        merged = np.concatenate(
            [np.asarray(o[k], np.float32) for o in outs]
        )[:n]
        full[k][idx] = merged
    return full


def _maybe_serialize(out) -> None:
    """HL_SERIAL_DISPATCH=1: force one result readback per dispatched tile.

    Some tunneled remote executors wedge permanently when a second program is
    dispatched while one is in flight (see CLAUDE.md round-3 notes); the env
    var serializes every tile loop at ~one RTT per tile."""
    import os

    if os.environ.get("HL_SERIAL_DISPATCH"):
        import numpy as _np

        leaf = next(iter(out.values())) if isinstance(out, dict) else out
        _np.asarray(leaf[:1])


def _masked_tile_fn(decoder, cfg: RenderConfig, deform_fn):
    """One jitted fixed-shape tile renderer, cached per (decoder, cfg, deform_fn)."""
    key = (id(decoder), cfg, None if deform_fn is None else id(deform_fn))
    fn = _TILE_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(params, planes, ro, rd, nr, fr, box, deform_args):
            return render_rays(
                decoder, params, planes, ro, rd, nr, fr, box, cfg,
                key=None, deform_fn=deform_fn, deform_args=deform_args,
            )

        _TILE_CACHE[key] = fn
    return fn


_TILE_CACHE: Dict = {}


def render_image_chunked(
    decoder,
    decoder_params,
    planes: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    box_warp: jnp.ndarray,
    cfg: RenderConfig,
    chunk: int = 4096,
    deform_fn: Optional[DeformFn] = None,
    deform_args=None,
) -> Dict[str, jnp.ndarray]:
    """Full-image eval rendering: pad rays to a chunk multiple, ``lax.map`` tiles.

    Deterministic (no keys), mirroring the reference test path (all_test.py:153
    chunk=H*W/16) but as a single jitted program instead of a host loop.
    """
    N = rays_o.shape[0]
    pad = (-N) % chunk

    def padded(x):
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths).reshape(-1, chunk, *x.shape[1:])

    eval_cfg = dataclasses.replace(cfg, perturb=False, density_noise=False)

    def tile(args):
        ro, rd, nr, fr = args
        return render_rays(
            decoder, decoder_params, planes, ro, rd, nr, fr, box_warp, eval_cfg,
            key=None, deform_fn=deform_fn, deform_args=deform_args,
        )

    out = jax.lax.map(tile, (padded(rays_o), padded(rays_d), padded(near), padded(far)))
    return {k: v.reshape(-1, *v.shape[2:])[:N] for k, v in out.items()}

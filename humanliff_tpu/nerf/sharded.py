"""Mesh-sharded novel-view decoding.

The decode workload — 25 samples x 4 layers x 40 views at 512^2 with 128+128
samples/ray (reference: triplane_sample_layered.py:155-176) — is
embarrassingly parallel across rays. The reference splits inference across
ranks (:211-219); here the masked rays of ALL requested views tile into fixed
``chunk``-ray blocks and the TILE axis shards across the mesh's data axis via
``shard_map``: every chip runs the exact single-chip tile renderer
(nerf/renderer.render_rays, eval config) over its local block of tiles with
``lax.map``, params/planes replicated, and the only communication is the
final gather of compact per-ray outputs. Output is numerically identical to
:func:`render_image_masked` per view (tests/test_sharded_decode.py proves it
on the 8-device CPU mesh).

Per-view deform args (canonical/TightCap decode) are supported by stacking
each tile's view args along the tile axis — tiles never span views, so one
tile carries exactly one view's SMPL tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from humanliff_tpu.nerf.renderer import RenderConfig, render_rays

_SHARDED_CACHE: Dict = {}


def _sharded_tile_fn(decoder, cfg: RenderConfig, deform_fn, mesh, axis_name: str,
                     outputs: Tuple[str, ...]):
    key = (id(decoder), cfg, None if deform_fn is None else id(deform_fn),
           mesh, axis_name, outputs)
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        data = P(axis_name)
        repl = P()

        def body(params, planes, ro, rd, nr, fr, box, dargs):
            # Local view: (T_local, chunk, ...) tiles for THIS device.
            def tile(args):
                ro_t, rd_t, nr_t, fr_t, da = args
                out = render_rays(
                    decoder, params, planes, ro_t, rd_t, nr_t, fr_t, box, cfg,
                    key=None, deform_fn=deform_fn, deform_args=da,
                )
                return {k: out[k] for k in outputs}

            return lax.map(tile, (ro, rd, nr, fr, dargs))

        fn = jax.jit(
            shard_map(
                body,
                mesh=mesh,
                in_specs=(repl, repl, data, data, data, data, repl, data),
                out_specs=data,
                check_vma=False,
            )
        )
        _SHARDED_CACHE[key] = fn
    return fn


def render_views_sharded(
    decoder,
    decoder_params,
    planes: jnp.ndarray,
    view_items: List[Dict[str, np.ndarray]],
    cfg: RenderConfig,
    mesh,
    chunk: int = 16384,
    deform_fn=None,
    deform_args_fn: Optional[Callable] = None,
    bg_color: float = 0.0,
    outputs: Tuple[str, ...] = ("rgb",),
    axis_name: str = "data",
) -> List[Dict[str, np.ndarray]]:
    """Render every view item's masked rays with tiles sharded over ``mesh``.

    ``view_items`` follow the eval-harness schema (rays_o/rays_d/near/far/
    ray_mask [+ box_warp]); ``deform_args_fn(item)`` extracts per-view traced
    SMPL args for canonical decode. Returns one dict of HOST arrays per view
    in the same flat layout as ``render_image_masked``.

    All views must share ``box_warp`` (one tri-plane space per call — true for
    a (sample, layer) decode; SynBody per-pose boxes go in per-call groups).
    """
    n_dev = int(mesh.devices.size)
    box_np = np.asarray(view_items[0]["box_warp"], np.float32)
    for it in view_items[1:]:
        if not np.array_equal(np.asarray(it["box_warp"], np.float32), box_np):
            raise ValueError("render_views_sharded needs a shared box_warp; "
                             "group views by box first")

    # ---- Build the tile grid (tiles never span views) ----
    per_view: List[Tuple[np.ndarray, int, int]] = []  # (idx, n_tiles, N_pixels)
    cols = {k: [] for k in ("rays_o", "rays_d", "near", "far")}
    dargs_tiles = []
    for item in view_items:
        mask = np.asarray(item["ray_mask"]).reshape(-1).astype(bool)
        idx = np.flatnonzero(mask)
        n = idx.shape[0]
        if n == 0:
            per_view.append((idx, 0, mask.shape[0]))
            continue
        pad = (-n) % chunk
        idx_p = np.concatenate([idx, np.full((pad,), idx[0], idx.dtype)])
        n_tiles = idx_p.shape[0] // chunk
        for k in cols:
            arr = np.asarray(item[k], np.float32)
            arr = arr.reshape(arr.shape[0], -1)[idx_p]
            cols[k].append(arr.reshape(n_tiles, chunk, -1).squeeze(-1)
                           if arr.shape[1] == 1
                           else arr.reshape(n_tiles, chunk, arr.shape[1]))
        if deform_args_fn is not None:
            da = deform_args_fn(item)
            dargs_tiles += [da] * n_tiles
        per_view.append((idx, n_tiles, mask.shape[0]))

    total_tiles = sum(t for _, t, _ in per_view)
    if total_tiles == 0:
        return [
            {k: np.full((N, 3) if k == "rgb" else (N,), bg_color
                        if k == "rgb" else 0.0, np.float32)
             for k in outputs}
            for _, _, N in per_view
        ]

    grid = {k: np.concatenate(v) for k, v in cols.items()}
    # Pad the tile count to a device multiple with dummy (first-tile) copies.
    tile_pad = (-total_tiles) % n_dev
    if tile_pad:
        for k in grid:
            grid[k] = np.concatenate([grid[k], np.repeat(grid[k][:1], tile_pad, 0)])
        if deform_args_fn is not None:
            dargs_tiles += [dargs_tiles[0]] * tile_pad

    data_sh = NamedSharding(mesh, P(axis_name))
    repl_sh = NamedSharding(mesh, P())
    dev = {k: jax.device_put(jnp.asarray(v), data_sh) for k, v in grid.items()}
    params_r = jax.tree.map(lambda p: jax.device_put(p, repl_sh), decoder_params)
    planes_r = jax.device_put(planes, repl_sh)
    box = jax.device_put(jnp.asarray(box_np), repl_sh)
    if deform_args_fn is not None:
        dargs = jax.tree.map(
            lambda *xs: jax.device_put(jnp.stack([jnp.asarray(x) for x in xs]),
                                       data_sh),
            *dargs_tiles,
        )
    else:
        # A tiny per-tile placeholder keeps the body signature uniform
        # (render_rays never touches deform_args when deform_fn is None).
        T = grid["near"].shape[0]
        dargs = jax.device_put(jnp.zeros((T, 1), jnp.float32), data_sh)

    eval_cfg = dataclasses.replace(cfg, perturb=False, density_noise=False)
    fn = _sharded_tile_fn(decoder, eval_cfg, deform_fn, mesh, axis_name, outputs)
    out = fn(params_r, planes_r, dev["rays_o"], dev["rays_d"], dev["near"],
             dev["far"], box, dargs)

    host = {k: np.asarray(out[k], np.float32) for k in outputs}  # (T, chunk[,3])

    # ---- Scatter tiles back into per-view images ----
    results = []
    t0 = 0
    for idx, n_tiles, N in per_view:
        res = {
            k: np.full((N, 3) if k == "rgb" else (N,),
                       bg_color if k == "rgb" else 0.0, np.float32)
            for k in outputs
        }
        if n_tiles:
            n = idx.shape[0]
            for k in outputs:
                flat = host[k][t0 : t0 + n_tiles].reshape(n_tiles * chunk, -1)
                flat = flat[:n]
                res[k][idx] = flat if res[k].ndim > 1 else flat[:, 0]
            t0 += n_tiles
        results.append(res)
    return results

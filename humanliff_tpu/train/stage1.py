"""Stage-1 reconstruction training: tri-plane table + shared decoder.

The jitted train step replaces run_nerf_batch.py:227-330. Loss parity
(run_nerf_batch.py:253-262): image MSE + 0.1 * acc(mask) MSE + tv_coef * TV(L1) over
the batch's active (instance, layer) plane slices + l1_coef * L1-to-zero on the same
slices. Per-step plane clamp to [-1, 1].

TPU design notes:
- The tri-plane table ``(N, 4, 3, C3, D, D)`` is an ordinary param; a batch step
  gathers only its active slices with ``jnp.take`` — under pjit with the table sharded
  by instance on the data axis, the gather + scatter-add of gradients ride ICI only
  for remote instances, instead of the reference's full-table DDP allreduce
  (SURVEY.md §2.3).
- Fixed-shape ray batches: invalid rays (outside the AABB) carry a 0 weight in
  ``ray_mask`` instead of being dropped (the reference resamples until full,
  if_nerf_data_utils.py:115-160 — same distribution, static shapes).
- Canonical-space (TightCap) batches pre-supply posed SMPL vertices and params; the
  inverse-LBS deform runs natively batched (deform_to_canonical_batched) — its
  per-vertex gathers flatten the batch into single table lookups.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from humanliff_tpu.bodymodel.canonical import (
    deform_to_canonical,
    deform_to_canonical_batched,
)
from humanliff_tpu.bodymodel.smpl import BodyModel
from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig, render_rays, render_rays_batch
from humanliff_tpu.train.optim import clamp_planes


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    num_instances: int = 1
    num_layers: int = 4
    triplane_dim: int = 256
    triplane_ch: int = 27  # total channels across the 3 planes
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    tv_loss_coef: float = 1e-4
    l1_loss_coef: float = 1e-4
    acc_loss_coef: float = 0.1
    use_clamp: bool = True
    use_canonical_space: bool = False  # TightCap mode
    use_bf16: bool = False  # bf16 render compute (fp32 master planes/decoder)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = jax.tree.map(lambda p, u: p + u, self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt)


def init_params(
    key: jax.Array, cfg: Stage1Config, decoder: NeRFDecoder
) -> Dict[str, Any]:
    """Initialize the tri-plane table N(0, 0.1^2) (renderer.py:26-27) + decoder."""
    k_planes, k_dec = jax.random.split(key)
    planes = 0.1 * jax.random.normal(
        k_planes,
        (
            cfg.num_instances,
            cfg.num_layers,
            3,
            cfg.triplane_ch // 3,
            cfg.triplane_dim,
            cfg.triplane_dim,
        ),
        jnp.float32,
    )
    feats = jnp.zeros((1, cfg.triplane_ch))
    dirs = jnp.zeros((1, 3))
    dec_vars = decoder.init(k_dec, feats, dirs)
    return {"planes": planes, "decoder": dec_vars}


def create_train_state(
    key: jax.Array, cfg: Stage1Config, decoder: NeRFDecoder, tx
) -> TrainState:
    params = init_params(key, cfg, decoder)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )


def _masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSE over valid rays only; mask broadcast over trailing dims."""
    while mask.ndim < pred.ndim:
        mask = mask[..., None]
    se = (pred - target) ** 2 * mask
    return se.sum() / jnp.maximum((jnp.ones_like(se) * mask).sum(), 1.0)


def stage1_loss(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    decoder: NeRFDecoder,
    cfg: Stage1Config,
    key: jax.Array,
    body_model: Optional[BodyModel] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + aux metrics for one batch."""
    planes_b = params["planes"][batch["instance_idx"], batch["layer_idx"]]
    B = planes_b.shape[0]
    keys = jax.random.split(key, B)

    decoder_params = params["decoder"]
    if cfg.use_bf16:
        # Compute-cast (masters stay fp32): halves gather bytes + MXU time. The
        # reference trains Stage 1 in fp32 (run_nerf_batch.py:206), so this is
        # opt-in; validate PSNR parity before enabling for quality runs.
        cast = lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p
        planes_b = cast(planes_b)
        decoder_params = jax.tree.map(cast, decoder_params)

    if cfg.use_canonical_space:
        assert body_model is not None
        t_poses = jnp.asarray(batch["t_poses"])  # (B, J*3) big pose per item
        Rg, Th = batch["R"], batch["Th"]

        def deform(pts, dirs):
            # world -> SMPL space (renderer.py:129-134), then batched inverse LBS.
            pts = jnp.einsum("bmd,bde->bme", pts - Th[:, None], Rg)
            if dirs is not None:
                dirs = jnp.einsum("bmd,bde->bme", dirs - Th[:, None], Rg)
            return deform_to_canonical_batched(
                body_model, batch["poses"], batch["betas"], t_poses,
                batch["smpl_verts"], pts, dirs,
            )

        out = render_rays_batch(
            decoder, decoder_params, planes_b,
            batch["rays_o"], batch["rays_d"], batch["near"], batch["far"],
            batch["box_warp"], cfg.render, key=keys[0], deform_fn=deform,
        )
    else:
        # Natively batched (no vmap): see render_rays_batch / triplane.py notes on
        # the batched-gather pathology.
        out = render_rays_batch(
            decoder,
            decoder_params,
            planes_b,
            batch["rays_o"],
            batch["rays_d"],
            batch["near"],
            batch["far"],
            batch["box_warp"],
            cfg.render,
            key=keys[0],
        )

    mask = batch.get("ray_mask", jnp.ones_like(batch["near"]))
    out = jax.tree.map(lambda v: v.astype(jnp.float32), out)
    img_loss = _masked_mse(out["rgb"], batch["rgb"], mask)
    acc_loss = _masked_mse(out["acc"], batch["bkgd_msk"], mask)

    # TV + L1 on the active plane slices (run_nerf_batch.py:255-259), fp32 masters.
    planes_f32 = params["planes"][batch["instance_idx"], batch["layer_idx"]]
    tv = jnp.abs(planes_f32[..., 1:, :] - planes_f32[..., :-1, :]).mean() + jnp.abs(
        planes_f32[..., :, 1:] - planes_f32[..., :, :-1]
    ).mean()
    l1 = jnp.abs(planes_f32).mean()

    loss = (
        img_loss
        + cfg.acc_loss_coef * acc_loss
        + cfg.tv_loss_coef * tv
        + cfg.l1_loss_coef * l1
    )
    psnr = -10.0 * jnp.log(jnp.maximum(img_loss, 1e-10)) / jnp.log(10.0)
    aux = {"img_loss": img_loss, "acc_loss": acc_loss, "tv": tv, "l1": l1, "psnr": psnr}
    return loss, aux


@partial(jax.jit, static_argnames=("decoder", "cfg", "body_model"), donate_argnums=0)
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    decoder: NeRFDecoder,
    cfg: Stage1Config,
    body_model: Optional[BodyModel] = None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    (loss, aux), grads = jax.value_and_grad(stage1_loss, has_aux=True)(
        state.params, batch, decoder, cfg, key, body_model
    )
    state = state.apply_gradients(grads)
    if cfg.use_clamp:
        state = state.replace(params=clamp_planes(state.params))
    aux["loss"] = loss
    return state, aux

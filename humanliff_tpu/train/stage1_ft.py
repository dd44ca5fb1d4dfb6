"""Per-subject tri-plane fine-tuning with the frozen shared decoder.

Reference: recon_NeRF/run_nerf_batch_ft.py — the decoder freezes (:124-129), a
single-instance plane table re-initializes per (subject, layer): layer 0 warm-starts
from the shared checkpoint's instance-0 planes (:111-113), layer k>0 from this
subject's just-fitted layer k-1 (:114-119); 2000 steps per (subject, layer) with
lr x0.5 / 500 steps (:294-299); outputs tri-plane-only artifacts (:323-333).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.train.checkpoint import save_subject_planes
from humanliff_tpu.train.optim import make_finetune_optimizer
from humanliff_tpu.train.stage1 import Stage1Config, TrainState, train_step


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    steps_per_layer: int = 2000
    plane_lr: float = 1e-1
    lr_decay_every: int = 500
    save_step: int = 2000
    # Per-step scalar readback cadence. The tunneled remote executor wedges
    # whenever a second program is dispatched while one is in flight (see
    # cli/recon_train.py); strictly-serial dispatch (sync_every=1) is the only
    # pattern that has never wedged on the axon tunnel. 0 disables.
    sync_every: int = 1


def finetune_subject(
    decoder: NeRFDecoder,
    shared_params: Dict,
    subject_batches: Callable[[int, jax.Array], Dict[str, jnp.ndarray]],
    cfg: Stage1Config,
    ft_cfg: FinetuneConfig,
    out_dir: str,
    subject_name: str,
    key: jax.Array,
    body_model=None,
    log_every: int = 200,
) -> np.ndarray:
    """Fit all 4 layers of one subject; returns planes (L, 3, C3, D, D) and writes
    the per-layer npz artifact."""
    os.makedirs(out_dir, exist_ok=True)
    ft_cfg_steps = ft_cfg.steps_per_layer
    single_cfg = dataclasses.replace(cfg, num_instances=1)

    # Seed planes: shared checkpoint's first instance (run_nerf_batch_ft.py:111-113).
    planes = jnp.asarray(shared_params["planes"][0:1])  # (1, L, 3, C3, D, D)
    fitted = []

    tx = make_finetune_optimizer(ft_cfg.plane_lr, ft_cfg.lr_decay_every)

    for layer in range(cfg.num_layers):
        if layer > 0:
            # Cascade warm start: copy this subject's fitted layer-(k-1) planes.
            planes = planes.at[0, layer].set(fitted[-1])
        params = {"decoder": shared_params["decoder"], "planes": planes}
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )
        for step in range(ft_cfg_steps):
            key, k_batch, k_step = jax.random.split(key, 3)
            batch = subject_batches(layer, k_batch)
            state, aux = train_step(
                state, batch, k_step, decoder, single_cfg, body_model
            )
            if ft_cfg.sync_every and (step + 1) % ft_cfg.sync_every == 0:
                float(aux["loss"])
            if log_every and (step + 1) % log_every == 0:
                print(
                    f"[ft {subject_name} layer {layer}] step {step + 1} "
                    f"psnr {float(aux['psnr']):.2f}"
                )
        planes = state.params["planes"]
        fitted.append(planes[0, layer])

    all_planes = jnp.stack(fitted, axis=0)  # (L, 3, C3, D, D)
    path = os.path.join(out_dir, f"{subject_name}_{ft_cfg.save_step:06d}.npz")
    save_subject_planes(path, np.asarray(all_planes), ft_cfg.save_step)
    return np.asarray(all_planes)


def finetune_subjects_batched(
    decoder: NeRFDecoder,
    shared_params: Dict,
    subject_batches: Callable[[int, int, jax.Array], Dict[str, jnp.ndarray]],
    cfg: Stage1Config,
    ft_cfg: FinetuneConfig,
    out_dir: str,
    subject_names,
    key: jax.Array,
    body_model=None,
    log_every: int = 200,
    mesh=None,
) -> np.ndarray:
    """Fit all layers of N subjects CONCURRENTLY; returns (N, L, 3, C3, D, D).

    The decoder is frozen, so per-subject fits are mathematically independent:
    one plane table with N instances fits every subject in a single jitted
    step (each step carries each subject's ray items at its instance slot).
    Adam's per-parameter normalization cancels the 1/N loss-mean scaling, so
    per-subject trajectories match serial :func:`finetune_subject` fits
    (tests/test_stage1_ft_batched.py). With ``mesh`` the table shards by
    instance over the data axis — the TPU-native form of the reference's
    subject-range-per-GPU split (run_nerf_batch_ft.py:348-360): N subjects x
    2000 steps cost one subject's wall-clock per chip group.

    ``subject_batches(subject_pos, layer, key)`` returns one stacked item
    batch for that subject (same schema as :func:`finetune_subject`'s
    callback); its instance_idx values are overwritten with the slot index.
    """
    os.makedirs(out_dir, exist_ok=True)
    N = len(subject_names)
    ncfg = dataclasses.replace(cfg, num_instances=N)
    tx = make_finetune_optimizer(ft_cfg.plane_lr, ft_cfg.lr_decay_every)

    if mesh is not None:
        from humanliff_tpu.parallel import shard_batch
        from humanliff_tpu.parallel.mesh import shard_stage1_params

    # Every subject seeds from the shared checkpoint's first instance
    # (run_nerf_batch_ft.py:111-113).
    planes = jnp.repeat(jnp.asarray(shared_params["planes"][0:1]), N, axis=0)
    fitted = []  # per layer: (N, 3, C3, D, D)

    for layer in range(cfg.num_layers):
        if layer > 0:
            planes = planes.at[:, layer].set(fitted[-1])
        params = {"decoder": shared_params["decoder"], "planes": planes}
        if mesh is not None:
            params = shard_stage1_params(params, mesh)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )
        for step in range(ft_cfg.steps_per_layer):
            keys = jax.random.split(key, N + 2)
            key, k_step, k_subj = keys[0], keys[1], keys[2:]
            parts = []
            for i in range(N):
                b = dict(subject_batches(i, layer, k_subj[i]))
                Bs = np.asarray(b["rays_o"]).shape[0]
                b["instance_idx"] = np.full((Bs,), i, np.int32)
                b["layer_idx"] = np.full((Bs,), layer, np.int32)
                parts.append(b)
            batch = {
                k: np.concatenate([np.asarray(p[k]) for p in parts])
                for k in parts[0]
            }
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, aux = train_step(
                state, batch, k_step, decoder, ncfg, body_model
            )
            if ft_cfg.sync_every and (step + 1) % ft_cfg.sync_every == 0:
                float(aux["loss"])
            if log_every and (step + 1) % log_every == 0:
                print(
                    f"[ft-batched x{N} layer {layer}] step {step + 1} "
                    f"psnr {float(aux['psnr']):.2f}"
                )
        planes = state.params["planes"]
        fitted.append(planes[:, layer])

    all_planes = np.asarray(jnp.stack(fitted, axis=1))  # (N, L, 3, C3, D, D)
    for i, name in enumerate(subject_names):
        path = os.path.join(out_dir, f"{name}_{ft_cfg.save_step:06d}.npz")
        save_subject_planes(path, all_planes[i], ft_cfg.save_step)
    return all_planes

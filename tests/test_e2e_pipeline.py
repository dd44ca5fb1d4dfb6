"""End-to-end two-stage pipeline on synthetic data (tiny shapes, CPU).

Covers the full reference workflow: shared stage-1 training -> per-subject
fine-tune -> plane packing -> diffusion training -> 4-layer progressive sampling
-> NeRF decode of a generated plane -> mesh extraction. Everything in-process.
"""

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.data.synthetic import SyntheticLayeredDataset
from humanliff_tpu.data.triplane_data import TriplaneDataset, pack_subject_planes
from humanliff_tpu.diffusion.respace import create_diffusion
from humanliff_tpu.models.unet import UNetModel
from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.geometry import extract_mesh
from humanliff_tpu.nerf.renderer import RenderConfig, render_image_chunked
from humanliff_tpu.sampling.layered import generate_all_layers, planes_image_to_triplane
from humanliff_tpu.train import checkpoint as ckpt
from humanliff_tpu.train.optim import make_stage1_optimizer
from humanliff_tpu.train.stage1 import Stage1Config, TrainState, init_params, train_step
from humanliff_tpu.train.stage1_ft import FinetuneConfig, finetune_subject
from humanliff_tpu.train.stage2 import Stage2Config, create_stage2_state
from humanliff_tpu.train.stage2 import train_step as s2_step


def test_full_pipeline(tmp_path):
    D, CH = 16, 27
    cfg = Stage1Config(
        num_instances=2,
        num_layers=4,
        triplane_dim=D,
        triplane_ch=CH,
        render=RenderConfig(n_samples=12, n_importance=12),
        tv_loss_coef=1e-5,
        l1_loss_coef=1e-5,
    )
    decoder = NeRFDecoder(d_in=CH)
    ds = SyntheticLayeredDataset(num_instances=2, n_rays=96, image_size=32)

    # ---- Stage 1: shared training ----
    tx = make_stage1_optimizer(plane_lr=5e-2)
    params = init_params(jax.random.key(0), cfg, decoder)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )
    key = jax.random.key(1)
    rng = np.random.default_rng(0)
    first = last = None
    for i in range(40):
        idxs = rng.integers(0, len(ds), 2)
        items = [ds.item(int(j), rng) for j in idxs]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        key, sub = jax.random.split(key)
        state, aux = train_step(state, batch, sub, decoder, cfg)
        if first is None:
            first = float(aux["img_loss"])
    last = float(aux["img_loss"])
    assert last < first, (first, last)

    # ---- Stage 1: fine-tune one subject (frozen decoder, layer cascade) ----
    def subject_batches(layer, k, subj=0):
        r = np.random.default_rng(int(jax.random.randint(k, (), 0, 2**31 - 1)))
        per_layer = 64
        items = []
        for _ in range(2):
            view = int(r.integers(0, per_layer))
            it = ds.item(subj * 4 * per_layer + layer * per_layer + view, r)
            it["instance_idx"] = np.int32(0)
            items.append(it)
        return {k2: np.stack([it[k2] for it in items]) for k2 in items[0]}

    planes = finetune_subject(
        decoder, jax.tree.map(np.asarray, state.params), subject_batches, cfg,
        FinetuneConfig(steps_per_layer=10),
        str(tmp_path), "subject0000", jax.random.key(2), log_every=0,
    )
    assert planes.shape == (4, 3, CH // 3, D, D)
    subj_path = os.path.join(tmp_path, "subject0000_002000.npz")
    assert os.path.exists(subj_path)

    # ---- Pack planes for the diffusion stage ----
    packed = os.path.join(tmp_path, "packed.npy")
    pack_subject_planes([subj_path], packed)
    tds = TriplaneDataset(packed)
    assert len(tds) == 4
    item = tds.item(2)
    assert item["x"].shape == (D, D, CH)
    assert item["y"] == 2
    np.testing.assert_allclose(  # x_cond of layer k is layer k-1's planes
        item["x_cond"], tds.item(1)["x"], atol=0
    )

    # ---- Stage 2: diffusion training on the packed planes ----
    model = UNetModel(
        in_channels=CH, model_channels=16, out_channels=CH, num_res_blocks=1,
        attention_resolutions=(4,), channel_mult=(1, 2), num_classes=4,
        num_heads=2, cond_type="controlnet",
    )
    diffusion = create_diffusion(steps=20)
    object.__setattr__(diffusion, "channel_axis", -1)
    x0 = jnp.zeros((1, D, D, CH))
    p2 = model.init(jax.random.key(3), x0, jnp.zeros((1,)), x0, jnp.zeros((1,), jnp.int32))
    s2cfg = Stage2Config(lr=1e-3)
    s2 = create_stage2_state(p2, s2cfg, diffusion.num_timesteps)
    for i in range(6):
        items = [tds.item(i % 4) for i in range(2)]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        s2, m = s2_step(s2, batch, jax.random.fold_in(jax.random.key(4), i),
                        model, diffusion, s2cfg)
    assert np.isfinite(float(m["loss"]))

    # ---- 4-layer progressive sampling + decode ----
    layers = generate_all_layers(
        model, s2.ema_params["0.9999"], diffusion, jax.random.key(5),
        batch_size=1, image_size=D, channels=CH,
    )
    assert len(layers) == 4
    sample = np.asarray(layers["person_pant_shirt_shoes"][0])
    assert np.isfinite(sample).all()

    # ---- Chain fidelity (the layered contract) ----
    from humanliff_tpu.eval.fidelity import chain_fidelity_report, plane_fidelity

    report = chain_fidelity_report({k: np.asarray(v) for k, v in layers.items()})
    assert list(report) == [
        "person->person_pant",
        "person_pant->person_pant_shirt",
        "person_pant_shirt->person_pant_shirt_shoes",
    ]
    assert all(np.isfinite(m["outside_psnr"]) for m in report.values())
    # GT planes obey the contract by construction: consecutive fine-tuned
    # layers (warm-started from each other) stay far closer than an unrelated
    # random plane. (A converged fit localizes the change region too — that
    # stronger property is asserted on analytic GT in test_fidelity.py.)
    x1, x0 = tds.item(1)["x"], tds.item(1)["x_cond"]
    rnd = np.random.default_rng(9).uniform(-1, 1, x1.shape).astype(np.float32)
    assert np.abs(x1 - x0).mean() < 0.5 * np.abs(rnd - x0).mean()
    assert np.isfinite(plane_fidelity(x1, x0)["change_fraction"])

    tri = planes_image_to_triplane(jnp.asarray(sample))
    assert tri.shape == (3, CH // 3, D, D)

    # Render one tiny novel view from the generated planes.
    from humanliff_tpu.data.raygen import full_image_rays

    K = np.asarray([[24.0, 0, 8], [0, 24.0, 8], [0, 0, 1]])
    ro, rd, near, far, _ = full_image_rays(
        16, 16, K, np.eye(3), np.asarray([[0.0], [0.0], [3.0]]), ds.bounds
    )
    out = render_image_chunked(
        decoder, state.params["decoder"], tri, ro, rd, near, far,
        jnp.asarray(ds.bounds), RenderConfig(n_samples=8, n_importance=8,
                                             perturb=False, density_noise=False),
        chunk=64,
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()

    # ---- Mesh extraction from the generated planes ----
    verts, tris = extract_mesh(
        decoder, state.params["decoder"], tri, ds.bounds, resolution=24,
        smooth_iters=1,
    )
    assert verts.shape[1] == 3 and tris.shape[1] == 3

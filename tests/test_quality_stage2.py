"""The stage-2 generative-quality campaign CLI end-to-end at tiny dims (CPU).

Exercises every leg of cli/quality_stage2.py — campaign-plane export,
frozen-decoder fine-tune of an extra subject, held-out pack split, diffusion
training, B-batched chain sampling with fidelity, and the scoring/report
stage — against a tiny stage-1 checkpoint trained in-process.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from humanliff_tpu.data.synthetic import SyntheticLayeredDataset
from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.nerf.renderer import RenderConfig
from humanliff_tpu.train import checkpoint as ckpt
from humanliff_tpu.train.optim import make_stage1_optimizer
from humanliff_tpu.train.stage1 import Stage1Config, TrainState, init_params, train_step


def test_quality_stage2_campaign(tmp_path):
    # CH=9 -> 3 channels/plane (the packed tri-plane gather needs C3 % 3 == 0).
    D, CH, IMG = 16, 9, 24
    out = str(tmp_path / "quality")
    expdir = os.path.join(out, "train")

    # ---- Tiny stage-1 "campaign" checkpoint -----------------------------
    cfg = Stage1Config(
        num_instances=2, num_layers=4, triplane_dim=D, triplane_ch=CH,
        render=RenderConfig(n_samples=8, n_importance=8),
        tv_loss_coef=1e-5, l1_loss_coef=1e-5,
    )
    decoder = NeRFDecoder(d_in=CH)
    ds = SyntheticLayeredDataset(num_instances=2, n_rays=64, image_size=IMG,
                                 tight_bounds=True)
    tx = make_stage1_optimizer(plane_lr=5e-2)
    params = init_params(jax.random.key(0), cfg, decoder)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), tx=tx)
    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    for _ in range(10):
        items = [ds.item(int(j), rng) for j in rng.integers(0, len(ds), 2)]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        key, sub = jax.random.split(key)
        state, _ = train_step(state, batch, sub, decoder, cfg)
    ckpt.save_state(expdir, 10, state)

    # ---- The campaign CLI end-to-end ------------------------------------
    from humanliff_tpu.cli import quality_stage2

    quality_stage2.main([
        "--out_dir", out,
        "--num_instance", "2",
        "--image_size", str(IMG),
        "--triplane_dim", str(D),
        "--triplane_ch", str(CH),
        "--n_samples", "8",
        "--n_importance", "8",
        "--ft_subjects", "1",
        "--ft_steps", "4",
        "--ft_n_rand", "64",
        "--num_channels", "16",
        "--num_res_blocks", "1",
        "--attention_resolutions", "8",
        "--diff_steps", "4",
        "--diff_batch_size", "8",
        "--save_interval", "4",
        "--num_samples", "2",
        "--respacing", "4",
        "--decode_size", "24",
        "--n_eval_timesteps", "2",
        "--seed", "0",
    ])

    work = os.path.join(out, "stage2")
    # Artifacts: exported campaign planes + the fine-tuned subject.
    planes = sorted(os.listdir(os.path.join(work, "planes")))
    assert sum(p.startswith("campaign") for p in planes) == 2
    assert sum(p.startswith("subject") for p in planes) == 1

    # Held-out split: 2 campaign + 1 ft subject -> 2 train / 1 held out.
    tr = np.load(os.path.join(work, "planes_train.npy"), mmap_mode="r")
    he = np.load(os.path.join(work, "planes_heldout.npy"), mmap_mode="r")
    assert tr.shape == (2, 4, CH, D, D) and he.shape == (1, 4, CH, D, D)

    with open(os.path.join(work, "stage2_metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["heldout_subject"].startswith("subject")
    # Denoise losses finite for all four layers, both splits.
    for split in ("denoise_loss_heldout", "denoise_loss_train"):
        assert sorted(int(k) for k in metrics[split]) == [0, 1, 2, 3]
        assert all(np.isfinite(v) for v in metrics[split].values())
    # Chain fidelity present for the three consecutive pairs, both spaces.
    assert len(metrics["plane_fidelity"]) == 3
    assert len(metrics["decoded_fidelity"]) == 3
    for m in metrics["decoded_fidelity"].values():
        assert 0.0 <= m["occupancy_persistence"] <= 1.0
        assert np.isfinite(m["unchanged_psnr"])
    assert all(np.isfinite(v) for v in metrics["nearest_gt_psnr"].values())

    report = open(os.path.join(work, "STAGE2.md")).read()
    assert "held-out" in report and "Chain fidelity" in report
    # The decoded per-layer renders are embedded as the report's visual
    # evidence (the triplane_sample_layered.py:152-179 analog).
    assert "Decoded renders" in report and "decoded_l0_person.png" in report
    # --report_only rebuilds STAGE2.md from stage2_metrics.json alone.
    os.remove(os.path.join(work, "STAGE2.md"))
    quality_stage2.main(["--out_dir", out, "--report_only"])
    rebuilt = open(os.path.join(work, "STAGE2.md")).read()
    assert "Chain fidelity" in rebuilt and "Decoded renders" in rebuilt
    # At 4 steps the EMA burn-in guard fires (0.999^4 ~ 1) — the report must
    # still be written, labeled with the raw-weights degradation (VERDICT r4).
    assert "WARNING: scored RAW params" in report
    assert metrics["weights"].startswith("raw")
    # Provenance ties samples to the weights, not just the step (ADVICE r4).
    with open(os.path.join(work, "samples", "samples_meta.json")) as f:
        meta = json.load(f)
    assert meta["diff_step"] == 4 and len(meta["weights_fp"]) == 16

    # Re-running skips every completed leg (resume contract) and reproduces
    # the report — with fidelity.json removed, to exercise the recompute
    # fallback for samples from a partial run without --report_fidelity.
    os.remove(os.path.join(work, "samples", "fidelity.json"))
    os.remove(os.path.join(work, "STAGE2.md"))
    quality_stage2.main([
        "--out_dir", out, "--num_instance", "2",
        "--image_size", str(IMG), "--triplane_dim", str(D),
        "--triplane_ch", str(CH), "--n_samples", "8", "--n_importance", "8",
        "--ft_subjects", "1", "--ft_steps", "4", "--ft_n_rand", "64",
        "--num_channels", "16", "--num_res_blocks", "1",
        "--attention_resolutions", "8", "--diff_steps", "4",
        "--diff_batch_size", "8", "--save_interval", "4",
        "--num_samples", "2", "--respacing", "4",
        "--decode_size", "24", "--n_eval_timesteps", "2", "--seed", "0",
    ])
    assert os.path.exists(os.path.join(work, "STAGE2.md"))
    with open(os.path.join(work, "stage2_metrics.json")) as f:
        assert len(json.load(f)["plane_fidelity"]) == 3
    # Provenance sidecar from the sampling leg (ADVICE r3): samples trace to
    # the diffusion checkpoint that produced them.
    with open(os.path.join(work, "samples", "samples_meta.json")) as f:
        assert json.load(f)["diff_step"] == 4

    # ---- Staleness: raising --diff_steps must retrain AND resample -------
    args8 = [
        "--out_dir", out, "--num_instance", "2",
        "--image_size", str(IMG), "--triplane_dim", str(D),
        "--triplane_ch", str(CH), "--n_samples", "8", "--n_importance", "8",
        "--ft_subjects", "1", "--ft_steps", "4", "--ft_n_rand", "64",
        "--num_channels", "16", "--num_res_blocks", "1",
        "--attention_resolutions", "8", "--diff_steps", "8",
        "--diff_batch_size", "8", "--save_interval", "4",
        "--num_samples", "2", "--respacing", "4",
        "--decode_size", "24", "--n_eval_timesteps", "2", "--seed", "0",
    ]
    from humanliff_tpu.cli import quality_stage2 as qs2

    qs2.main(args8)
    with open(os.path.join(work, "samples", "samples_meta.json")) as f:
        assert json.load(f)["diff_step"] == 8
    with open(os.path.join(work, "stage2_metrics.json")) as f:
        assert json.load(f)["diff_step"] == 8

    # ---- Staleness: an advanced stage-1 checkpoint re-exports + repacks --
    ckpt.save_state(expdir, 12, state)
    mtime_before = os.path.getmtime(os.path.join(work, "planes_train.npy"))
    qs2.main(args8)
    planes = sorted(os.listdir(os.path.join(work, "planes")))
    assert sum(p.startswith("campaign") and "_000012" in p for p in planes) == 2
    assert not any("_000010" in p for p in planes)
    assert os.path.getmtime(os.path.join(work, "planes_train.npy")) > mtime_before

    # ---- Pruned checkpoint: exports NEWER than the latest surviving
    # checkpoint are the best remaining artifact — kept, never deleted
    # (the round-4 recovery scenario: only early checkpoints survive while
    # the exports trace to the pruned final step).
    import shutil

    shutil.rmtree(os.path.join(expdir, "000012"))
    assert ckpt.latest_step(expdir) == 10
    import argparse

    ns = argparse.Namespace(out_dir=out, num_instance=2)
    paths, changed = qs2._export_campaign_planes(
        ns, os.path.join(work, "planes"))
    assert not changed
    assert len(paths) == 2 and all("_000012" in p for p in paths)


def test_failure_report_always_written(tmp_path):
    """Every terminal path leaves a STAGE2.md explaining the run's state: a
    campaign that dies (here: no stage-1 checkpoint at all) must label the
    work dir as failed instead of leaving partial artifacts that read as a
    completed run (the round-4 noise-sample lesson, VERDICT r4 item 5)."""
    from humanliff_tpu.cli import quality_stage2

    out = str(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        quality_stage2.main([
            "--out_dir", out, "--num_instance", "2",
            "--triplane_dim", "16", "--triplane_ch", "9",
        ])
    report = open(os.path.join(out, "stage2", "STAGE2.md")).read()
    assert "STATUS: FAILED" in report
    assert "stage-1 plane export" in report
    # The success sentinel must NOT exist on a failure path.
    assert not os.path.exists(os.path.join(out, "stage2", "stage2_metrics.json"))


def test_recon_refit_recovery(tmp_path):
    """cli/recon_refit rebuilds a full checkpoint from plane-only exports:
    planes stay bit-identical (frozen via 0 plane lr), the decoder trains,
    and the result is stamped with the exports' provenance step."""
    D, CH, IMG = 16, 9, 24
    cfg = Stage1Config(
        num_instances=2, num_layers=4, triplane_dim=D, triplane_ch=CH,
        render=RenderConfig(n_samples=8, n_importance=8),
    )
    decoder = NeRFDecoder(d_in=CH)
    params = init_params(jax.random.key(0), cfg, decoder)
    planes_dir = tmp_path / "planes"
    planes_dir.mkdir()
    exports = []
    for i in range(2):
        path = str(planes_dir / f"campaign{i:04d}_000042.npz")
        ckpt.save_subject_planes(path, np.asarray(params["planes"][i]), 42)
        exports.append(path)

    # A surviving EARLIER checkpoint provides the decoder warm start.
    tx = make_stage1_optimizer()
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), tx=tx)
    warm_dir = str(tmp_path / "warm")
    ckpt.save_state(warm_dir, 5, state)

    from humanliff_tpu.cli import recon_refit

    out = str(tmp_path / "refit")
    recon_refit.main([
        "--plane_files", str(planes_dir / "campaign*.npz"),
        "--data_set_type", "synthetic",
        "--basedir", out, "--expname", "train",
        "--num_instance", "2",
        "--synthetic_image_size", str(IMG),
        "--synthetic_tight_bounds", "true",
        "--n_rand", "64", "--batch_size", "2",
        "--n_samples", "8", "--n_importance", "8",
        "--triplane_dim", str(D), "--triplane_ch", str(CH),
        "--refit_steps", "3", "--refit_lr", "1e-3",
        "--decoder_from", warm_dir,
        "--i_print", "3", "--seed", "0",
    ])

    expdir = os.path.join(out, "train")
    assert ckpt.latest_step(expdir) == 42  # provenance step from filenames
    restored, step = ckpt.restore_state(expdir)
    rparams = ckpt.get_field(restored, "params")
    # Planes bit-identical to the exports; decoder moved (it trained).
    for i, path in enumerate(exports):
        np.testing.assert_array_equal(
            np.asarray(rparams["planes"][i]), ckpt.load_subject_planes(path))
    warm_leaves = jax.tree.leaves(params["decoder"])
    new_leaves = jax.tree.leaves(rparams["decoder"])
    assert any(
        not np.allclose(a, np.asarray(b)) for a, b in zip(warm_leaves, new_leaves)
    )
    assert os.path.exists(os.path.join(expdir, "000042_REFIT.txt"))

    # Zero-step REASSEMBLY: the (plane exports, decoder sidecar) pair — both
    # small enough to commit — reconstructs a full checkpoint with no
    # training at all.
    sidecar = os.path.join(expdir, "decoder_000042.npz")
    assert os.path.exists(sidecar)
    out2 = str(tmp_path / "reassembled")
    recon_refit.main([
        "--plane_files", str(planes_dir / "campaign*.npz"),
        "--data_set_type", "synthetic",
        "--basedir", out2, "--expname", "train",
        "--num_instance", "2",
        "--synthetic_image_size", str(IMG),
        "--synthetic_tight_bounds", "true",
        "--n_rand", "64", "--batch_size", "2",
        "--n_samples", "8", "--n_importance", "8",
        "--triplane_dim", str(D), "--triplane_ch", str(CH),
        "--refit_steps", "0",
        "--decoder_from", sidecar,
        "--seed", "0",
    ])
    re_restored, _ = ckpt.restore_state(os.path.join(out2, "train"))
    re_params = ckpt.get_field(re_restored, "params")
    for a, b in zip(jax.tree.leaves(rparams["decoder"]),
                    jax.tree.leaves(re_params["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(re_params["planes"]), np.asarray(rparams["planes"]))

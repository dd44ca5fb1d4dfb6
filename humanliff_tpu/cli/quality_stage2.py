"""Stage-2 generative-quality campaign on the pinned synthetic benchmark.

The stage-1 campaign (cli/quality_eval.py) proves reconstruction quality; this
campaign proves the GENERATIVE half of the pipeline on real trained weights —
the full reference flow end-to-end (README.md:104-167):

1. EXPORT — the stage-1 campaign checkpoint's fitted tri-planes become
   per-subject artifacts (the run_nerf_batch.py:321-330 -> triplane_datasets.py
   file contract).
2. FINE-TUNE — ``--ft_subjects`` EXTRA synthetic subjects are fitted against
   the frozen campaign decoder (run_nerf_batch_ft.py flow, batched
   concurrently; train/stage1_ft.py), growing the diffusion training set the
   same way the reference grows it across its 100 subjects.
3. PACK + TRAIN — all subjects but one pack into the memmap dataset; the
   flagship ControlNet UNet trains on the (x, x_cond, y) layer triples
   (scripts/image_train.py flow). The LAST subject is held out entirely.
4. SAMPLE — the 4-layer chain generates at the B=8 batch sweet spot with
   chain plane-fidelity reported (triplane_sample_layered.py:124-151 contract).
5. SCORE — metrics no single piece gives:
   - held-out vs train-set denoise loss per layer (eval/fidelity.py
     ``heldout_denoise_loss``: deterministic stratified t-grid, the offline
     analog of an eval loss),
   - nearest-GT plane PSNR per layer (coverage/memorization indicator),
   - image-space chain consistency: consecutive generated layers rendered
     through the frozen stage-1 decoder (``decoded_fidelity``: changed-pixel
     fraction, unchanged-region PSNR, occupancy persistence).
6. REPORT — ``STAGE2.md`` + ``stage2_metrics.json``, regenerable by one
   command (scripts/quality_stage2.sh).

Every step skips itself when its artifact already exists, so the campaign is
resumable after interruption (the axon tunnel's executor can wedge; see
scripts/supervise_quality.sh).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("humanliff quality-stage2")
    p.add_argument("--out_dir", type=str, default="runs/quality",
                   help="stage-1 campaign dir (quality_eval.py --out_dir)")
    p.add_argument("--work_dir", type=str, default=None,
                   help="default: {out_dir}/stage2")
    # Stage-1 campaign geometry (must match quality_eval.py's pinned values).
    p.add_argument("--num_instance", type=int, default=2)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--triplane_dim", type=int, default=256)
    p.add_argument("--triplane_ch", type=int, default=27)
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--n_importance", type=int, default=128)
    # Fine-tune leg.
    p.add_argument("--ft_subjects", type=int, default=3,
                   help="extra synthetic subjects fitted with the frozen "
                        "decoder (0 skips the leg)")
    p.add_argument("--ft_steps", type=int, default=1500)
    p.add_argument("--ft_batch_size", type=int, default=1)
    p.add_argument("--ft_n_rand", type=int, default=2048)
    # Diffusion leg (flagship UNet geometry by default; overridable so the
    # campaign is exercisable at tiny dims on the CPU mesh).
    p.add_argument("--num_channels", type=int, default=192)
    p.add_argument("--num_res_blocks", type=int, default=3)
    p.add_argument("--attention_resolutions", type=str, default="32,16,8")
    p.add_argument("--diff_steps", type=int, default=6000)
    p.add_argument("--diff_batch_size", type=int, default=2)
    p.add_argument("--diff_lr", type=float, default=1e-4)
    p.add_argument("--save_interval", type=int, default=2000)
    p.add_argument("--light_final_save", type=str, default="false",
                   choices=("true", "false"),
                   help="forwarders to diff_train: the final diffusion "
                        "checkpoint keeps only params+EMA (halves the ~22 min "
                        "flagship save readback on the tunnel; sampling and "
                        "scoring only need EMA)")
    p.add_argument("--final_save", type=str, default=None,
                   choices=("full", "light", "none"),
                   help="final diffusion checkpoint policy: 'none' skips the "
                        "save entirely and samples/scores the in-memory final "
                        "state (the flagship save costs ~11-22 min of tunnel "
                        "readback; the campaign artifacts are the samples + "
                        "report). Default derives from --light_final_save.")
    # 0.999 (half-life ~700 steps), NOT the reference's 0.9999: EMA starts at
    # the random init, and at the campaign's ~5-6k steps a 0.9999 EMA still
    # carries 0.9999^6000 ~ 55% of that init — sampling it produces pure noise
    # (round-4 campaign post-mortem). 0.999 leaves 0.25% init at 6k steps.
    p.add_argument("--ema_rate", type=str, default="0.999")
    p.add_argument("--mid_save", type=str, default="full",
                   choices=("full", "light"),
                   help="periodic diffusion-save payload (forwarded to "
                        "diff_train): 'light' halves the per-save tunnel "
                        "readback; resume restarts Adam fresh. Long tunneled "
                        "campaigns pair this with --final_save none")
    # Sampling / scoring leg. Batch sizes come from generate_workload's
    # internal measured-cost DP plan (B=8 sweet spot + B=1 remainder,
    # docs/BATCH_PATHOLOGY.md) — there is no user batch knob.
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--respacing", type=str, default="250")
    p.add_argument("--decode_size", type=int, default=256)
    p.add_argument("--fidelity_threshold", type=float, default=0.1)
    p.add_argument("--n_eval_timesteps", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--report_only", action="store_true",
                   help="rebuild STAGE2.md from an existing "
                        "stage2_metrics.json (no training/sampling/scoring; "
                        "lets report-format improvements regenerate the "
                        "artifact offline)")
    return p


def _export_campaign_planes(args, planes_dir: str):
    """Stage-1 checkpoint -> per-subject plane npz.

    Skips when the existing exports were produced by the CURRENT latest
    stage-1 checkpoint (the producing step is embedded in the filename).
    Exports from an OLDER checkpoint than the latest are stale: removed and
    re-exported so every downstream artifact traces to one checkpoint step.
    Exports NEWER than the latest checkpoint mean the producing checkpoint was
    pruned (only older saves survive) — they are the best surviving artifact
    and are KEPT; cli/recon_refit can rebuild a consistent full checkpoint
    from them.
    """
    import re as _re

    from humanliff_tpu.train import checkpoint as ckpt

    paths = sorted(glob.glob(os.path.join(planes_dir, "campaign*.npz")))
    latest = ckpt.latest_step(os.path.join(args.out_dir, "train"))
    export_steps = sorted({
        int(m.group(1)) for p in paths
        if (m := _re.search(r"_(\d{6})\.npz$", os.path.basename(p)))
    })
    if paths and len(export_steps) == 1 and len(paths) == args.num_instance:
        step = export_steps[0]
        if latest is None or step >= latest:
            if latest is None or step > latest:
                print(f"[stage2] WARNING: exports at step {step} outlive the "
                      f"latest stage-1 checkpoint ({latest}) — keeping them "
                      "(the producing checkpoint was pruned; recover a "
                      "consistent decoder with cli/recon_refit)")
            return paths, False
    for stale in paths:
        print(f"[stage2] removing stale export {os.path.basename(stale)} "
              f"(stage-1 checkpoint is now {latest})")
        os.remove(stale)
    restored, step = ckpt.restore_state(os.path.join(args.out_dir, "train"))
    if restored is None:
        raise FileNotFoundError(
            f"no stage-1 campaign checkpoint under {args.out_dir}/train — "
            "run scripts/quality_eval.sh first"
        )
    params = ckpt.get_field(restored, "params")
    planes = np.asarray(params["planes"], np.float32)  # (N, L, 3, C3, D, D)
    print(f"[stage2] exporting {planes.shape[0]} campaign subjects "
          f"(checkpoint step {step})")
    paths = []
    for i in range(planes.shape[0]):
        path = os.path.join(planes_dir, f"campaign{i:04d}_{step:06d}.npz")
        ckpt.save_subject_planes(path, planes[i], step)
        paths.append(path)
    return paths, True


def _loss_curve_section(diff_dir: str, max_rows: int = 12) -> list:
    """Training-loss curve from the diffusion leg's progress.csv, downsampled
    to ~max_rows rows (VERDICT r4 item 3: the report must show the curve, not
    just the final step)."""
    path = os.path.join(diff_dir, "progress.csv")
    if not os.path.exists(path):
        return []
    try:
        rows = np.genfromtxt(path, delimiter=",", names=True)
        steps = np.atleast_1d(rows["step"])
        loss = np.atleast_1d(rows["loss"])
    except Exception:
        return []
    if steps.size == 0:
        return []
    stride = max(1, steps.size // max_rows)
    picks = list(range(0, steps.size, stride))
    if picks[-1] != steps.size - 1:
        picks.append(steps.size - 1)
    out = ["## Training-loss curve (per-100-step means from progress.csv)",
           "", "| step | loss |", "|---|---|"]
    for i in picks:
        out.append(f"| {int(steps[i])} | {loss[i]:.4f} |")
    out.append("")
    return out


def _weights_fingerprint(params) -> str:
    """Cheap per-run identity of the weights that produced the samples.

    The provenance sidecar must tie samples to the WEIGHTS scored, not just a
    step number: with --final_save none nothing persists, so a rerun retrains
    from scratch to the same step and a step-only check would reuse the old
    run's samples against the new run's weights (ADVICE r4). Hashing the few
    smallest leaves is enough — every Adam step moves every trained leaf — and
    reads back only a few KB through the tunnel.
    """
    import hashlib

    import jax

    leaves = sorted(jax.tree_util.tree_leaves(params),
                    key=lambda l: getattr(l, "size", 0))[:4]
    h = hashlib.sha1()
    for leaf in leaves:
        h.update(np.asarray(jax.device_get(leaf), np.float32).tobytes())
    return h.hexdigest()[:16]


def _write_failure_report(work: str, stage: str, exc: BaseException) -> None:
    """Degraded STAGE2.md for any terminal path that is not a full success.

    Whatever partial artifacts exist under ``work`` (samples npz, fidelity
    json) must never again read as a completed run (the round-4 noise samples
    sat unlabeled in runs/ for a round); the report is the in-tree label.
    """
    lines = [
        "# STAGE2 — generative-quality campaign (synthetic benchmark)",
        "",
        "## STATUS: FAILED / INCOMPLETE",
        "",
        f"The campaign terminated during the **{stage}** leg before scoring "
        "completed:",
        "",
        "```",
        f"{type(exc).__name__}: {exc}",
        "```",
        "",
        "Any samples/fidelity artifacts under this directory are PARTIAL "
        "output of an incomplete run — do not read them as campaign results. "
        "Re-run `bash scripts/quality_stage2.sh` (every leg resumes from its "
        "surviving artifacts); a successful run replaces this report.",
        "",
    ]
    try:
        os.makedirs(work, exist_ok=True)
        with open(os.path.join(work, "STAGE2.md"), "w") as f:
            f.write("\n".join(lines))
        print(f"[stage2] wrote FAILURE report {work}/STAGE2.md ({stage}: {exc})")
    except OSError as io_err:  # never mask the original failure
        print(f"[stage2] could not write failure report: {io_err}")


def main(argv=None):
    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)
    work = args.work_dir or os.path.join(args.out_dir, "stage2")
    if args.report_only:
        with open(os.path.join(work, "stage2_metrics.json")) as f:
            _write_success_report(work, json.load(f))
        return
    status = {"stage": "setup"}
    try:
        _run(args, work, status)
    except BaseException as exc:
        _write_failure_report(work, status["stage"], exc)
        raise


def _run(args, work: str, status: dict):
    planes_dir = os.path.join(work, "planes")
    os.makedirs(planes_dir, exist_ok=True)

    # ---- 1. Export the campaign subjects --------------------------------
    status["stage"] = "stage-1 plane export"
    campaign_paths, exports_changed = _export_campaign_planes(args, planes_dir)

    # ---- 2. Fine-tune extra subjects against the frozen decoder ---------
    status["stage"] = "frozen-decoder fine-tune"
    ft_paths = sorted(
        p for p in glob.glob(os.path.join(planes_dir, "subject*.npz"))
    )
    if args.ft_subjects > 0 and len(ft_paths) < args.ft_subjects:
        from humanliff_tpu.cli import recon_ft

        total = args.num_instance + args.ft_subjects
        recon_ft.main([
            "--data_set_type", "synthetic",
            "--basedir", args.out_dir,
            "--expname", "train",
            "--num_instance", str(total),
            "--start_idx", str(args.num_instance),
            "--end_idx", str(total),
            "--subjects_per_batch", str(args.ft_subjects),
            "--ft_steps", str(args.ft_steps),
            "--batch_size", str(args.ft_batch_size),
            "--n_rand", str(args.ft_n_rand),
            "--n_samples", str(args.n_samples),
            "--n_importance", str(args.n_importance),
            "--triplane_dim", str(args.triplane_dim),
            "--triplane_ch", str(args.triplane_ch),
            "--synthetic_image_size", str(args.image_size),
            "--synthetic_tight_bounds", "true",
            "--out_dir", planes_dir,
            "--seed", str(args.seed),
        ])
        ft_paths = sorted(glob.glob(os.path.join(planes_dir, "subject*.npz")))

    all_paths = campaign_paths + ft_paths
    if len(all_paths) < 2:
        raise RuntimeError("need >=2 subjects (1 train + 1 held out)")
    train_paths, heldout_path = all_paths[:-1], all_paths[-1]
    print(f"[stage2] {len(train_paths)} train subjects, "
          f"held out: {os.path.basename(heldout_path)}")

    # ---- 3. Pack + train the diffusion model ----------------------------
    status["stage"] = "diffusion training"
    from humanliff_tpu.data.triplane_data import TriplaneDataset, pack_subject_planes

    packed_train = os.path.join(work, "planes_train.npy")
    packed_held = os.path.join(work, "planes_heldout.npy")
    if exports_changed:
        # Fresh exports must flow into the training data — a stale pack would
        # silently train on the previous checkpoint's planes.
        for p in (packed_train, packed_held):
            if os.path.exists(p):
                print(f"[stage2] repacking {os.path.basename(p)} "
                      "(campaign exports were regenerated)")
                os.remove(p)
    if not os.path.exists(packed_train):
        pack_subject_planes(train_paths, packed_train)
    if not os.path.exists(packed_held):
        pack_subject_planes([heldout_path], packed_held)

    diff_dir = os.path.join(work, "train")
    from humanliff_tpu.cli import diff_train
    from humanliff_tpu.train import checkpoint as ckpt

    have_step = ckpt.latest_step(diff_dir) or 0
    if exports_changed and have_step > 0:
        print(f"[stage2] WARNING: the diffusion checkpoint (step {have_step}) "
              f"was trained on OLDER stage-1 exports; delete {diff_dir} to "
              "retrain against the regenerated planes")
    final_save = args.final_save or (
        "light" if args.light_final_save == "true" else "full")
    state_mem = None
    if have_step < args.diff_steps:
        state_mem = diff_train.main([
            "--data_dir", packed_train,
            "--logdir", diff_dir,
            "--batch_size", str(args.diff_batch_size),
            "--lr", str(args.diff_lr),
            "--ema_rate", args.ema_rate,
            "--total_steps", str(args.diff_steps),
            "--save_interval", str(args.save_interval),
            "--log_interval", "100",
            "--image_size", str(args.triplane_dim),
            "--in_channels", str(args.triplane_ch),
            "--out_channels", str(args.triplane_ch),
            "--num_channels", str(args.num_channels),
            "--num_res_blocks", str(args.num_res_blocks),
            "--attention_resolutions", args.attention_resolutions,
            # Remat is REQUIRED for the flagship at batch 2 on one v5e:
            # without it the fwd+bwd activations push the 497M-param
            # params+Adam+EMA footprint past HBM (RESOURCE_EXHAUSTED at the
            # first step readback). The round-3 444 ms/step measurement was
            # bf16 + remat + donation (CLAUDE.md).
            "--use_checkpoint", "true",
            "--mid_save", args.mid_save,
            "--light_final_save",
            "true" if final_save == "light" else "false",
            "--skip_final_save",
            "true" if final_save == "none" else "false",
            "--seed", str(args.seed),
        ])

    # ---- 4. Resolve the scoring/sampling weights ------------------------
    # In-memory final state when the training leg just ran (no checkpoint
    # round-trip: the flagship save+reload costs ~11-22 min EACH WAY on the
    # tunneled chip); checkpoint restore otherwise (resumed invocation).
    status["stage"] = "weight resolution"
    import jax

    from humanliff_tpu.eval.fidelity import (
        decoded_fidelity,
        heldout_denoise_loss,
    )
    from humanliff_tpu.models.factory import (
        create_model_and_diffusion,
        model_and_diffusion_defaults,
    )
    from humanliff_tpu.sampling.layered import LAYER_NAMES, generate_workload

    md = model_and_diffusion_defaults()
    md.update(image_size=args.triplane_dim, in_channels=args.triplane_ch,
              out_channels=args.triplane_ch, num_channels=args.num_channels,
              num_res_blocks=args.num_res_blocks,
              attention_resolutions=args.attention_resolutions)
    model, diffusion = create_model_and_diffusion(**md)
    object.__setattr__(diffusion, "channel_axis", -1)

    rate_str = args.ema_rate.split(",")[0]
    if state_mem is not None:
        dstep = int(jax.device_get(state_mem.step))
        raw_params = state_mem.params
        ema, rate_str = ckpt.get_ema(
            {"ema_params": state_mem.ema_params}, rate_str)
        print(f"[stage2] scoring in-memory weights at step {dstep}")
    else:
        restored, dstep = ckpt.restore_state(diff_dir)
        if restored is None:
            raise FileNotFoundError(
                f"no diffusion checkpoint under {diff_dir} and the training "
                "leg did not run — delete stale samples or lower --diff_steps")
        raw_params = ckpt.get_field(restored, "params")
        ema, rate_str = ckpt.get_ema(restored, rate_str)
        print(f"[stage2] scoring checkpoint weights at step {dstep}")
    # EMA burn-in guard: EMA initializes AT the random init, so after few
    # steps it still mostly IS the random init — rate^step of it. Sampling
    # such weights produces saturated noise (round-4 campaign post-mortem).
    init_w = float(rate_str) ** max(int(dstep), 0)
    if init_w > 0.1:
        print(f"[stage2] WARNING: EMA({rate_str}) at step {dstep} still "
              f"carries {init_w:.1%} of the random init — sampling/scoring "
              "RAW params instead (use a faster --ema_rate for short runs)")
        score_params, weights_used = raw_params, "raw (EMA burn-in incomplete)"
    else:
        score_params, weights_used = ema, f"ema({rate_str})"
    # Free what we will not score BEFORE sampling: the in-memory flagship
    # TrainState is ~8 GB (params + Adam moments + EMA) and the B=8 sampling
    # chain + decode need that HBM headroom (the round-4 lesson: memory-scale
    # bugs are invisible to tiny-dims CPU tests). Dropping the Python
    # references releases the device buffers; only score_params stays.
    if score_params is ema:
        raw_params = None
    ema = None
    state_mem = None
    restored = None

    # ---- 4b. Sample the layered chain (mixed-batch plan) ----------------
    status["stage"] = "chain sampling"
    samples_dir = os.path.join(work, "samples")
    os.makedirs(samples_dir, exist_ok=True)
    sample_files = {
        name: os.path.join(samples_dir, f"samples_{name}.npz")
        for name in LAYER_NAMES
    }
    # Samples are valid only if produced by the CURRENT weights — checked by
    # step AND a weight fingerprint: with --final_save none nothing persists,
    # so a rerun retrains from scratch to the SAME step with different
    # weights, and a step-only check would score them against the previous
    # run's samples (ADVICE r4). Both ride in a sidecar meta file.
    weights_fp = _weights_fingerprint(score_params)
    meta_path = os.path.join(samples_dir, "samples_meta.json")
    produced_by, produced_fp = -1, ""
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        produced_by = meta.get("diff_step", -1)
        produced_fp = meta.get("weights_fp", "")
    have_all = all(os.path.exists(p) for p in sample_files.values())
    if have_all and (produced_by != dstep or produced_fp != weights_fp):
        print(f"[stage2] resampling: existing samples from diff step "
              f"{produced_by} (fp {produced_fp or 'unknown'}), weights are "
              f"now at {dstep} (fp {weights_fp})")
        for p in list(sample_files.values()) + [
                os.path.join(samples_dir, "fidelity.json")]:
            if os.path.exists(p):
                os.remove(p)
        have_all = False
    if not have_all:
        from humanliff_tpu.eval.fidelity import chain_fidelity_report

        md_s = dict(md)
        md_s["timestep_respacing"] = args.respacing
        _, diffusion_s = create_model_and_diffusion(**md_s)
        object.__setattr__(diffusion_s, "channel_axis", -1)
        out = generate_workload(
            model, score_params, diffusion_s, jax.random.key(args.seed + 3),
            args.num_samples, image_size=args.triplane_dim,
            channels=args.triplane_ch,
        )
        samples = {n: np.asarray(a, np.float32) for n, a in out.items()}
        for name, arr in samples.items():
            ckpt.save_samples_npz(sample_files[name], arr)
            print("[stage2] wrote", sample_files[name])
        with open(os.path.join(samples_dir, "fidelity.json"), "w") as f:
            json.dump(
                chain_fidelity_report(samples, args.fidelity_threshold), f,
                indent=2)
        with open(meta_path, "w") as f:
            json.dump({"diff_step": int(dstep), "weights_fp": weights_fp}, f)
    else:
        samples = {
            name: ckpt.load_samples_npz(path).astype(np.float32)
            for name, path in sample_files.items()
        }

    # ---- 5. Score --------------------------------------------------------
    status["stage"] = "scoring"
    key = jax.random.key(args.seed + 7)

    def plane_items(packed):
        ds = TriplaneDataset(packed)
        return [ds.item(i) for i in range(len(ds))]

    held_items = plane_items(packed_held)
    train_items = plane_items(packed_train)[: 4]  # first train subject
    loss_held = heldout_denoise_loss(
        model, score_params, diffusion, held_items, key, args.n_eval_timesteps)
    loss_train = heldout_denoise_loss(
        model, score_params, diffusion, train_items, key, args.n_eval_timesteps)
    print(f"[stage2] denoise loss held-out {loss_held} / train {loss_train}")

    # Nearest-GT plane PSNR per layer (NHWC [-1,1] space).
    gt = np.load(packed_train, mmap_mode="r")  # (N, L, C, D, D)
    nearest = {}
    for li, name in enumerate(LAYER_NAMES):
        arr = np.asarray(samples[name], np.float32)  # (B, D, D, C)
        best = []
        for b in range(arr.shape[0]):
            x = arr[b].transpose(2, 0, 1)  # (C, D, D)
            mses = [
                float(((x - np.asarray(gt[s, li], np.float32)) ** 2).mean())
                for s in range(gt.shape[0])
            ]
            best.append(-10.0 * np.log10(max(min(mses), 1e-12)))
        nearest[name] = float(np.mean(best))

    # Image-space chain consistency through the frozen stage-1 decoder.
    from humanliff_tpu.data.raygen import full_image_rays
    from humanliff_tpu.data.synthetic import SyntheticLayeredDataset
    from humanliff_tpu.data.view_datasets import NovelViewCameras
    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.nerf.renderer import RenderConfig, render_image_masked
    from humanliff_tpu.sampling.layered import planes_image_to_triplane
    from humanliff_tpu.train.checkpoint import restore_state as _rs

    # The decoder must match the checkpoint that PRODUCED the plane exports.
    # When that checkpoint was pruned (only older full saves survive), the
    # compact decoder_{step}.npz sidecar that rides every stage-1 save is the
    # consistent artifact — prefer it over the latest surviving full state.
    import re as _re3

    _m = _re3.search(r"_(\d{6})\.npz$", os.path.basename(campaign_paths[0]))
    dec_params = None
    if _m:
        side = os.path.join(
            args.out_dir, "train", f"decoder_{int(_m.group(1)):06d}.npz")
        if os.path.exists(side):
            dec_params = ckpt.load_decoder_npz(side)
            print(f"[stage2] decoder from sidecar {side}")
    if dec_params is None:
        s1, _ = _rs(os.path.join(args.out_dir, "train"))
        dec_params = ckpt.get_field(s1, "params")["decoder"]
    decoder = NeRFDecoder(d_in=args.triplane_ch)

    # One shared box: union of the campaign/ft subjects' tight AABBs (the
    # generated planes only exist in normalized plane space; any common box
    # gives a consistent scene for a layer-pair comparison).
    dsu = SyntheticLayeredDataset(
        num_instances=args.num_instance + args.ft_subjects,
        image_size=args.decode_size, tight_bounds=True)
    boxes = np.stack([
        dsu.instance_bounds(i)
        for i in range(args.num_instance + args.ft_subjects)
    ])
    box = np.stack([boxes[:, 0].min(0), boxes[:, 1].max(0)])

    import jax.numpy as jnp

    S = args.decode_size
    cams = NovelViewCameras(image_size=S)
    K, R, T = cams.camera(0)
    ro, rd, near, far, mask = full_image_rays(S, S, K, R, T, box)
    cfg = RenderConfig(n_samples=args.n_samples, n_importance=args.n_importance,
                       perturb=False, density_noise=False)

    def render_layer(x_img):
        planes = planes_image_to_triplane(jnp.asarray(x_img, jnp.float32))
        out = render_image_masked(
            decoder, dec_params, planes, ro, rd, near, far, mask,
            jnp.asarray(box, jnp.float32), cfg, outputs=("rgb", "acc"),
        )
        return (np.asarray(out["rgb"], np.float32),
                np.asarray(out["acc"], np.float32))

    decoded = {}
    rend = {name: render_layer(samples[name][0]) for name in LAYER_NAMES}
    # Visual evidence: one decoded render per GENERATED layer (the analog of
    # triplane_sample_layered.py:152-179's saved decode images).
    import imageio.v2 as imageio

    def _to_u8(a):
        return (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)

    for li, name in enumerate(LAYER_NAMES):
        rgb, acc = rend[name]  # flat (S*S, 3) / (S*S,) maps (render_image_masked)
        imageio.imwrite(
            os.path.join(samples_dir, f"decoded_l{li}_{name}.png"),
            _to_u8(np.asarray(rgb).reshape(S, S, 3)))
        imageio.imwrite(
            os.path.join(samples_dir, f"decoded_l{li}_{name}_acc.png"),
            _to_u8(np.asarray(acc).reshape(S, S)))
    for prev, cur in zip(LAYER_NAMES[:-1], LAYER_NAMES[1:]):
        rgb0, acc0 = rend[prev]
        rgb1, acc1 = rend[cur]
        decoded[f"{prev}->{cur}"] = decoded_fidelity(rgb1, acc1, rgb0, acc0)
        print(f"[stage2] decoded {prev}->{cur}: {decoded[f'{prev}->{cur}']}")

    fid_path = os.path.join(samples_dir, "fidelity.json")
    if os.path.exists(fid_path):
        with open(fid_path) as f:
            plane_fid = json.load(f)
    else:  # samples from a partial earlier run without --report_fidelity
        from humanliff_tpu.eval.fidelity import chain_fidelity_report

        plane_fid = chain_fidelity_report(samples, args.fidelity_threshold)

    # ---- 6. Report -------------------------------------------------------
    status["stage"] = "report"
    metrics = {
        "diff_step": int(dstep),
        "weights": weights_used,
        "weights_fp": weights_fp,
        "ema_rate": rate_str,
        "diff_steps": int(args.diff_steps),
        "num_samples": int(args.num_samples),
        "respacing": args.respacing,
        "n_eval_timesteps": int(args.n_eval_timesteps),
        "n_campaign_subjects": len(campaign_paths),
        "n_ft_subjects": len(ft_paths),
        "train_subjects": [os.path.basename(p) for p in train_paths],
        "heldout_subject": os.path.basename(heldout_path),
        "denoise_loss_heldout": loss_held,
        "denoise_loss_train": loss_train,
        "nearest_gt_psnr": nearest,
        "plane_fidelity": plane_fid,
        "decoded_fidelity": decoded,
        "decode_box": box.tolist(),
    }
    _write_success_report(work, metrics)
    # metrics.json written LAST: the one artifact that only exists after a
    # fully-successful run (the supervisor's DONE_FILE; STAGE2.md also exists
    # on failure paths, where it carries the failure label instead).
    with open(os.path.join(work, "stage2_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"[stage2] wrote {work}/stage2_metrics.json")


def _write_success_report(work: str, metrics: dict) -> None:
    """STAGE2.md from the metrics dict (regenerable offline: --report_only
    rebuilds the report from stage2_metrics.json + the samples/train dirs
    without touching weights or the TPU)."""
    from humanliff_tpu.sampling.layered import LAYER_NAMES

    dstep = metrics["diff_step"]
    weights_used = metrics["weights"]
    rate_str = metrics["ema_rate"]
    loss_held = metrics["denoise_loss_heldout"]
    loss_train = metrics["denoise_loss_train"]
    plane_fid = metrics["plane_fidelity"]
    decoded = metrics["decoded_fidelity"]
    nearest = metrics["nearest_gt_psnr"]
    n_train = len(metrics["train_subjects"])
    # Context keys absent from metrics.json files written before --report_only
    # existed get best-effort defaults (dstep IS the trained step count when
    # training ran to completion in one campaign).
    metrics = dict(metrics)
    metrics.setdefault("diff_steps", dstep)
    metrics.setdefault("num_samples", "n")
    metrics.setdefault("respacing", "250")
    metrics.setdefault("n_eval_timesteps", 16)
    metrics.setdefault("n_campaign_subjects", "?")
    metrics.setdefault("n_ft_subjects", "?")
    lines = [
        "# STAGE2 — generative-quality campaign (synthetic benchmark)",
        "",
        f"Diffusion weights: step {dstep}, {weights_used} (fingerprint "
        f"{metrics.get('weights_fp', 'n/a')}); campaign command: "
        "`bash scripts/quality_stage2.sh`",
        "",
        f"Training scale: {metrics['diff_steps']} diffusion steps on one v5e "
        "chip. The reference trains its SynBody model 200k-300k steps on 8 "
        "GPUs (README.md:149); this campaign demonstrates that the pipeline "
        "learns the layered distribution and the chain conditions — it is "
        "evidence of a working generative stack at campaign scale, not "
        "reference-matching sample quality.",
        "",
        f"Pipeline: stage-1 campaign planes "
        f"({metrics['n_campaign_subjects']} subjects) "
        f"+ {metrics['n_ft_subjects']} frozen-decoder fine-tuned subjects "
        f"(run_nerf_batch_ft.py flow) -> flagship ControlNet UNet trained "
        f"{metrics['diff_steps']} steps on {n_train} subjects x 4 layers "
        f"(subject `{metrics['heldout_subject']}` fully held out) -> "
        f"{metrics['num_samples']}-sample 4-layer chain (mixed-batch plan, "
        f"{weights_used} weights), {metrics['respacing']} respaced steps.",
        "",
        "## Held-out vs train denoise loss (stratified t-grid, "
        f"{metrics['n_eval_timesteps']} timesteps)",
        "",
        "| layer | held-out loss | train loss |",
        "|---|---|---|",
    ]
    for li in sorted(loss_held):
        lines.append(f"| {li} | {loss_held[li]:.5f} | "
                     f"{loss_train.get(li, float('nan')):.5f} |")
    lines += [
        "",
        "## Chain fidelity (generated layer k vs its x_cond layer k-1)",
        "",
        "| pair | change fraction | outside-change PSNR (planes) | "
        "changed px fraction | unchanged PSNR (decoded) | occupancy "
        "persistence |",
        "|---|---|---|---|---|---|",
    ]
    for pair in plane_fid:
        pf = plane_fid[pair]
        df = decoded.get(pair, {})
        lines.append(
            f"| {pair} | {pf['change_fraction']:.3f} | "
            f"{pf['outside_psnr']:.2f} | "
            f"{df.get('changed_pixel_fraction', float('nan')):.3f} | "
            f"{df.get('unchanged_psnr', float('nan')):.2f} | "
            f"{df.get('occupancy_persistence', float('nan')):.3f} |"
        )
    lines += [
        "",
        "## Nearest-GT plane PSNR (coverage / sample realism)",
        "",
        "| layer | PSNR vs nearest train subject (dB) |",
        "|---|---|",
    ]
    for name in LAYER_NAMES:
        lines.append(f"| {name} | {nearest[name]:.2f} |")
    lines.append("")
    # Visual evidence inline: the decoded render (+ opacity) of sample 0 of
    # each GENERATED layer, straight from the frozen stage-1 decoder — the
    # analog of the reference's saved decode images
    # (triplane_sample_layered.py:152-179).
    pngs = [
        (name, f"samples/decoded_l{li}_{name}.png")
        for li, name in enumerate(LAYER_NAMES)
        if os.path.exists(os.path.join(work, "samples",
                                       f"decoded_l{li}_{name}.png"))
    ]
    if pngs:
        lines += ["## Decoded renders (sample 0, frozen stage-1 decoder)", ""]
        lines.append("| " + " | ".join(n for n, _ in pngs) + " |")
        lines.append("|" + "---|" * len(pngs))
        lines.append(
            "| " + " | ".join(f"![{n}]({p})" for n, p in pngs) + " |")
        lines.append("")
    lines += _loss_curve_section(os.path.join(work, "train"))
    if weights_used.startswith("raw"):
        lines += [
            "## WARNING: scored RAW params (EMA burn-in incomplete)",
            "",
            f"EMA({rate_str}) at step {dstep} still carried >10% of the "
            "random init, so the campaign scored the raw training weights "
            "instead. Train longer (or use a faster --ema_rate) for "
            "EMA-weight results.",
            "",
        ]
    with open(os.path.join(work, "STAGE2.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"[stage2] wrote {work}/STAGE2.md")


if __name__ == "__main__":
    main(sys.argv[1:])

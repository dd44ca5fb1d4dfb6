"""--light_final_save: params+EMA-only final checkpoint + fresh-Adam resume.

The flagship stage-2 state is ~8 GB fp32; on the tunneled chip a full save
reads all of it back at ~6 MB/s (~22 min). Sampling/scoring consume only the
EMA weights (reference samples from ema_0.9999_*.pt, train_util.py:312-335),
so the light final checkpoint keeps {step, params, ema_params} and resuming
from one restarts the optimizer state fresh.
"""

import os

import pytest

from humanliff_tpu.train import checkpoint as ckpt


def _args(logdir, total_steps):
    return [
        "--data_dir", "synthetic",
        "--logdir", logdir,
        "--batch_size", "2",
        "--image_size", "16",
        "--in_channels", "9",
        "--out_channels", "9",
        "--num_channels", "8",
        "--num_res_blocks", "1",
        "--attention_resolutions", "8",
        "--lr", "1e-4",
        "--save_interval", "1000",
        "--log_interval", "2",
        "--light_final_save", "true",
        "--seed", "0",
        "--total_steps", str(total_steps),
    ]


def test_light_final_save_and_fresh_adam_resume(tmp_path, capsys):
    from humanliff_tpu.cli import diff_train

    logdir = str(tmp_path / "d")
    diff_train.main(_args(logdir, 3))
    assert ckpt.latest_step(logdir) == 3

    # The light checkpoint restores as a raw dict holding exactly what
    # sampling/scoring need — and no Adam moments.
    raw, step = ckpt.restore_state(logdir)
    assert step == 3
    assert set(raw.keys()) == {"step", "params", "ema_params"}
    assert int(raw["step"]) == 3
    # EMA keyed by rate string: the diff_sample / quality_stage2 access path.
    ema = ckpt.get_field(raw, "ema_params")
    assert "0.9999" in ema

    # Raising total_steps resumes params+EMA through the fallback path
    # (fresh optimizer state, warned) and completes.
    diff_train.main(_args(logdir, 5))
    assert ckpt.latest_step(logdir) == 5
    assert "LIGHT checkpoint" in capsys.readouterr().out

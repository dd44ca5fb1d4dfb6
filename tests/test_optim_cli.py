"""LR-schedule parity with the reference formulas + CLI wiring smoke tests."""

import numpy as np
import pytest

from humanliff_tpu.train.optim import (
    make_finetune_optimizer,
    stage1_decoder_schedule,
    stage1_plane_schedule,
    stage2_lr_schedule,
)


def test_stage1_schedules_match_reference_formulas():
    # run_nerf_batch.py:281-297 with lrate_decay=500:
    # decoder: lr * 0.1^(step/300000); planes: lr * 0.5^(step/30000); frozen >300k.
    dec = stage1_decoder_schedule(5e-3, 500)
    pl = stage1_plane_schedule(1e-1, 500)
    for step in (0, 1000, 30000, 150000, 300000):
        np.testing.assert_allclose(
            float(dec(step)), 5e-3 * 0.1 ** (step / 300000), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pl(step)), 1e-1 * 0.5 ** (step / 30000), rtol=1e-6
        )
    # decay freezes after 300k
    np.testing.assert_allclose(float(dec(400000)), float(dec(300000)))
    np.testing.assert_allclose(float(pl(999999)), float(pl(300000)))


def test_stage2_warm_down():
    s = stage2_lr_schedule(5e-5, anneal_steps=100000)
    np.testing.assert_allclose(float(s(0)), 5e-5)
    np.testing.assert_allclose(float(s(50000)), 2.5e-5)
    np.testing.assert_allclose(float(s(100000)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(s(200000)), 0.0, atol=1e-12)
    const = stage2_lr_schedule(5e-5, anneal_steps=0)
    np.testing.assert_allclose(float(const(123456)), 5e-5)


def test_finetune_optimizer_freezes_decoder():
    import jax.numpy as jnp

    tx = make_finetune_optimizer(plane_lr=0.1, decay_every=500)
    params = {"decoder": {"w": jnp.ones((2, 2))}, "planes": jnp.ones((2, 2))}
    state = tx.init(params)
    grads = {"decoder": {"w": jnp.ones((2, 2))}, "planes": jnp.ones((2, 2))}
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["decoder"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["planes"]).max()) > 0.0


@pytest.mark.parametrize(
    "mod",
    [
        "recon_train", "recon_ft", "recon_test", "diff_train", "diff_sample",
        "image_sample", "image_nll", "sr_train", "sr_sample", "main",
    ],
)
def test_cli_modules_import(mod):
    import importlib

    m = importlib.import_module(f"humanliff_tpu.cli.{mod}")
    assert hasattr(m, "main")


def test_main_dispatcher_lists_commands(capsys):
    from humanliff_tpu.cli.main import COMMANDS, main

    rc = main(["--help"])
    out = capsys.readouterr().out
    assert rc == 0
    for c in COMMANDS:
        assert c in out


def test_config_file_overrides(tmp_path):
    from humanliff_tpu.utils.config import parse_with_config, stage1_parser

    cfg = tmp_path / "c.txt"
    cfg.write_text("n_rand = 512\ntriplane_dim = 64\nuse_canonical_space = true\n")
    args = parse_with_config(stage1_parser(), ["--config", str(cfg)])
    assert args.n_rand == 512
    assert args.triplane_dim == 64
    assert args.use_canonical_space is True
    # CLI wins over config file.
    args2 = parse_with_config(
        stage1_parser(), ["--config", str(cfg), "--n_rand", "1024"]
    )
    assert args2.n_rand == 1024

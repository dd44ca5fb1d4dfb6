"""diff_sample --decode CLI integration: tiny generate -> fast render -> mesh.

Covers the full decode surface (orbit fallback cameras, fast_render grid path,
PNG/mesh export) end-to-end through the real CLI entry point with checkpoints
written the way training writes them (reference flow:
triplane_sample_layered.py:37-207)."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def test_diff_sample_decode_smoke(tmp_path):
    from humanliff_tpu.cli.diff_sample import main
    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.factory import create_model
    from humanliff_tpu.nerf.decoder import NeRFDecoder
    from humanliff_tpu.train import checkpoint as ckpt
    from humanliff_tpu.train.stage2 import Stage2Config, create_stage2_state
    from humanliff_tpu.train.stage1 import Stage1Config, create_train_state
    from humanliff_tpu.train.optim import make_stage1_optimizer

    S, C = 16, 9  # C3 = 3 -> one channel per nine-plane group

    # Stage-2 checkpoint with EMA weights (what _load_ema_params reads).
    model = create_model(
        image_size=S, in_channels=C, num_channels=16, out_channels=C,
        num_res_blocks=1, learn_sigma=False, class_cond=True,
        attention_resolutions="8", num_heads=2, num_heads_upsample=-1,
        use_scale_shift_norm=True, cond_type="controlnet", use_3d_aware=False,
        dropout=0.0,
    )
    x0 = jnp.zeros((1, S, S, C))
    params = model.init(jax.random.key(0), x0, jnp.zeros((1,)), x0,
                        jnp.zeros((1,), jnp.int32))
    s2 = create_stage2_state(params, Stage2Config(ema_rates=(0.9999,)), 10)
    model_dir = str(tmp_path / "model")
    ckpt.save_state(model_dir, 1, s2)

    # Stage-1 checkpoint holding the frozen decoder.
    cfg1 = Stage1Config(num_instances=1, num_layers=1, triplane_dim=S,
                        triplane_ch=C)
    s1 = create_train_state(
        jax.random.key(1), cfg1, NeRFDecoder(d_in=C), make_stage1_optimizer()
    )
    stage1_dir = str(tmp_path / "stage1")
    ckpt.save_state(stage1_dir, 1, s1)

    out_dir = str(tmp_path / "samples")
    main([
        "--model_dir", model_dir, "--stage1_ckpt", stage1_dir,
        "--out_dir", out_dir, "--num_samples", "1", "--batch_size", "1",
        "--layer_idx", "0", "--decode", "--num_views", "2",
        "--render_size", "24", "--mesh_resolution", "12",
        "--image_size", str(S), "--in_channels", str(C),
        "--out_channels", str(C), "--num_channels", "16",
        "--num_res_blocks", "1", "--attention_resolutions", "8",
        "--diffusion_steps", "10", "--timestep_respacing", "2",
        "--fast_render", "true", "--grid_resolution", "8",
        "--render_bf16", "false",
    ])

    pngs = glob.glob(os.path.join(out_dir, "person_s0_v*.png"))
    assert len(pngs) == 2, pngs
    assert os.path.exists(os.path.join(out_dir, "samples_person.npz"))
    import imageio.v2 as imageio

    img = imageio.imread(pngs[0])
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()

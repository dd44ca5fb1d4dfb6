"""Layered-chain fidelity metrics (eval/fidelity.py vs the chain contract at
triplane_sample_layered.py:124-151)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from humanliff_tpu.eval.fidelity import (
    chain_fidelity_report,
    decoded_fidelity,
    heldout_denoise_loss,
    plane_fidelity,
)


def test_plane_fidelity_identical_and_localized_edit():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (32, 32, 27)).astype(np.float32)

    same = plane_fidelity(x, x)
    assert same["change_fraction"] == 0.0
    assert same["outside_psnr"] > 80.0

    # Edit an 8x8 patch strongly, add tiny noise elsewhere: the change region
    # must localize to the patch and the outside must stay near-identical.
    y = x + rng.normal(0, 0.005, x.shape).astype(np.float32)
    y[4:12, 10:18] += 1.0
    m = plane_fidelity(y, x, threshold=0.1)
    patch_frac = 64 / (32 * 32)
    assert abs(m["change_fraction"] - patch_frac) < 0.02
    assert m["outside_psnr"] > 40.0
    assert m["outside_l1"] < 0.01


def test_plane_fidelity_unrelated_planes_flag_everything():
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (16, 16, 8)).astype(np.float32)
    b = rng.uniform(-1, 1, (16, 16, 8)).astype(np.float32)
    m = plane_fidelity(a, b, threshold=0.1)
    assert m["change_fraction"] > 0.95


def test_decoded_fidelity_synthetic_gt_layers_preserve_body():
    """Layer-0 regions survive into layer 1 on the synthetic benchmark: the
    analytic GT renders of consecutive cumulative layers keep the body
    occupied and localize the pixel changes to the new shell."""
    from humanliff_tpu.data.synthetic import SyntheticLayeredDataset

    ds = SyntheticLayeredDataset(num_instances=1, image_size=64,
                                 tight_bounds=True)
    l0 = ds.test_item(0, 0, 150)
    l1 = ds.test_item(0, 1, 150)
    m = decoded_fidelity(l1["rgb"], l1["acc"], l0["rgb"], l0["acc"])
    # Cumulative layers only ADD geometry: the layer-0 body stays occupied.
    assert m["occupancy_persistence"] > 0.99
    # The new shell is a bounded edit, and the rest of the frame is identical.
    assert m["changed_pixel_fraction"] < 0.5
    assert m["unchanged_psnr"] > 30.0


def test_decoded_fidelity_detects_body_erasure():
    rng = np.random.default_rng(2)
    rgb0 = rng.uniform(0, 1, (256, 3)).astype(np.float32)
    acc0 = np.ones((256,), np.float32)
    rgb1 = rgb0.copy()
    acc1 = np.zeros((256,), np.float32)  # layer 1 erased everything
    m = decoded_fidelity(rgb1, acc1, rgb0, acc0)
    assert m["occupancy_persistence"] == 0.0


def test_chain_fidelity_report_orders_pairs():
    rng = np.random.default_rng(3)
    base = rng.uniform(-1, 1, (2, 8, 8, 6)).astype(np.float32)
    chain = {"a": base, "b": base + 0.001, "c": base + 1.0}
    rep = chain_fidelity_report(chain, threshold=0.1)
    assert list(rep) == ["a->b", "b->c"]
    assert rep["a->b"]["change_fraction"] == 0.0
    assert rep["b->c"]["change_fraction"] == 1.0


def test_heldout_denoise_loss_per_layer_and_deterministic():
    from humanliff_tpu.diffusion.respace import create_diffusion
    from humanliff_tpu.models.unet import UNetModel

    model = UNetModel(
        in_channels=6, model_channels=16, out_channels=6, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1,), num_classes=4,
        num_heads=2, cond_type="controlnet",
    )
    d = create_diffusion(steps=20)
    object.__setattr__(d, "channel_axis", -1)
    x0 = jnp.zeros((1, 8, 8, 6))
    params = model.init(
        jax.random.key(0), x0, jnp.zeros((1,)), x0, jnp.zeros((1,), jnp.int32)
    )
    rng = np.random.default_rng(4)
    items = [
        {"x": rng.normal(0, 0.3, (8, 8, 6)).astype(np.float32),
         "x_cond": np.zeros((8, 8, 6), np.float32),
         "y": k % 4}
        for k in range(6)
    ]
    key = jax.random.key(5)
    losses = heldout_denoise_loss(model, params, d, items, key, n_timesteps=4)
    assert set(losses) <= {0, 1, 2, 3}
    assert all(np.isfinite(v) for v in losses.values())
    again = heldout_denoise_loss(model, params, d, items, key, n_timesteps=4)
    assert losses == again

"""3d-aware mode: layout parity with the reference + checkpoint-import support.

VERDICT r3 item 8: our 3d-aware output folding was flagged as an untested
deviation (models/unet.py out_conv emits out_channels//3 on the unrolled
layout). These tests pin the exact correspondence to the reference:

- the reference CONSTRUCTOR convention is ``in/out_channels = C//3`` (its
  first conv consumes the unrolled ``C//3``-channel tensor and its final fold
  triples ``out_channels``; unet.py:378,471-475,566-570,613-614), while ours
  is ``in/out_channels = C`` with the division handled internally — same
  architecture, same parameter shapes, different constructor units;
- the unroll / mean-exchange / fold math is bitwise-transposable to the
  reference's NCHW slicing (oracles below re-execute unet.py:208-213 and
  :566-570,:613-614 semantics in numpy);
- a reference-keyed 3d-aware state dict imports through
  ``unet_params_from_state_dict`` with identical tree/shapes and runs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.models.unet import UNetModel, _mix_3d_aware

from test_torch_import import _synthetic_unet_state_dict


def _nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


# ---- numpy oracles of the reference NCHW slicing --------------------------


def _ref_unroll(x):
    """unet.py:566-570: channel thirds side-by-side along W. x: (B, C, H, W)."""
    C = x.shape[1]
    g = C // 3
    return np.concatenate([x[:, :g], x[:, g : 2 * g], x[:, 2 * g :]], axis=-1)


def _ref_fold(h, W):
    """unet.py:613-614: width thirds stacked into channels. h: (B, o, H, 3W)."""
    return np.concatenate([h[..., :W], h[..., W : 2 * W], h[..., 2 * W :]], axis=1)


def _ref_mix(h):
    """unet.py:208-213: per-plane mean exchange on the unrolled layout."""
    B, C, H, W = h.shape
    w3 = W // 3
    g0, g1, g2 = h[..., :w3], h[..., w3 : 2 * w3], h[..., 2 * w3 :]

    def wmean(g):
        return np.repeat(g.mean(-1, keepdims=True), w3, axis=-1)

    def hmean(g):
        return np.repeat(g.mean(-2, keepdims=True), H, axis=-2)

    h_xy = np.concatenate([g0, wmean(g1), hmean(g2)], axis=1)
    h_xz = np.concatenate([g1, wmean(g0), wmean(g2)], axis=1)
    h_zy = np.concatenate([g2, hmean(g0), hmean(g1)], axis=1)
    return np.concatenate([h_xy, h_xz, h_zy], axis=-1)


def test_unroll_fold_layout_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 4, 5)).astype(np.float32)  # NCHW

    # Our unroll (UNetModel.__call__): NHWC split channels, concat along W.
    ours = np.concatenate(np.split(_nhwc(x), 3, axis=-1), axis=2)
    np.testing.assert_array_equal(_nchw(ours), _ref_unroll(x))

    # Our fold: NHWC split W thirds, concat channels.
    h = rng.normal(size=(2, 3, 4, 15)).astype(np.float32)  # (B, o, H, 3W)
    ours_f = np.concatenate(np.split(_nhwc(h), 3, axis=2), axis=-1)
    np.testing.assert_array_equal(_nchw(ours_f), _ref_fold(h, 5))

    # Round trip: fold(unroll(x)) restores x when o == C//3 groups align.
    np.testing.assert_array_equal(_ref_fold(_ref_unroll(x), 5), x)


def test_mix_3d_aware_matches_reference():
    rng = np.random.default_rng(1)
    h = rng.normal(size=(2, 5, 4, 12)).astype(np.float32)  # (B, C, H, 3*w3)
    ours = np.asarray(_mix_3d_aware(jnp.asarray(_nhwc(h))))
    np.testing.assert_allclose(_nchw(ours), _ref_mix(h), rtol=1e-6, atol=1e-6)


def _synthetic_3d_aware_state_dict(ch=16, in_ch_ref=2, out_ch_ref=2):
    """Reference-keyed 3d-aware sd: constructor units are C//3 (the reference
    convention), and every ResBlock out conv consumes the 3x mean-exchange
    channels (unet.py's ``3*self.out_channels`` conv input in 3d-aware mode)."""
    sd = _synthetic_unet_state_dict(
        ch=ch, num_res_blocks=1, channel_mult=(1, 2), attention_ds=(2,),
        in_ch=in_ch_ref, out_ch=out_ch_ref, controlnet=True,
    )
    rng = np.random.default_rng(7)
    for k in list(sd):
        # The ControlNet cond encoder's ResBlocks are built WITHOUT
        # use_3d_aware in the reference (unet.py:492-501) — only the main
        # path's out convs see the 3x mean-exchange channels.
        if k.endswith("out_layers.3.weight") and not k.startswith(
                "input_blocks_cond"):
            o, i, kh, kw = sd[k].shape
            sd[k] = rng.normal(scale=0.02, size=(o, 3 * i, kh, kw)).astype(
                np.float32
            )
    return sd


def test_3d_aware_reference_checkpoint_imports_and_runs():
    from humanliff_tpu.compat.torch_import import unet_params_from_state_dict

    C = 6  # our constructor units; reference checkpoint uses C//3 = 2
    sd = _synthetic_3d_aware_state_dict(ch=16, in_ch_ref=C // 3,
                                        out_ch_ref=C // 3)
    variables = unet_params_from_state_dict(
        sd, num_res_blocks=1, channel_mult=(1, 2), attention_ds=(2,),
    )

    model = UNetModel(
        in_channels=C, model_channels=16, out_channels=C, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_classes=4,
        num_heads=2, cond_type="controlnet", use_3d_aware=True,
    )
    x = jnp.zeros((2, 6, 6, C))
    ref_vars = model.init(
        jax.random.key(0), x, jnp.zeros((2,)), x, jnp.zeros((2,), jnp.int32)
    )
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars)
    imp_shapes = jax.tree.map(lambda a: a.shape, variables)
    assert ref_shapes == imp_shapes

    out = model.apply(
        variables, x + 0.1, jnp.ones((2,)), x + 0.05, jnp.asarray([0, 3])
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

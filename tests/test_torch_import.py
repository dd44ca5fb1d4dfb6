"""Checkpoint-import tests: functional parity for the decoder, structural
compatibility for the UNet mapping.

The mapping layer (``*_from_state_dict``) operates on plain numpy state dicts
under the reference's key names, so these tests are torch-free; only the
``.tar`` round-trip test needs torch (to exercise ``torch.load``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from humanliff_tpu.compat.torch_import import (
    stage1_params_from_state_dict,
    unet_params_from_state_dict,
)
from humanliff_tpu.nerf.decoder import NeRFDecoder

from golden_cases import decoder_oracle_forward, decoder_state_dict


def test_decoder_import_functional_parity():
    sd = decoder_state_dict()
    dec_vars = stage1_params_from_state_dict(sd)["decoder"]

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(64, 27)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    from humanliff_tpu.ops.posenc import positional_encoding

    venc = np.asarray(positional_encoding(jnp.asarray(dirs), 4))
    ref_rgb, ref_alpha = decoder_oracle_forward(sd, feats, venc)

    dec = NeRFDecoder()
    rgb, alpha = dec.apply(dec_vars, jnp.asarray(feats), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb, atol=2e-5)


def test_stage1_planes_import():
    rng = np.random.default_rng(1)
    planes = rng.normal(size=(2, 4, 3, 9, 16, 16)).astype(np.float32)
    out = stage1_params_from_state_dict({"tri_planes": planes})
    np.testing.assert_allclose(out["planes"], planes)


def test_stage1_tar_roundtrip_with_torch(tmp_path):
    """End-to-end .tar path (needs torch for torch.save/load)."""
    torch = pytest.importorskip("torch")
    from humanliff_tpu.compat.torch_import import import_stage1_checkpoint

    sd = {k: torch.from_numpy(v.copy()) for k, v in decoder_state_dict().items()}
    sd["tri_planes"] = torch.randn(1, 4, 3, 9, 8, 8)
    path = str(tmp_path / "ckpt.tar")
    torch.save({"global_step": 123, "network_fn_state_dict": sd}, path)

    imported, step = import_stage1_checkpoint(path)
    assert step == 123
    assert imported["planes"].shape == (1, 4, 3, 9, 8, 8)
    assert "decoder" in imported


def _synthetic_unet_state_dict(ch=32, num_res_blocks=1, channel_mult=(1, 2),
                               attention_ds=(2,), in_ch=6, out_ch=6,
                               controlnet=True):
    """Random numpy tensors under the reference's key names (construction order
    of unet.py:375-518), sized for the tiny test config."""
    rng = np.random.default_rng(4)
    sd = {}
    ted = ch * 4

    def dense(p, i, o):
        sd[f"{p}.weight"] = rng.normal(scale=0.02, size=(o, i)).astype(np.float32)
        sd[f"{p}.bias"] = np.zeros(o, np.float32)

    def conv(p, i, o, k=3):
        sd[f"{p}.weight"] = rng.normal(scale=0.02, size=(o, i, k, k)).astype(
            np.float32
        )
        sd[f"{p}.bias"] = np.zeros(o, np.float32)

    def conv1d(p, i, o):
        sd[f"{p}.weight"] = rng.normal(scale=0.02, size=(o, i, 1)).astype(np.float32)
        sd[f"{p}.bias"] = np.zeros(o, np.float32)

    def gn(p, c):
        sd[f"{p}.weight"] = np.ones(c, np.float32)
        sd[f"{p}.bias"] = np.zeros(c, np.float32)

    def resblock(p, cin, cout):
        gn(f"{p}.in_layers.0", cin)
        conv(f"{p}.in_layers.2", cin, cout)
        dense(f"{p}.emb_layers.1", ted, 2 * cout)
        gn(f"{p}.out_layers.0", cout)
        conv(f"{p}.out_layers.3", cout, cout)
        if cin != cout:
            conv(f"{p}.skip_connection", cin, cout, k=1)

    def attn(p, c):
        gn(f"{p}.norm", c)
        conv1d(f"{p}.qkv", c, 3 * c)
        conv1d(f"{p}.proj_out", c, c)

    dense("time_embed.0", ch, ted)
    dense("time_embed.2", ted, ted)
    sd["label_emb.weight"] = rng.normal(scale=0.02, size=(4, ted)).astype(np.float32)

    def encoder(prefix):
        conv(f"{prefix}.0.0", in_ch, ch)
        chans = [ch]
        cur = ch
        ds = 1
        idx = 1
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                resblock(f"{prefix}.{idx}.0", cur, mult * ch)
                cur = mult * ch
                if ds in attention_ds:
                    attn(f"{prefix}.{idx}.1", cur)
                chans.append(cur)
                idx += 1
            if level != len(channel_mult) - 1:
                conv(f"{prefix}.{idx}.0.op", cur, cur)
                chans.append(cur)
                ds *= 2
                idx += 1
        return idx, chans, cur, ds

    n_enc, chans, cur, ds = encoder("input_blocks")
    resblock("middle_block.0", cur, cur)
    attn("middle_block.1", cur)
    resblock("middle_block.2", cur, cur)

    idx = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            skip = chans.pop()
            resblock(f"output_blocks.{idx}.0", cur + skip, ch * mult)
            cur = ch * mult
            pos = 1
            if ds in attention_ds:
                attn(f"output_blocks.{idx}.{pos}", cur)
                pos += 1
            if level and i == num_res_blocks:
                conv(f"output_blocks.{idx}.{pos}.conv", cur, cur)
                ds //= 2
            idx += 1

    gn("out.0", cur)
    conv("out.2", ch, out_ch)

    if controlnet:
        n2, chans2, _, _ = encoder("input_blocks_cond")
        for i, c in enumerate(chans2):
            conv(f"input_blocks_proj_cond.{i}", c, c, k=1)
    return sd


@pytest.mark.slow
def test_unet_import_structure_and_forward():
    from humanliff_tpu.models.unet import UNetModel

    sd = _synthetic_unet_state_dict()
    variables = unet_params_from_state_dict(
        sd, num_res_blocks=1, channel_mult=(1, 2), attention_ds=(2,),
    )

    model = UNetModel(
        in_channels=6, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_classes=4,
        num_heads=2, cond_type="controlnet",
    )
    x = jnp.zeros((2, 8, 8, 6))
    ref_vars = model.init(
        jax.random.key(0), x, jnp.zeros((2,)), x, jnp.zeros((2,), jnp.int32)
    )

    # Identical tree structure + shapes.
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars)
    imp_shapes = jax.tree.map(lambda a: a.shape, variables)
    assert ref_shapes == imp_shapes

    # And the imported weights actually run.
    out = model.apply(
        variables, x + 0.1, jnp.ones((2,)), x, jnp.asarray([0, 3])
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

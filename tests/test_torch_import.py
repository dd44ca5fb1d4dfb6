"""Checkpoint-import tests: functional parity for the decoder, structural
compatibility for the UNet mapping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from humanliff_tpu.compat.torch_import import (  # noqa: E402
    import_stage1_checkpoint,
    import_unet_checkpoint,
)
from humanliff_tpu.nerf.decoder import NeRFDecoder  # noqa: E402


class _TorchDecoder(nn.Module):
    """Independent torch replica of the reference decoder architecture
    (renderer.py:32-43, :142-164) used as a golden oracle."""

    def __init__(self):
        super().__init__()
        self.pts_linears = nn.ModuleList(
            [nn.Linear(27, 128), nn.Linear(128, 128), nn.Linear(155, 128)]
        )
        self.feature_linear = nn.Linear(128, 128)
        self.alpha_linear = nn.Linear(128, 1)
        self.views_linear = nn.Linear(155, 64)
        self.rgb_linear = nn.Linear(64, 3)

    def forward(self, x, viewdir_enc):
        h = x
        for i, l in enumerate(self.pts_linears):
            h = F.softplus(l(h))
            if i == 1:
                h = torch.cat([x, h], -1)
        alpha = self.alpha_linear(h)
        feat = self.feature_linear(h)
        h2 = F.softplus(self.views_linear(torch.cat([feat, viewdir_enc], -1)))
        return self.rgb_linear(h2), alpha


def test_decoder_import_functional_parity(tmp_path):
    torch.manual_seed(0)
    tdec = _TorchDecoder()
    path = str(tmp_path / "ckpt.tar")
    torch.save(
        {"global_step": 123, "network_fn_state_dict": tdec.state_dict()}, path
    )

    imported, step = import_stage1_checkpoint(path)
    assert step == 123
    dec_vars = imported["decoder"]

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(64, 27)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    from humanliff_tpu.ops.posenc import positional_encoding

    venc = np.asarray(positional_encoding(jnp.asarray(dirs), 4))

    with torch.no_grad():
        t_rgb, t_alpha = tdec(torch.from_numpy(feats), torch.from_numpy(venc))

    dec = NeRFDecoder()
    rgb, alpha = dec.apply(dec_vars, jnp.asarray(feats), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(alpha), t_alpha.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), t_rgb.numpy(), atol=2e-5)


def test_stage1_planes_import(tmp_path):
    planes = torch.randn(2, 4, 3, 9, 16, 16)
    path = str(tmp_path / "subj.tar")
    torch.save({"global_step": 2000, "network_fn_state_dict": {"tri_planes": planes}}, path)
    imported, step = import_stage1_checkpoint(path)
    assert step == 2000
    np.testing.assert_allclose(imported["planes"], planes.numpy())


def _synthetic_unet_state_dict(ch=32, num_res_blocks=1, channel_mult=(1, 2),
                               attention_ds=(2,), in_ch=6, out_ch=6,
                               controlnet=True):
    """Random tensors under the reference's key names (construction order of
    unet.py:375-518), sized for the tiny test config."""
    sd = {}
    ted = ch * 4

    def dense(p, i, o):
        sd[f"{p}.weight"] = torch.randn(o, i) * 0.02
        sd[f"{p}.bias"] = torch.zeros(o)

    def conv(p, i, o, k=3):
        sd[f"{p}.weight"] = torch.randn(o, i, k, k) * 0.02
        sd[f"{p}.bias"] = torch.zeros(o)

    def conv1d(p, i, o):
        sd[f"{p}.weight"] = torch.randn(o, i, 1) * 0.02
        sd[f"{p}.bias"] = torch.zeros(o)

    def gn(p, c):
        sd[f"{p}.weight"] = torch.ones(c)
        sd[f"{p}.bias"] = torch.zeros(c)

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
    sd["label_emb.weight"] = torch.randn(4, ted) * 0.02

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


def test_unet_import_structure_and_forward(tmp_path):
    from humanliff_tpu.models.unet import UNetModel

    sd = _synthetic_unet_state_dict()
    path = str(tmp_path / "model.pt")
    torch.save(sd, path)

    variables = import_unet_checkpoint(
        path, num_res_blocks=1, channel_mult=(1, 2), attention_ds=(2,),
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

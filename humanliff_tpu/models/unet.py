"""The improved-diffusion UNet with HumanLiff's layer conditioning, in flax (NHWC).

Architecture parity with the reference (human_diffusion/improved_diffusion/unet.py):
ResBlocks with scale-shift GroupNorm (FiLM), self-attention at the configured
downsample rates, channel_mult pyramid, sinusoidal time embedding -> 2-layer MLP,
optional class (clothing-layer) embedding, and four conditioning modes:

- ``controlnet`` (the flagship, unet.py:477-518, :594-609): a full copy of the encoder
  runs on ``x + x_cond``; each of its features passes a zero-init 1x1 projection and is
  added to the corresponding encoder skip in the decoder.
- ``concat``: channel-concat x_cond at the input.
- ``AdaGN``: x_cond strided-conv -> vector added to the time embedding.
- ``cross_attention``: x_cond -> context tokens for SpatialTransformer blocks.

Plus ``use_3d_aware`` tri-plane mixing (unet.py:208-213, :566-570): the three plane
groups roll out side-by-side along width and exchange per-plane means inside each
ResBlock.

TPU notes: NHWC layout; convs/attention land on the MXU; bf16 activation policy via
the ``dtype`` attribute with fp32 GroupNorm and fp32 softmax (matching the reference's
fp16-with-fp32-norms recipe, nn.py:17-19).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from humanliff_tpu.models.attention import SelfAttentionBlock, SpatialTransformer
from humanliff_tpu.models.nn import GroupNorm32, ZeroConv, timestep_embedding


def _mix_3d_aware(h: jnp.ndarray) -> jnp.ndarray:
    """Tri-plane mean-exchange (unet.py:208-213), NHWC with planes tiled along W."""
    B, H, W, C = h.shape
    w3 = W // 3
    g0, g1, g2 = h[:, :, :w3], h[:, :, w3 : 2 * w3], h[:, :, 2 * w3 :]

    def wmean(g):  # mean over width, tiled back
        return jnp.broadcast_to(g.mean(axis=2, keepdims=True), (B, H, w3, C))

    def hmean(g):  # mean over height, tiled back
        return jnp.broadcast_to(g.mean(axis=1, keepdims=True), (B, H, w3, C))

    h_xy = jnp.concatenate([g0, wmean(g1), hmean(g2)], axis=-1)
    h_xz = jnp.concatenate([g1, wmean(g0), wmean(g2)], axis=-1)
    h_zy = jnp.concatenate([g2, hmean(g0), hmean(g1)], axis=-1)
    return jnp.concatenate([h_xy, h_xz, h_zy], axis=2)


class ResBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    use_3d_aware: bool = False
    use_conv_skip: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        C_in = x.shape[-1]
        h = nn.silu(GroupNorm32(name="in_norm")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            if self.use_3d_aware:
                h = _mix_3d_aware(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = ZeroConv(self.out_channels, name="out_conv")(h)
        else:
            h = h + emb_out
            h = nn.silu(GroupNorm32(name="out_norm")(h))
            if self.use_3d_aware:
                h = _mix_3d_aware(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = ZeroConv(self.out_channels, name="out_conv")(h)

        if C_in == self.out_channels:
            skip = x
        elif self.use_conv_skip:
            skip = nn.Conv(self.out_channels, (3, 3), padding=1, name="skip_conv")(x)
        else:
            skip = nn.Conv(self.out_channels, (1, 1), name="skip_conv")(x)
        return skip + h


class Downsample(nn.Module):
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = nn.Conv(C, (3, 3), padding=1, name="conv")(x)
        return x


class UNetBlock(nn.Module):
    """One TimestepEmbedSequential unit: optional in-conv / res / attn / resample."""

    res: Optional[ResBlock] = None
    attn: Optional[Any] = None
    down: Optional[Downsample] = None
    up: Optional[Upsample] = None
    in_conv: Optional[nn.Conv] = None

    def __call__(self, x, emb, context=None, deterministic: bool = True):
        if self.in_conv is not None:
            x = self.in_conv(x)
        if self.res is not None:
            x = self.res(x, emb, deterministic)
        if self.attn is not None:
            if isinstance(self.attn, SpatialTransformer):
                x = self.attn(x, context)
            else:
                x = self.attn(x)
        if self.down is not None:
            x = self.down(x)
        if self.up is not None:
            x = self.up(x)
        return x


class UNetModel(nn.Module):
    in_channels: int = 27
    model_channels: int = 192
    out_channels: int = 27
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (8, 16, 32)  # downsample rates
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    cond_type: str = "controlnet"
    use_3d_aware: bool = False
    transformer_depth: int = 1
    use_checkpoint: bool = False  # rematerialize blocks (reference use_checkpoint)

    def _make_attn(self, ch: int, heads: int, name: str):
        if self.cond_type == "cross_attention":
            return SpatialTransformer(
                ch,
                n_heads=heads,
                d_head=ch // heads,
                depth=self.transformer_depth,
                context_dim=self.model_channels * 4,
                name=name,
            )
        return SelfAttentionBlock(num_heads=heads, name=name)

    @property
    def _block_cls(self):
        # Rematerialized blocks trade recompute for activation memory
        # (the reference's use_checkpoint, nn.py:124-170). deterministic (arg 4
        # counting self) must be static.
        if self.use_checkpoint:
            return nn.remat(UNetBlock, static_argnums=(4,))
        return UNetBlock

    def _build_encoder(self, prefix: str, with_attn_in_cond: bool):
        """Build encoder block list; returns (blocks, per-block channels)."""
        blocks = [
            self._block_cls(
                in_conv=nn.Conv(
                    self.model_channels, (3, 3), padding=1, name=f"{prefix}in_conv"
                ),
                name=f"{prefix}block_0",
            )
        ]
        chans = [self.model_channels]
        ch = self.model_channels
        ds = 1
        idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                out_ch = mult * self.model_channels
                attn = None
                if ds in self.attention_resolutions:
                    # The ControlNet copy always uses plain self-attention
                    # (unet.py:503-508) and never 3d-aware mixing (:491-500).
                    attn = (
                        SelfAttentionBlock(
                            num_heads=self.num_heads, name=f"{prefix}attn_{idx}"
                        )
                        if with_attn_in_cond
                        else self._make_attn(
                            out_ch, self.num_heads, f"{prefix}attn_{idx}"
                        )
                    )
                blocks.append(
                    self._block_cls(
                        res=ResBlock(
                            out_ch,
                            self.dropout,
                            self.use_scale_shift_norm,
                            self.use_3d_aware and not with_attn_in_cond,
                            name=f"{prefix}res_{idx}",
                        ),
                        attn=attn,
                        name=f"{prefix}block_{idx}",
                    )
                )
                ch = out_ch
                chans.append(ch)
                idx += 1
            if level != len(self.channel_mult) - 1:
                blocks.append(
                    self._block_cls(
                        down=Downsample(self.conv_resample, name=f"{prefix}down_{idx}"),
                        name=f"{prefix}block_{idx}",
                    )
                )
                chans.append(ch)
                ds *= 2
                idx += 1
        return blocks, chans

    def setup(self):
        time_embed_dim = self.model_channels * 4
        self.time_mlp_1 = nn.Dense(time_embed_dim, name="time_mlp_1")
        self.time_mlp_2 = nn.Dense(time_embed_dim, name="time_mlp_2")

        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes, time_embed_dim)

        heads_up = (
            self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        )

        self.input_blocks, input_chans = self._build_encoder("enc_", False)
        ch = input_chans[-1]

        self.middle_res1 = ResBlock(
            ch, self.dropout, self.use_scale_shift_norm, self.use_3d_aware,
            name="mid_res1",
        )
        self.middle_attn = self._make_attn(ch, self.num_heads, "mid_attn")
        self.middle_res2 = ResBlock(
            ch, self.dropout, self.use_scale_shift_norm, self.use_3d_aware,
            name="mid_res2",
        )

        # Decoder
        out_blocks = []
        chans = list(input_chans)
        ds = 2 ** (len(self.channel_mult) - 1)
        idx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                out_ch = self.model_channels * mult
                skip_ch = chans.pop()
                attn = None
                if ds in self.attention_resolutions:
                    attn = self._make_attn(out_ch, heads_up, f"dec_attn_{idx}")
                up = None
                if level and i == self.num_res_blocks:
                    up = Upsample(self.conv_resample, name=f"dec_up_{idx}")
                    ds //= 2
                out_blocks.append(
                    self._block_cls(
                        res=ResBlock(
                            out_ch,
                            self.dropout,
                            self.use_scale_shift_norm,
                            self.use_3d_aware,
                            name=f"dec_res_{idx}",
                        ),
                        attn=attn,
                        up=up,
                        name=f"dec_block_{idx}",
                    )
                )
                idx += 1
        self.output_blocks = out_blocks

        self.out_norm = GroupNorm32(name="out_norm")
        # 3d-aware mode runs on the plane-unrolled (H, 3W) layout; the final fold
        # re-stacks the three width groups into channels (unet.py:613-614), so the
        # conv emits out_channels//3 there to land on out_channels after folding.
        # CONSTRUCTOR-UNIT NOTE: the reference passes in/out_channels ALREADY
        # divided by 3 in this mode (its first conv consumes the unrolled
        # tensor and its fold triples the out conv's channels); we take the
        # full plane channel count and divide internally. A reference 3d-aware
        # checkpoint (built with C//3 units) therefore imports onto a model
        # constructed with C units — shapes verified in
        # tests/test_3d_aware_parity.py.
        out_feats = (
            self.out_channels // 3 if self.use_3d_aware else self.out_channels
        )
        self.out_conv = ZeroConv(out_feats, name="out_conv")

        if self.cond_type == "controlnet":
            self.cond_blocks, cond_chans = self._build_encoder("cond_", True)
            self.cond_projs = [
                ZeroConv(c, kernel=1, name=f"cond_proj_{i}")
                for i, c in enumerate(cond_chans)
            ]
        elif self.cond_type in ("AdaGN", "cross_attention"):
            self.cond_conv1 = nn.Conv(6, (3, 3), strides=2, padding=1, name="cond_conv1")
            self.cond_conv2 = nn.Conv(1, (3, 3), strides=2, padding=1, name="cond_conv2")
            self.cond_linear = nn.Dense(time_embed_dim, name="cond_linear")

    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        x_cond: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Forward. x: (B, H, W, C) NHWC; timesteps (B,) possibly fractional."""
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = self.time_mlp_2(nn.silu(self.time_mlp_1(emb)))

        W_orig = x.shape[2]
        if self.use_3d_aware:
            # (B, H, W, C) -> plane groups side-by-side along W (unet.py:566-570).
            g = jnp.split(x, 3, axis=-1)
            x = jnp.concatenate(g, axis=2)
            if x_cond is not None:
                gc = jnp.split(x_cond, 3, axis=-1)
                x_cond = jnp.concatenate(gc, axis=2)

        context = None
        if self.cond_type == "concat" and x_cond is not None:
            x = jnp.concatenate([x, x_cond], axis=-1)
        elif self.cond_type == "AdaGN" and x_cond is not None:
            c = self.cond_conv2(self.cond_conv1(x_cond))
            emb = emb + self.cond_linear(c.reshape(c.shape[0], -1))
        elif self.cond_type == "cross_attention" and x_cond is not None:
            c = self.cond_conv2(self.cond_conv1(x_cond))
            context = self.cond_linear(c.reshape(c.shape[0], -1))[:, None, :]

        if self.num_classes is not None:
            emb = emb + self.label_emb(y)

        hs = []
        h = x
        for block in self.input_blocks:
            h = block(h, emb, context, deterministic)
            hs.append(h)

        h = self.middle_res1(h, emb, deterministic)
        h = (
            self.middle_attn(h, context)
            if isinstance(self.middle_attn, SpatialTransformer)
            else self.middle_attn(h)
        )
        h = self.middle_res2(h, emb, deterministic)

        hs_cond = None
        if self.cond_type == "controlnet":
            assert x_cond is not None, "controlnet mode requires x_cond"
            hs_cond = []
            hc = x + x_cond
            for block, proj in zip(self.cond_blocks, self.cond_projs):
                hc = block(hc, emb, None, deterministic)
                hc = proj(hc)
                hs_cond.append(hc)

        for block in self.output_blocks:
            skip = hs.pop()
            if hs_cond is not None:
                skip = skip + hs_cond.pop()
            h = block(jnp.concatenate([h, skip], axis=-1), emb, context, deterministic)

        h = self.out_conv(nn.silu(self.out_norm(h)))
        if self.use_3d_aware:
            g = jnp.split(h, 3, axis=2)
            h = jnp.concatenate(g, axis=-1)
        return h


class SuperResModel(nn.Module):
    """Super-resolution wrapper: bilinear-upsample low_res and concat (unet.py:651-671)."""

    unet: UNetModel

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, x_cond=None, y=None,
                 deterministic: bool = True):
        import jax.image

        B, H, W, _ = x.shape
        up = jax.image.resize(low_res, (B, H, W, low_res.shape[-1]), "bilinear")
        x = jnp.concatenate([x, up], axis=-1)
        return self.unet(x, timesteps, x_cond=x_cond, y=y, deterministic=deterministic)

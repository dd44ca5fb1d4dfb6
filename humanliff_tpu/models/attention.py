"""Attention blocks: self-attention (unet.py:222-297) and the LDM-style spatial
transformer used by cond_type=cross_attention (spatial_transformer.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from humanliff_tpu.models.nn import GroupNorm32, ZeroDense


class SelfAttentionBlock(nn.Module):
    """QKV self-attention over spatial positions with residual (unet.py:222-274).

    Scale 1/sqrt(sqrt(d)) applied to both q and k; softmax in fp32.
    """

    num_heads: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = x.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, name="qkv")(GroupNorm32()(h))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.num_heads
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(hd, jnp.float32)))

        def heads(t):
            return t.reshape(B, H * W, self.num_heads, hd)

        q, k, v = heads(q) * scale, heads(k) * scale, heads(v)
        w = jnp.einsum("bthd,bshd->bhts", q, k)
        w = nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, H * W, C)
        out = ZeroDense(C, name="proj_out")(out)
        return (h + out).reshape(B, H, W, C)


class CrossAttention(nn.Module):
    """Multi-head cross attention (spatial_transformer.py)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        B, T, _ = q.shape
        S = k.shape[1]

        def heads(t, L):
            return t.reshape(B, L, self.heads, self.dim_head)

        q, k, v = heads(q, T), heads(k, S), heads(v, S)
        scale = self.dim_head**-0.5
        w = jnp.einsum("bthd,bshd->bhts", q * scale, k)
        w = nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, T, inner)
        return nn.Dense(self.query_dim, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2)(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(gate)


class BasicTransformerBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(self.dim, None, self.n_heads, self.d_head, name="attn1")(
            nn.LayerNorm()(x)
        )
        x = x + CrossAttention(
            self.dim, self.context_dim, self.n_heads, self.d_head, name="attn2"
        )(nn.LayerNorm()(x), context)
        h = nn.LayerNorm()(x)
        h = GEGLU(self.dim * 4)(h)
        x = x + nn.Dense(self.dim)(h)
        return x


class SpatialTransformer(nn.Module):
    """Project, run transformer blocks with optional context, project back with a
    zero-init output (spatial_transformer.py:136-178)."""

    channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        h = GroupNorm32()(x).reshape(B, H * W, C)
        h = nn.Dense(self.n_heads * self.d_head, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.n_heads * self.d_head,
                self.n_heads,
                self.d_head,
                self.context_dim,
                name=f"block_{i}",
            )(h, context)
        h = ZeroDense(C, name="proj_out")(h)
        return x + h.reshape(B, H, W, C)

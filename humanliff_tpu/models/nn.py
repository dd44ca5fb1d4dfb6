"""NN helpers for the UNet (reference: improved_diffusion/nn.py).

All modules are NHWC (TPU-native conv layout); the stage-2 pipeline transposes the
NCHW plane storage once at the batch boundary.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings, [cos | sin] layout (nn.py:103-121). Timesteps may be
    fractional (rescaled)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32 regardless of activation dtype (nn.py:17-19)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        C = x.shape[-1]
        groups = min(self.num_groups, C)
        if C % groups:  # only reachable in non-reference channel configs
            groups = math.gcd(C, groups)
        if x.ndim == 4 and 1 < x.shape[0] < 8:
            # TPU: at B=2/4 XLA fuses the producer conv into this fp32 reduce
            # with a layout that deoptimizes the conv — the whole 256^2 UNet
            # stage ran 4.3x slower at B=2 than B=1. This barrier severs that
            # fusion edge: res-block ratio 3.34 -> 1.93, full UNet B=2 123 ->
            # 98 ms (scripts/probe_resblock_fix.py, /tmp/gnmm_probe.json). It
            # is gated to the measured pathological window: B=1 pays ~7% and
            # B=8 scales cleanly without it (160 -> 185 ms if applied), and a
            # matmul-formulated GN reduce did not beat it. Identity for both
            # values and gradients.
            x = jax.lax.optimization_barrier(x)
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return h.astype(dtype)


def zeros_init():
    return nn.initializers.zeros


class ZeroConv(nn.Module):
    """Zero-initialized conv (the reference's ``zero_module`` wrapper, nn.py:68-74)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=pad,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)


class ZeroDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)

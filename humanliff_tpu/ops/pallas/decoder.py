"""Fused NeRF decoder MLP as a single Pallas TPU kernel.

The decoder runs per sample point (rays x samples ~= 0.5-1 M points/step). As separate
XLA ops every layer round-trips (M, 128) activations through HBM (~270 MB each);
fused, the whole trunk + heads live in VMEM per tile and only the 27-d inputs and
4-d outputs touch HBM. All weights (~54k params, ~220 KB) stay VMEM-resident.

Matmuls hit the MXU via ``jnp.dot(..., preferred_element_type=f32)``; softplus,
concat, and positional encoding are VPU element-wise work fused in between.

Gradients: ``fused_decoder`` carries a custom VJP whose backward re-computes through
the plain jnp decoder (defined here to mirror NeRFDecoder exactly), so training uses
the fast forward while autodiff stays on the well-tested XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from humanliff_tpu.ops.posenc import positional_encoding

TILE = 1024  # points per grid step (bounded by the ~16 MB VMEM budget)


def _plain_decoder(weights: Tuple[jnp.ndarray, ...], feats, dirs):
    """jnp twin of the kernel (and of NeRFDecoder) used for the backward pass."""
    w0, b0, w1, b1, w2, b2, wa, ba, wf, bf, wv, bv, wr, br = weights
    h = jax.nn.softplus(feats @ w0 + b0)
    h = jax.nn.softplus(h @ w1 + b1)
    h = jnp.concatenate([feats, h], axis=-1)
    h = jax.nn.softplus(h @ w2 + b2)
    alpha = h @ wa + ba
    feat = h @ wf + bf
    venc = positional_encoding(dirs, num_freqs=4)
    h2 = jax.nn.softplus(jnp.concatenate([feat, venc], axis=-1) @ wv + bv)
    rgb = h2 @ wr + br
    return rgb, alpha


def _kernel(feats_ref, dirs_ref, w0, b0, w1, b1, w2, b2, wa, ba, wf, bf, wv, bv,
            wr, br, rgb_ref, alpha_ref):
    x = feats_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    h = jax.nn.softplus(dot(x, w0[:]) + b0[:])
    h = jax.nn.softplus(dot(h, w1[:]) + b1[:])
    h = jnp.concatenate([x, h], axis=-1)
    h = jax.nn.softplus(dot(h, w2[:]) + b2[:])

    alpha_ref[:] = dot(h, wa[:]) + ba[:]
    feat = dot(h, wf[:]) + bf[:]

    d = dirs_ref[:]
    # PE(4): [d, sin(2^k d), cos(2^k d)] interleaved per frequency (fields.py:45-85).
    parts = [d]
    for k in range(4):
        s = (2.0**k) * d
        parts.append(jnp.sin(s))
        parts.append(jnp.cos(s))
    venc = jnp.concatenate(parts, axis=-1)

    h2 = jax.nn.softplus(dot(jnp.concatenate([feat, venc], axis=-1), wv[:]) + bv[:])
    rgb_ref[:] = dot(h2, wr[:]) + br[:]


def _forward(weights, feats, dirs, interpret=False):
    M = feats.shape[0]
    pad = (-M) % TILE
    feats_p = jnp.pad(feats, ((0, pad), (0, 0)))
    dirs_p = jnp.pad(dirs, ((0, pad), (0, 0)))
    n_tiles = feats_p.shape[0] // TILE

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    rgb, alpha = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, feats.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((feats_p.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((feats_p.shape[0], 1), jnp.float32),
        ),
        interpret=interpret,
    )(feats_p, dirs_p, *weights)
    return rgb[:M], alpha[:M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_decoder(weights, feats, dirs, interpret=False):
    """Fused (rgb_raw, alpha_raw) = decoder(feats (M,27), dirs (M,3)).

    ``weights`` is the flat tuple (w0,b0,w1,b1,w2,b2, alpha_w,b, feature_w,b,
    views_w,b, rgb_w,b) — see ``weights_from_decoder_vars``.
    """
    return _forward(weights, feats, dirs, interpret)


def _fwd(weights, feats, dirs, interpret):
    return _forward(weights, feats, dirs, interpret), (weights, feats, dirs)


def _bwd(interpret, res, g):
    weights, feats, dirs = res
    _, vjp = jax.vjp(lambda w, f, d: _plain_decoder(w, f, d), weights, feats, dirs)
    return vjp(g)


fused_decoder.defvjp(_fwd, _bwd)


def weights_from_decoder_vars(dec_vars) -> Tuple[jnp.ndarray, ...]:
    """Flatten NeRFDecoder variables into the kernel's weight tuple."""
    p = dec_vars["params"]
    return (
        p["trunk_0"]["kernel"], p["trunk_0"]["bias"],
        p["trunk_1"]["kernel"], p["trunk_1"]["bias"],
        p["trunk_2"]["kernel"], p["trunk_2"]["bias"],
        p["alpha"]["kernel"], p["alpha"]["bias"],
        p["feature"]["kernel"], p["feature"]["bias"],
        p["views"]["kernel"], p["views"]["bias"],
        p["rgb"]["kernel"], p["rgb"]["bias"],
    )

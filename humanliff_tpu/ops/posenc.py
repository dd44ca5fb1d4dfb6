"""NeRF positional encoding (reference: recon_NeRF/lib/fields.py:45-85).

Feature layout matches the reference exactly: ``[x, sin(f1 x), cos(f1 x), sin(f2 x),
cos(f2 x), ...]`` with frequencies ``2^0 .. 2^(num_freqs-1)`` — each sin/cos block is
the full ``d_in``-vector. With num_freqs=4, d_in=3 the output is 27-d (the view-dir
feature of the NeRF decoder).
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(
    x: jnp.ndarray, num_freqs: int = 4, include_input: bool = True
) -> jnp.ndarray:
    """Encode ``(..., d_in)`` to ``(..., d_in * (2*num_freqs (+1)))``."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # (F,)
    xf = x[..., None, :] * freqs[:, None]  # (..., F, d_in)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # Interleave (sin f, cos f) pairs along the frequency axis, then flatten.
    enc = jnp.stack([sin, cos], axis=-2)  # (..., F, 2, d_in)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc

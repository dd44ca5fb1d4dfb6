"""Axis-angle to rotation matrices (Rodrigues), batched.

Matches the reference's ``batch_rodrigues`` (recon_NeRF/lib/renderer.py:435-486,
smplx/lbs.py:299), including the +1e-8 angle regularization that keeps the zero pose
differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """Convert ``(..., 3)`` axis-angle vectors to ``(..., 3, 3)`` rotation matrices."""
    shape = rot_vecs.shape[:-1]
    rv = rot_vecs.reshape(-1, 3)
    angle = jnp.linalg.norm(rv + 1e-8, axis=1, keepdims=True)
    rot_dir = rv / angle

    cos = jnp.cos(angle)[:, :, None]
    sin = jnp.sin(angle)[:, :, None]

    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)

    ident = jnp.eye(3, dtype=rv.dtype)
    rot = ident + sin * K + (1.0 - cos) * (K @ K)
    return rot.reshape(*shape, 3, 3)

"""Alpha compositing along rays (volume rendering quadrature).

Matches the reference's render_core math (recon_NeRF/lib/renderer.py:221-239),
including its quirks, which matter for quality parity:

- the alpha transmittance uses RAW z-interval widths (NOT scaled by ``||rays_d||``;
  the scaled dists computed at renderer.py:226-228 are dead code),
- training adds N(0,1) noise to the raw density before softplus (renderer.py:221),
- the cumprod epsilon is 1e-7 here (1e-10 in the up-sampler).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def volume_weights(
    densities: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Per-sample compositing weights from raw densities.

    Args:
      densities: raw decoder densities ``(..., R, S)``.
      z_vals: ``(..., R, S)`` sample depths.
      noise_key: if given, adds standard-normal noise to the raw density
        (training-time regularization, renderer.py:221).

    Returns weights ``(..., R, S)``.
    """
    if noise_key is not None:
        densities = densities + jax.random.normal(
            noise_key, densities.shape, densities.dtype
        )
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(densities) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[..., :-1]
    return alpha * trans


def composite_rays(
    rgb: jnp.ndarray,
    densities: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample colors into per-ray RGB / accumulation / depth.

    Args:
      rgb: ``(..., R, S, 3)`` post-sigmoid sample colors.
      densities: ``(..., R, S)`` raw densities.
      z_vals: ``(..., R, S)``.

    Returns (rgb_map ``(..., R, 3)``, acc_map ``(..., R)``, depth_map ``(..., R)``);
    depth is the UN-normalized expected depth (near/far normalization happens in the
    renderer, renderer.py:288).
    """
    weights = volume_weights(densities, z_vals, noise_key=noise_key)
    acc_map = weights.sum(axis=-1)
    rgb_map = (rgb * weights[..., None]).sum(axis=-2)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    depth_map = (weights * z_vals).sum(axis=-1)
    return rgb_map, acc_map, depth_map

"""Tri-plane feature sampling with the reference's nine-plane trick.

The tri-plane tensor for one (instance, layer) is ``(3, C3, D, D)`` with ``C3 = ch // 3``
(ch=27 -> C3=9). Each of the three planes splits its channels into three groups of
``C = C3 // 3``; group 0 samples at the projected coordinate, group 1 at a +1/D offset
along the grid-x coordinate, group 2 at a +1/D offset along grid-y — yielding nine
effective feature maps (reference: recon_NeRF/lib/renderer.py:520-549).

Plane projections follow the EG3D axis matrices (renderer.py:488-518): after the
``coords @ inv(plane_axes)`` algebra the three projected 2D coordinates reduce to the
static index pairs ``(x, y)``, ``(x, z)``, ``(z, y)`` — we hard-code those instead of
doing 3x3 matmuls per point.

Output feature ordering matches the reference exactly (plane-major, then x/y/z channel
groups) so that decoder weights are interchangeable: per point the 27-vector is
``[p0_g0(3), p0_g1(3), p0_g2(3), p1_g0..., p2_g2(3)]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humanliff_tpu.ops.grid_sample import grid_sample_2d

# Rows: (plane, coord indices into xyz) reproducing projections (x,y), (x,z), (z,y).
_PLANE_COORD_IDX = ((0, 1), (0, 2), (2, 1))


def project_onto_planes(coords: jnp.ndarray) -> jnp.ndarray:
    """Project normalized 3D coords onto the three canonical planes.

    Args:
      coords: ``(M, 3)`` points (already box-warped to [-1, 1]).

    Returns:
      ``(3, M, 2)`` projected grid coordinates, ordered (x,y), (x,z), (z,y) — identical
      to ``coordinates @ inv(plane_axes)`` of the reference (renderer.py:504-518).
    """
    projections = [coords[:, list(pair)] for pair in _PLANE_COORD_IDX]
    return jnp.stack(projections, axis=0)


def normalize_to_box(coords: jnp.ndarray, box_warp: jnp.ndarray) -> jnp.ndarray:
    """Warp world coords into [-1, 1] given an AABB ``box_warp`` of shape (2, 3).

    Matches ``2 * (c - min) / (max - min) - 1`` (renderer.py:533).
    """
    lo = box_warp[0]
    hi = box_warp[1]
    return 2.0 * (coords - lo) / (hi - lo) - 1.0


def sample_triplane_features(
    planes: jnp.ndarray,
    coords: jnp.ndarray,
    box_warp: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Nine-plane bilinear feature sampling for one (instance, layer).

    Args:
      planes: ``(3, C3, D, D)`` tri-plane features (reference NCHW channel layout,
        the storage format shared with the diffusion stage). ``C3`` must be divisible
        by 3.
      coords: ``(M, 3)`` query points (world space if ``box_warp`` given, else already
        normalized to [-1, 1]).
      box_warp: optional ``(2, 3)`` AABB used to normalize coords.

    Returns:
      ``(M, 3 * C3)`` per-point features in reference ordering.
    """
    n_planes, C3, D, _ = planes.shape
    assert n_planes == 3 and C3 % 3 == 0
    C = C3 // 3

    if box_warp is not None:
        coords = normalize_to_box(coords, box_warp)

    proj = project_onto_planes(coords)  # (3, M, 2)

    # Nine (group, plane) coordinate sets: group 0 at proj, group 1 offset +1/D on
    # grid-x, group 2 offset +1/D on grid-y (renderer.py:539-545; note H == W == D).
    off = 1.0 / D
    zeros = jnp.zeros((), coords.dtype)
    offsets = jnp.asarray(
        [[zeros, zeros], [off, zeros], [zeros, off]], dtype=coords.dtype
    )  # (3 groups, 2)
    # grids: (3 planes, 3 groups, M, 2)
    grids = proj[:, None, :, :] + offsets[None, :, None, :]

    # maps: (3 planes, 3 groups, D, D, C) channels-last for the gather.
    maps = planes.reshape(3, 3, C, D, D).transpose(0, 1, 3, 4, 2)

    sample = jax.vmap(jax.vmap(grid_sample_2d))  # over (plane, group)
    feats = sample(maps, grids)  # (3, 3, M, C)

    M = coords.shape[0]
    # -> (M, plane, group, C) -> (M, 3*C3) in plane-major group order.
    return feats.transpose(2, 0, 1, 3).reshape(M, 3 * C3)

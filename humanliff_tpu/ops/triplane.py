"""Tri-plane feature sampling with the reference's nine-plane trick.

The tri-plane tensor for one (instance, layer) is ``(3, C3, D, D)`` with ``C3 = ch // 3``
(ch=27 -> C3=9). Each of the three planes splits its channels into three groups of
``C = C3 // 3``; group 0 samples at the projected coordinate, group 1 at a +1/D offset
along the grid-x coordinate, group 2 at a +1/D offset along grid-y — yielding nine
effective feature maps (reference: recon_NeRF/lib/renderer.py:520-549).

Plane projections follow the EG3D axis matrices (renderer.py:488-518): after the
``coords @ inv(plane_axes)`` algebra the three projected 2D coordinates reduce to the
static index pairs ``(x, y)``, ``(x, z)``, ``(z, y)`` — hard-coded instead of 3x3
matmuls per point. Note the +1/D normalized group offset equals exactly +0.5 pixel
under align_corners=False.

TPU performance: XLA's TPU gather is catastrophic for narrow rows and even worse
under vmap batching dims (measured 5.7 s for 524k points the naive way). The
implementation therefore QUAD-PACKS each plane-group into a zero-padded table of
2x2-texel rows — one 12-float-wide gather per (plane, group) replaces four 3-wide
gathers, and the 9 group gathers are unrolled (never vmapped): 138x faster on a
v5e chip at bit-identical output (see tests/test_triplane.py golden tests).

Output feature ordering matches the reference exactly (plane-major, then x/y/z channel
groups): per point the 27-vector is ``[p0_g0(3), p0_g1(3), p0_g2(3), p1_g0..., p2_g2(3)]``.
"""

from __future__ import annotations

import jax.numpy as jnp

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


def quad_pack_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """Pack ``(3, C3, D, D)`` planes into 9 zero-padded quad tables.

    Returns ``(9, (D+1)*(D+1), 4*C)`` where row (i, j) holds the 2x2 texel block
    with top-left at padded coordinate (i, j); the 1-texel zero border implements
    padding_mode='zeros'. Row layout: [c00(C), c01(C), c10(C), c11(C)].
    """
    n_planes, C3, D, _ = planes.shape
    C = C3 // 3
    t = planes.reshape(9, C, D, D).transpose(0, 2, 3, 1)  # (9, D, D, C)
    tpad = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    q = jnp.concatenate(
        [tpad[:, :-1, :-1], tpad[:, :-1, 1:], tpad[:, 1:, :-1], tpad[:, 1:, 1:]],
        axis=-1,
    )  # (9, D+1, D+1, 4C)
    return q.reshape(9, (D + 1) * (D + 1), 4 * C)


def _pixel_coords(coords_n: jnp.ndarray, D: int):
    """Nine (px, py) pixel-coordinate pairs (plane-major group order)."""
    x, y, z = coords_n[:, 0], coords_n[:, 1], coords_n[:, 2]
    out = []
    for a, b in _PLANE_COORD_IDX:
        gx = (x, y, z)[a]
        gy = (x, y, z)[b]
        px = ((gx + 1.0) * D - 1.0) * 0.5
        py = ((gy + 1.0) * D - 1.0) * 0.5
        out.append((px, py))          # group 0: at projection
        out.append((px + 0.5, py))    # group 1: +1/D normalized == +0.5 px on x
        out.append((px, py + 0.5))    # group 2: +0.5 px on y
    return out


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

    if box_warp is not None:
        coords = normalize_to_box(coords, box_warp)

    quads = quad_pack_planes(planes)  # (9, (D+1)^2, 4C)

    feats = []
    for g, (px, py) in enumerate(_pixel_coords(coords, D)):
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx = (px - x0)[:, None]
        wy = (py - y0)[:, None]
        # Padded-grid coords: texel (x0, y0) lives at (x0+1, y0+1); anything with
        # x0 in [-1, D-1] touches only in-bounds quad rows (the border is zero).
        xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, D)
        yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, D)
        oob = (x0 < -1) | (x0 > D - 1) | (y0 < -1) | (y0 > D - 1)
        rows = jnp.take(quads[g], yi * (D + 1) + xi, axis=0)  # (M, 4C)
        c00, c01, c10, c11 = jnp.split(rows, 4, axis=-1)
        out = (
            c00 * (1 - wx) * (1 - wy)
            + c01 * wx * (1 - wy)
            + c10 * (1 - wx) * wy
            + c11 * wx * wy
        )
        feats.append(jnp.where(oob[:, None], 0.0, out))

    # Plane-major (plane, group) order == reference ordering.
    return jnp.concatenate(feats, axis=-1)

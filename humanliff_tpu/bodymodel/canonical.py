"""Point canonicalization: deform observation-space samples into the shared big pose.

TPU-native replacement for the reference's ``deform_target2c_op``
(recon_NeRF/lib/renderer.py:60-122), which used pytorch3d's CUDA ``knn_points``.
Here the 1-NN against the SMPL vertices is a tiled matmul (MXU) + argmin (VPU):
``||q - v||^2 = |q|^2 - 2 q·v + |v|^2`` — the |q|^2 term is argmin-invariant and
dropped. Query sets of ~1M points tile over a ``lax.map`` to bound memory.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from humanliff_tpu.bodymodel.smpl import BodyModel, transform_params, _pose_offsets
from humanliff_tpu.bodymodel.rotations import batch_rodrigues


def _inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse for (..., 3, 3) — far cheaper on the VPU than
    the LU path of jnp.linalg.inv at per-sample-point scale."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def deform_to_canonical_batched(
    model: BodyModel,
    poses: jnp.ndarray,
    betas: jnp.ndarray,
    big_poses: jnp.ndarray,
    smpl_verts: jnp.ndarray,
    query_pts: jnp.ndarray,
    query_dirs: Optional[jnp.ndarray] = None,
    expression: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Natively-batched inverse-LBS canonicalization.

    Same math as ``deform_to_canonical`` but with a leading batch axis on
    everything (poses (B, J*3), betas (B, n), big_poses (B, J*3), smpl_verts
    (B, V, 3), query_pts (B, M, 3)). All per-vertex gathers flatten the batch into
    a single table lookup (vmapped gathers lower badly on TPU — see
    ops/triplane.py).
    """
    B, M = query_pts.shape[:2]
    V = smpl_verts.shape[1]

    A, _ = transform_params(model, poses, betas, expression)  # (B, J, 4, 4)
    J = A.shape[1]

    # Batched 1-NN: distances via batched matmul (MXU, bf16 inputs — neighbor
    # selection is robust to half precision), argmin per item.
    q16 = query_pts.astype(jnp.bfloat16)
    v16 = smpl_verts.astype(jnp.bfloat16)
    v_sq = (smpl_verts * smpl_verts).sum(-1)  # (B, V) fp32
    d = v_sq[:, None, :] - 2.0 * jnp.einsum(
        "bmd,bvd->bmv", q16, v16, preferred_element_type=jnp.float32
    )
    vert_ids = jnp.argmin(d, axis=-1).astype(jnp.int32)  # (B, M)

    # Skinning weights: shared (V, J) table — single flat gather over B*M ids.
    W = jnp.asarray(model.weights, jnp.float32)
    bweights = jnp.take(W, vert_ids.reshape(-1), axis=0).reshape(B, M, J)

    # All per-point 3x3/4x4 algebra below runs on COMPONENT (B, M) arrays: a
    # (B, M, 3, 3) tensor tiles (8, 128) on its last two axes — >100x lane
    # padding at render scale — while per-component arrays use full lanes.
    def mat16(A_j):  # blended per-point transform as 16 (B, M) components
        flat = jnp.einsum("bmj,bjk->bmk", bweights, A_j.reshape(B, J, 16))
        return [flat[..., i] for i in range(16)]

    def inv_apply(m, x, y, z):
        """inv(R) @ [x, y, z] for R = [[m0 m1 m2], [m4 m5 m6], [m8 m9 m10]]
        via the closed-form adjugate (same math as _inv3x3)."""
        A_ = m[5] * m[10] - m[6] * m[9]
        B_ = -(m[4] * m[10] - m[6] * m[8])
        C_ = m[4] * m[9] - m[5] * m[8]
        inv_det = 1.0 / (m[0] * A_ + m[1] * B_ + m[2] * C_)
        nx = (A_ * x - (m[1] * m[10] - m[2] * m[9]) * y
              + (m[1] * m[6] - m[2] * m[5]) * z) * inv_det
        ny = (B_ * x + (m[0] * m[10] - m[2] * m[8]) * y
              - (m[0] * m[6] - m[2] * m[4]) * z) * inv_det
        nz = (C_ * x - (m[0] * m[9] - m[1] * m[8]) * y
              + (m[0] * m[5] - m[1] * m[4]) * z) * inv_det
        return nx, ny, nz

    def fwd_apply(m, x, y, z):
        """R @ [x, y, z] + t for the same layout (t = m3, m7, m11)."""
        return (
            m[0] * x + m[1] * y + m[2] * z + m[3],
            m[4] * x + m[5] * y + m[6] * z + m[7],
            m[8] * x + m[9] * y + m[10] * z + m[11],
        )

    m = mat16(A)
    cx = query_pts[..., 0] - m[3]
    cy = query_pts[..., 1] - m[7]
    cz = query_pts[..., 2] - m[11]
    cx, cy, cz = inv_apply(m, cx, cy, cz)
    if query_dirs is not None:
        dx, dy, dz = (query_dirs[..., i] for i in range(3))
        dx, dy, dz = inv_apply(m, dx, dy, dz)

    def gathered_offsets(offsets_bv3):  # (B, V, 3) -> three (B, M) components
        flat = offsets_bv3.reshape(B * V, 3)
        ids = vert_ids + (jnp.arange(B, dtype=jnp.int32) * V)[:, None]
        out = jnp.take(flat, ids.reshape(-1), axis=0).reshape(B, M, 3)
        return out[..., 0], out[..., 1], out[..., 2]

    rot_mats = batch_rodrigues(poses.reshape(B, -1, 3))
    ox, oy, oz = gathered_offsets(_pose_offsets(model, rot_mats))
    cx, cy, cz = cx - ox, cy - oy, cz - oz

    shapedirs = jnp.asarray(model.shapedirs, jnp.float32)
    shape_off = jnp.einsum("vdn,bn->bvd", shapedirs, betas)
    ox, oy, oz = gathered_offsets(shape_off)
    cx, cy, cz = cx - ox, cy - oy, cz - oz

    big_rot = batch_rodrigues(big_poses.reshape(B, -1, 3))
    ox, oy, oz = gathered_offsets(_pose_offsets(model, big_rot))
    cx, cy, cz = cx + ox, cy + oy, cz + oz

    A_big, _ = transform_params(model, big_poses, jnp.zeros_like(betas), expression)
    mb = mat16(A_big)
    cx, cy, cz = fwd_apply(mb, cx, cy, cz)
    can = jnp.stack([cx, cy, cz], axis=-1)
    if query_dirs is not None:
        dx2 = mb[0] * dx + mb[1] * dy + mb[2] * dz
        dy2 = mb[4] * dx + mb[5] * dy + mb[6] * dz
        dz2 = mb[8] * dx + mb[9] * dy + mb[10] * dz
        return can, jnp.stack([dx2, dy2, dz2], axis=-1)
    return can, None


def make_eval_deform_fn(model: BodyModel):
    """Pose-parameterized deform_fn for the eval/decode renderers.

    Returns ``deform(pts (M,3), dirs (M,3)|None, args) -> (pts, dirs)`` where
    ``args`` is a pytree of the item's SMPL tensors — a TRACED renderer operand,
    so one compilation serves every view/pose (closing over per-view arrays would
    recompile + embed them as HLO constants). ``args`` keys: ``poses`` (J*3,),
    ``betas`` (n,), ``t_poses`` (J*3,), ``R`` (3,3), ``Th`` (1,3) or (3,),
    ``smpl_verts`` (V,3) — posed verts in SMPL space.

    Semantics follow renderer.py:124-140: world -> SMPL space via ``(x - Th) @ R``
    (including the reference's quirk of translating the view DIRECTIONS by Th),
    then inverse-LBS into the shared big pose.
    """

    def deform(pts, dirs, args):
        Rg = jnp.asarray(args["R"], jnp.float32).reshape(3, 3)
        Th = jnp.asarray(args["Th"], jnp.float32).reshape(1, 3)
        pts = (pts - Th) @ Rg
        if dirs is not None:
            dirs = (dirs - Th) @ Rg
        # B=1 through the BATCHED path: its bf16 MXU 1-NN + closed-form 3x3
        # inverse is ~5x the single-item (fp32 KNN, LU) variant at render scale.
        can, cdirs = deform_to_canonical_batched(
            model,
            jnp.asarray(args["poses"], jnp.float32).reshape(1, -1),
            jnp.asarray(args["betas"], jnp.float32).reshape(1, -1),
            jnp.asarray(args["t_poses"], jnp.float32).reshape(1, -1),
            jnp.asarray(args["smpl_verts"], jnp.float32)[None],
            pts[None],
            None if dirs is None else dirs[None],
        )
        return can[0], (None if cdirs is None else cdirs[0])

    return deform


def nearest_vertex(
    query: jnp.ndarray, verts: jnp.ndarray, tile: int = 8192
) -> jnp.ndarray:
    """Index of the nearest vertex for each query point.

    Args:
      query: (M, 3); verts: (V, 3). ``tile`` bounds the (tile, V) distance block.

    Returns int32 indices (M,).
    """
    M = query.shape[0]
    v_sq = (verts * verts).sum(-1)  # (V,)

    def one_tile(q: jnp.ndarray) -> jnp.ndarray:
        # (tile, V) partial distances on the MXU.
        d = v_sq[None, :] - 2.0 * (q @ verts.T)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    if M <= tile:
        return one_tile(query)
    pad = (-M) % tile
    q = jnp.pad(query, ((0, pad), (0, 0)))
    out = jax.lax.map(one_tile, q.reshape(-1, tile, 3))
    return out.reshape(-1)[:M]


def deform_to_canonical(
    model: BodyModel,
    poses: jnp.ndarray,
    betas: jnp.ndarray,
    big_poses: jnp.ndarray,
    smpl_verts: jnp.ndarray,
    query_pts: jnp.ndarray,
    query_dirs: Optional[jnp.ndarray] = None,
    expression: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Inverse-LBS observation points to the canonical big pose.

    Single-item version (vmap over a batch); reproduces renderer.py:60-122:
      1. 1-NN skinning-weight lookup against the posed SMPL-space vertices,
      2. inverse rigid skinning to the T-pose,
      3. subtract pose + shape blendshape offsets (to the mean shape),
      4. add the big pose's pose offsets and forward-skin into the big pose.

    Args:
      poses: (J*3,) axis-angle of the observed pose.
      betas: (n_betas,) shape of the observed body.
      big_poses: (J*3,) the shared canonical pose.
      smpl_verts: (V, 3) posed SMPL vertices in SMPL space (already R/Th removed).
      query_pts: (M, 3) sample points in SMPL space.
      query_dirs: optional (M, 3) view directions to co-rotate.

    Returns (canonical points (M, 3), canonical dirs or None).
    """
    poses_b = poses[None]
    betas_b = betas[None]
    expr_b = None if expression is None else expression[None]

    A, _ = transform_params(model, poses_b, betas_b, expr_b)  # (1, J, 4, 4)
    J = A.shape[1]

    vert_ids = nearest_vertex(query_pts, smpl_verts)  # (M,)
    bweights = jnp.asarray(model.weights, jnp.float32)[vert_ids]  # (M, J)

    # Per-point blended transform, then invert the rotation part.
    A_pt = (bweights @ A[0].reshape(J, 16)).reshape(-1, 4, 4)  # (M, 4, 4)
    can = query_pts - A_pt[:, :3, 3]
    R_inv = jnp.linalg.inv(A_pt[:, :3, :3])
    can = (R_inv @ can[..., None])[..., 0]
    if query_dirs is not None:
        query_dirs = (R_inv @ query_dirs[..., None])[..., 0]

    # Remove pose blendshape offsets of the observed pose (gathered per 1-NN vertex).
    rot_mats = batch_rodrigues(poses_b.reshape(1, -1, 3))
    pose_off = _pose_offsets(model, rot_mats)[0][vert_ids]  # (M, 3)
    can = can - pose_off

    # Remove shape offsets (to the mean shape).
    shapedirs = jnp.asarray(model.shapedirs, jnp.float32)
    shape_off = jnp.einsum("vdn,n->vd", shapedirs, betas)[vert_ids]
    can = can - shape_off

    # Forward into the big pose (zero shape), adding its pose offsets.
    big_b = big_poses[None]
    big_rot = batch_rodrigues(big_b.reshape(1, -1, 3))
    big_off = _pose_offsets(model, big_rot)[0][vert_ids]
    can = can + big_off

    A_big, _ = transform_params(model, big_b, jnp.zeros_like(betas_b), expr_b)
    A_pt = (bweights @ A_big[0].reshape(J, 16)).reshape(-1, 4, 4)
    can = (A_pt[:, :3, :3] @ can[..., None])[..., 0] + A_pt[:, :3, 3]
    if query_dirs is not None:
        query_dirs = (A_pt[:, :3, :3] @ query_dirs[..., None])[..., 0]
        return can, query_dirs
    return can, None

"""Generic linear-blend-skinning body model covering SMPL and SMPL-X.

One parameter-array container + pure functions replace the reference's three body-model
implementations (recon_NeRF/smpl/smpl_numpy.py:46-97, recon_NeRF/smplx/body_models.py,
lib/renderer.py:373-401). SMPL has J=24 joints / 6890 verts; SMPL-X J=55 / 10475 with
extra expression blendshapes — both are just different array shapes here.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from humanliff_tpu.bodymodel.rotations import batch_rodrigues
from humanliff_tpu.bodymodel.kinematics import rigid_transform_chain


@dataclass(frozen=True, eq=False)  # eq=False: hashable by id (usable as jit static arg)
class BodyModel:
    """Static body-model arrays (host numpy; moved to device on first use).

    Attributes:
      v_template: (V, 3) rest-pose template vertices.
      shapedirs: (V, 3, n_betas) shape blendshapes.
      posedirs: (V*3, (J-1)*9) pose blendshapes (reference layout: renderer.py:90).
      J_regressor: (J, V).
      weights: (V, J) skinning weights.
      parents: (J,) kinematic tree.
      expr_dirs: optional (V, 3, n_expr) expression blendshapes (SMPL-X).
      faces: optional (F, 3) triangle indices (for mesh export only).
    """

    v_template: np.ndarray
    shapedirs: np.ndarray
    posedirs: np.ndarray
    J_regressor: np.ndarray
    weights: np.ndarray
    parents: np.ndarray
    expr_dirs: Optional[np.ndarray] = None
    faces: Optional[np.ndarray] = None

    @property
    def num_joints(self) -> int:
        return int(self.parents.shape[0])

    @property
    def num_verts(self) -> int:
        return int(self.v_template.shape[0])


def _shaped_template(
    model: BodyModel, betas: jnp.ndarray, expression: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Apply shape (and expression) blendshapes: (B, V, 3)."""
    # Slice blendshape banks to the caller's coefficient count (smplx ships 300
    # shape dirs but models typically use num_betas=10).
    shapedirs = jnp.asarray(model.shapedirs, jnp.float32)[..., : betas.shape[-1]]
    v = jnp.asarray(model.v_template, jnp.float32)[None] + jnp.einsum(
        "vdn,bn->bvd", shapedirs, betas
    )
    if expression is not None and model.expr_dirs is not None:
        expr_dirs = jnp.asarray(model.expr_dirs, jnp.float32)[
            ..., : expression.shape[-1]
        ]
        v = v + jnp.einsum("vdn,bn->bvd", expr_dirs, expression)
    return v


def _pose_offsets(model: BodyModel, rot_mats: jnp.ndarray) -> jnp.ndarray:
    """Pose-dependent corrective offsets: (B, V, 3) (renderer.py:86-92)."""
    B = rot_mats.shape[0]
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, (J-1)*9)
    posedirs = jnp.asarray(model.posedirs, jnp.float32)  # (V*3, (J-1)*9)
    return (pose_feature @ posedirs.T).reshape(B, -1, 3)


def transform_params(
    model: BodyModel,
    poses: jnp.ndarray,
    betas: jnp.ndarray,
    expression: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-joint skinning transforms A and rest joints for given pose/shape.

    Mirrors ``get_transform_params_torch`` (renderer.py:373-401) minus the global
    (R, Th) which callers apply themselves.

    Args:
      poses: (B, J*3) axis-angle.
      betas: (B, n_betas).

    Returns (A (B, J, 4, 4), joints (B, J, 3)).
    """
    B = poses.shape[0]
    v_shaped = _shaped_template(model, betas, expression)
    rot_mats = batch_rodrigues(poses.reshape(B, -1, 3))
    joints = jnp.einsum(
        "jv,bvd->bjd", jnp.asarray(model.J_regressor, jnp.float32), v_shaped
    )
    A = rigid_transform_chain(rot_mats, joints, model.parents)
    return A, joints


def lbs_forward(
    model: BodyModel,
    poses: jnp.ndarray,
    betas: jnp.ndarray,
    expression: jnp.ndarray | None = None,
    global_rot: jnp.ndarray | None = None,
    global_trans: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full LBS forward: posed vertices and joints.

    Matches smpl_numpy.py:46-97 / smplx lbs.py:156. ``global_rot`` is (B, 3, 3) and
    ``global_trans`` (B, 3) applied as ``v @ R^T + t`` after skinning.

    Returns (verts (B, V, 3), joints (B, J, 3)).
    """
    B = poses.shape[0]
    v_shaped = _shaped_template(model, betas, expression)
    rot_mats = batch_rodrigues(poses.reshape(B, -1, 3))
    joints = jnp.einsum(
        "jv,bvd->bjd", jnp.asarray(model.J_regressor, jnp.float32), v_shaped
    )
    A = rigid_transform_chain(rot_mats, joints, model.parents)

    v_posed = v_shaped + _pose_offsets(model, rot_mats)

    W = jnp.asarray(model.weights, jnp.float32)  # (V, J)
    T = jnp.einsum("vj,bjxy->bvxy", W, A)  # (B, V, 4, 4)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = (T @ v_h[..., None])[..., :3, 0]

    posed_joints = jnp.einsum(
        "jv,bvd->bjd", jnp.asarray(model.J_regressor, jnp.float32), verts
    )
    if global_rot is not None:
        verts = jnp.einsum("bij,bvj->bvi", global_rot, verts)
        posed_joints = jnp.einsum("bij,bvj->bvi", global_rot, posed_joints)
    if global_trans is not None:
        verts = verts + global_trans[:, None]
        posed_joints = posed_joints + global_trans[:, None]
    return verts, posed_joints


_MODEL_CACHE: dict = {}


def make_synthetic_body_model(
    J: int = 4, V: int = 64, n_betas: int = 5, seed: int = 0
) -> BodyModel:
    """Small random kinematic-chain body model (no assets) for tests and the
    driver's multi-chip dryrun of the canonical (TightCap) path."""
    rng = np.random.default_rng(seed)
    parents = np.arange(-1, J - 1)
    parents[0] = 0  # root points at itself like SMPL kintree[0]
    joints = np.cumsum(rng.uniform(0.1, 0.3, size=(J, 3)), axis=0).astype(np.float32)
    verts = (
        joints[rng.integers(0, J, size=V)] + rng.normal(scale=0.05, size=(V, 3))
    ).astype(np.float32)

    # Nearest-vertex one-hot regressor, then re-derive joints so it is exact.
    Jreg = np.zeros((J, V), np.float32)
    for j in range(J):
        d = np.linalg.norm(verts - joints[j], axis=1)
        Jreg[j, np.argmin(d)] = 1.0

    d = np.linalg.norm(verts[:, None] - (Jreg @ verts)[None], axis=-1)
    w = np.exp(-d / 0.05)
    weights = (w / w.sum(1, keepdims=True)).astype(np.float32)

    shapedirs = rng.normal(scale=0.01, size=(V, 3, n_betas)).astype(np.float32)
    posedirs = rng.normal(scale=0.001, size=(V * 3, (J - 1) * 9)).astype(np.float32)
    return BodyModel(
        v_template=verts,
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=Jreg,
        weights=weights,
        parents=parents,
    )


def find_smplx_model(model_dir: str, gender: str) -> str:
    """Locate ``SMPLX_{GENDER}`` under ``model_dir``, probing the standard
    ``.npz`` distribution first, then the pkl layout."""
    for ext in (".npz", ".pkl"):
        cand = os.path.join(model_dir, f"SMPLX_{gender.upper()}{ext}")
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"no SMPLX_{gender.upper()}.npz/.pkl under {model_dir}"
    )


def load_body_model(path: str) -> BodyModel:
    """Load a SMPL/SMPL-X model file into arrays.

    Supports the SMPL pickle format (latin1, renderer.py:352-371) and the smplx
    ``.npz`` distribution format (SMPLX_{GENDER}.npz, used by the vendored smplx
    with ext='npz', SynBody_dataset.py:85-99). Cached per absolute path — the
    decode/eval loops construct datasets per layer and the model is immutable.
    """
    cache_key = os.path.abspath(path)
    cached = _MODEL_CACHE.get(cache_key)
    if cached is not None:
        return cached
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            u = pickle._Unpickler(f)
            u.encoding = "latin1"
            data = u.load()

    J_reg = data["J_regressor"]
    if hasattr(J_reg, "toarray"):
        J_reg = J_reg.toarray()

    shapedirs = np.asarray(data["shapedirs"], np.float32)
    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 3:  # (V, 3, (J-1)*9) -> reference layout (V*3, (J-1)*9)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1])

    expr_dirs = None
    if shapedirs.shape[-1] > 300:  # smplx convention: betas | expressions
        expr_dirs = shapedirs[..., 300:310]
        shapedirs = shapedirs[..., :300]

    model = BodyModel(
        v_template=np.asarray(data["v_template"], np.float32),
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=np.asarray(J_reg, np.float32),
        weights=np.asarray(data["weights"], np.float32),
        parents=np.asarray(data["kintree_table"])[0].astype(np.int32),
        expr_dirs=expr_dirs,
        faces=np.asarray(data["f"], np.int32) if "f" in data else None,
    )
    _MODEL_CACHE[cache_key] = model
    return model

"""SynBody dataset: multi-view layered-human images + SMPL-X params.

Mirrors recon_NeRF/lib/SynBody_dataset.py: directory layout
``{root}/{subject}/{layer_dir}/{img,mask}/camera{v:04d}/{pose:04d}.{jpg,png}`` with
``cameras.json`` intrinsics and ``smplx.npz`` body parameters; layer directories
``person``, ``person-pants``, ``person-pants-shirt``, ``person-pants-shirt-shoes``
(:253-264). Images downscale by ``image_scaling`` (0.5) with K rescaled (:274-279).

Emits the humanliff_tpu stage-1 batch schema (flat arrays, fixed n_rays). SynBody
trains in world space (use_canonical_space=False): box_warp is the per-pose world
bounds; vertices/params are still emitted for completeness.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from humanliff_tpu.bodymodel.smpl import BodyModel, lbs_forward
from humanliff_tpu.data.raygen import full_image_rays, sample_ray_batch_train

LAYER_DIRS = ["person", "person-pants", "person-pants-shirt", "person-pants-shirt-shoes"]

SMPLX_POSE_KEYS = [  # concatenation order of the 165-d full pose (55 joints)
    "global_orient", "body_pose", "jaw_pose", "leye_pose", "reye_pose",
    "left_hand_pose", "right_hand_pose",
]


def smplx_big_pose(num_joints: int = 55) -> np.ndarray:
    """Big pose as a full-pose vector: body_pose[2,5,20,23] set (SynBody_dataset.py:221-224),
    i.e. full-pose indices shifted by the 3 global-orient dims."""
    pose = np.zeros(num_joints * 3, np.float32)
    for idx, deg in ((3 + 2, 45.0), (3 + 5, -45.0), (3 + 20, -30.0), (3 + 23, 30.0)):
        if idx < pose.shape[0]:  # toy models with few joints skip arm entries
            pose[idx] = np.deg2rad(deg)
    return pose


def _bounds_from_verts(verts: np.ndarray, pad: float = 0.05, y_extra: float = 0.05):
    mn = verts.min(0) - pad
    mx = verts.max(0) + pad
    mn[1] -= y_extra
    mx[1] += y_extra
    return np.stack([mn, mx], 0).astype(np.float32)


@dataclass
class SynBodyDataset:
    data_root: str
    body_models: Dict[str, BodyModel]  # by gender: 'male'/'female'/'neutral'
    num_instances: int = 1
    pose_start: int = 0
    pose_interval: int = 1
    poses_num: int = 1
    views_num: int = 185
    n_rays: int = 2048
    image_scaling: float = 0.5
    layer_idx: Optional[int] = None
    split: str = "train"

    def __post_init__(self):
        all_root = os.path.dirname(self.data_root)
        with open(os.path.join(all_root, "human_list.txt")) as f:
            dirs = [x.strip() for x in f.readlines()[: self.num_instances]]
        self.subject_roots: List[str] = [os.path.join(all_root, d) for d in dirs]
        self.cams = [
            json.load(open(os.path.join(r, "cameras.json"))) for r in self.subject_roots
        ]
        self.num_layers = 4 if self.layer_idx is None else 1

        # Canonical big-pose vertices/bounds from the neutral model.
        model = self.body_models["neutral"]
        self.t_pose = smplx_big_pose(model.num_joints)
        t_verts, _ = lbs_forward(
            model,
            self.t_pose[None],
            np.zeros((1, model.shapedirs.shape[-1]), np.float32),
            expression=np.zeros((1, 10), np.float32) if model.expr_dirs is not None else None,
        )
        self.t_vertices = np.asarray(t_verts[0], np.float32)
        self.t_world_bounds = _bounds_from_verts(self.t_vertices)
        self._smplx_cache: Dict[str, dict] = {}

    def __len__(self) -> int:
        return self.num_instances * self.num_layers * self.poses_num * self.views_num

    def _decompose(self, index: int):
        nv = self.views_num
        per_layer = self.poses_num * nv
        per_subject = self.num_layers * per_layer
        s = index // per_subject
        rem = index - s * per_subject
        layer = rem // per_layer
        rem -= layer * per_layer
        pose = (rem // nv) * self.pose_interval + self.pose_start
        view = index % nv
        if self.layer_idx is not None:
            layer = self.layer_idx
        return s, layer, pose, view

    def _smplx_params(self, subject: int, pose_index: int):
        root = self.subject_roots[subject]
        if root not in self._smplx_cache:
            z = np.load(os.path.join(root, "smplx.npz"), allow_pickle=True)
            self._smplx_cache[root] = {
                "params": dict(z)["smplx"].item(),
                "gender": dict(z)["meta"].item()["gender"],
            }
        entry = self._smplx_cache[root]
        p = entry["params"]
        pose_parts = [
            np.asarray(p[k][pose_index], np.float32).reshape(-1)
            for k in SMPLX_POSE_KEYS
        ]
        full_pose = np.concatenate(pose_parts)
        betas = np.asarray(p["betas"], np.float32).reshape(-1)
        expr = np.asarray(p["expression"][pose_index], np.float32).reshape(-1)
        transl = np.asarray(p["transl"][pose_index], np.float32).reshape(-1)
        return full_pose, betas, expr, transl, entry["gender"]

    def item(self, index: int, rng: np.random.Generator | None = None) -> Dict[str, np.ndarray]:
        import cv2
        import imageio.v2 as imageio

        rng = rng or np.random.default_rng()
        s, layer, pose_idx, view = self._decompose(index)
        root = self.subject_roots[s]
        cam = self.cams[s][f"camera{view:04d}"]

        ld = LAYER_DIRS[layer]
        img_path = os.path.join(root, ld, "img", f"camera{view:04d}", f"{pose_idx:04d}.jpg")
        msk_path = os.path.join(root, ld, "mask", f"camera{view:04d}", f"{pose_idx:04d}.png")
        img = np.asarray(imageio.imread(img_path), np.float32) / 255.0
        msk = np.asarray(imageio.imread(msk_path))
        msk = (msk != 0).astype(np.float32)
        if msk.ndim == 3:
            msk = msk[..., 0]
        img[msk == 0] = 0

        K = np.asarray(cam["K"], np.float64).copy()
        R = np.asarray(cam["R"], np.float64)
        T = np.asarray(cam["T"], np.float64).reshape(3, 1)

        H, W = img.shape[:2]
        H2, W2 = int(H * self.image_scaling), int(W * self.image_scaling)
        if (H2, W2) != (H, W):
            img = cv2.resize(img, (W2, H2), interpolation=cv2.INTER_AREA)
            msk = cv2.resize(msk, (W2, H2), interpolation=cv2.INTER_NEAREST)
            K[:2] = K[:2] * self.image_scaling

        full_pose, betas, expr, transl, gender = self._smplx_params(s, pose_idx)
        model = self.body_models[gender]
        verts, _ = lbs_forward(
            model,
            full_pose[None],
            betas[None],
            expression=expr[None] if model.expr_dirs is not None else None,
            global_trans=transl[None],
        )
        verts = np.asarray(verts[0], np.float32)
        world_bounds = _bounds_from_verts(verts)

        if self.split == "train":
            rays = sample_ray_batch_train(
                img, msk, K, R, T, world_bounds, self.n_rays, rng=rng
            )
            out = {
                "instance_idx": np.int32(s),
                "layer_idx": np.int32(layer),
                "rays_o": rays["ray_o"],
                "rays_d": rays["ray_d"],
                "near": rays["near"],
                "far": rays["far"],
                "rgb": rays["rgb"],
                "bkgd_msk": rays["bkgd"],
                "ray_mask": rays["ray_mask"],
                "box_warp": world_bounds,
            }
        else:
            ray_o, ray_d, near, far, mask = full_image_rays(
                H2, W2, K, R, T, world_bounds
            )
            out = {
                "instance_idx": np.int32(s),
                "layer_idx": np.int32(layer),
                "rays_o": ray_o,
                "rays_d": ray_d,
                "near": near,
                "far": far,
                "rgb": img.reshape(-1, 3).astype(np.float32),
                "bkgd_msk": msk.reshape(-1).astype(np.float32),
                "ray_mask": mask.astype(np.float32),
                "box_warp": world_bounds,
                "hw": np.asarray([H2, W2], np.int32),
            }
        return out

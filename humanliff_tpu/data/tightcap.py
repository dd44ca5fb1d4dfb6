"""TightCap dataset: canonical-space layered humans with on-the-fly layer compositing.

Mirrors recon_NeRF/lib/TightCap_dataset.py: subjects listed in
``TightCap_human_list.txt``; cameras under ``person-top-bottom-shoes/cameras.json``
(:51); SMPL (not SMPL-X) fits from ``person-top-bottom-shoes/outputs_re_fitting/
refit_smpl_2nd.npz``; y-bound padding 0.1 (:102-103). Layer images composite from
garment masks (:233-298): layer k erases the not-yet-added garments' exclusive pixels
and paints garment-occluded skin the constant color (0.607186, 0.49289057, 0.43795943).

TightCap trains in canonical space: batches carry SMPL pose/shape/verts and global
(R, Th) for inverse-LBS canonicalization, with box_warp = the big-pose bounds.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from humanliff_tpu.bodymodel.bigpose import big_pose_params
from humanliff_tpu.bodymodel.smpl import BodyModel, lbs_forward
from humanliff_tpu.data.raygen import full_image_rays, sample_ray_batch_train

SKIN_COLOR = np.array([0.607186, 0.49289057, 0.43795943], np.float32)
FULL_DIR = "person-top-bottom-shoes"


def composite_layer_image(
    layer: int, img: np.ndarray, full_mask: np.ndarray, garment_masks: Dict[str, np.ndarray]
):
    """Compose the layer-k image from the fully-dressed capture + garment masks.

    ``garment_masks`` has keys 'naked', 'top', 'bottom', 'shoes' (binary float).
    Returns (img, msk).
    """
    img = img.copy()
    naked = garment_masks["naked"]
    top = garment_masks["top"]
    bottom = garment_masks["bottom"]
    shoes = garment_masks["shoes"]

    if layer == 3:
        msk = full_mask
        img[msk == 0] = 0
        return img, msk

    # Garments not yet present at this layer get erased / skin-painted.
    if layer == 0:
        absent = [top, bottom, shoes]
    elif layer == 1:
        absent = [top, shoes]
    else:  # layer == 2
        absent = [shoes]

    for g in absent:
        img[(g == 1) & ((naked + g) == 1)] = 0
    overlap = naked + sum(absent)
    img[overlap >= 2] = SKIN_COLOR
    img[full_mask == 0] = 0
    msk = np.zeros_like(full_mask)
    msk[img.sum(-1) != 0] = 1
    return img, msk


def _bounds_from_verts(verts: np.ndarray, pad: float = 0.05, y_extra: float = 0.1):
    mn = verts.min(0) - pad
    mx = verts.max(0) + pad
    mn[1] -= y_extra
    mx[1] += y_extra
    return np.stack([mn, mx], 0).astype(np.float32)


@dataclass
class TightCapDataset:
    data_root: str
    body_model: BodyModel
    num_instances: int = 1
    pose_start: int = 0
    pose_interval: int = 1
    poses_num: int = 1
    views_num: int = 382
    n_rays: int = 2048
    image_scaling: float = 1.0
    layer_idx: Optional[int] = None
    split: str = "train"

    def __post_init__(self):
        all_root = os.path.dirname(self.data_root)
        with open(os.path.join(all_root, "TightCap_human_list.txt")) as f:
            dirs = [x.strip() for x in f.readlines()[: self.num_instances]]
        self.subject_roots = [os.path.join(all_root, d) for d in dirs]
        self.cams = [
            json.load(open(os.path.join(r, FULL_DIR, "cameras.json")))
            for r in self.subject_roots
        ]
        self.num_layers = 4 if self.layer_idx is None else 1

        self.t_pose = big_pose_params(self.body_model.num_joints * 3)
        t_verts, _ = lbs_forward(
            self.body_model,
            self.t_pose[None],
            np.zeros((1, self.body_model.shapedirs.shape[-1]), np.float32),
        )
        self.t_vertices = np.asarray(t_verts[0], np.float32)
        self.t_world_bounds = _bounds_from_verts(self.t_vertices)
        self._smpl_cache: Dict[str, dict] = {}

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

    def _smpl_params(self, subject: int, pose_index: int):
        root = self.subject_roots[subject]
        if root not in self._smpl_cache:
            path = os.path.join(
                root, FULL_DIR, "outputs_re_fitting", "refit_smpl_2nd.npz"
            )
            self._smpl_cache[root] = dict(np.load(path, allow_pickle=True))["smpl"].item()
        p = self._smpl_cache[root]
        poses = np.zeros(self.body_model.num_joints * 3, np.float32)
        poses[:3] = np.asarray(p["global_orient"][pose_index], np.float32).reshape(-1)
        poses[3:] = np.asarray(p["body_pose"][pose_index], np.float32).reshape(-1)
        betas = np.asarray(p["betas"], np.float32).reshape(-1)
        Th = np.asarray(p["transl"][0], np.float32).reshape(3)
        R = np.eye(3, dtype=np.float32)
        return poses, betas, R, Th

    def item(self, index: int, rng: np.random.Generator | None = None) -> Dict[str, np.ndarray]:
        import cv2
        import imageio.v2 as imageio

        rng = rng or np.random.default_rng()
        s, layer, pose_idx, view = self._decompose(index)
        root = self.subject_roots[s]
        cam = self.cams[s][f"camera{view:04d}"]

        def read_mask(d):
            m = np.asarray(
                imageio.imread(
                    os.path.join(root, d, "mask", f"camera{view:04d}", f"{pose_idx:04d}.png")
                )
            )
            m = (m != 0).astype(np.float32)
            return m[..., 0] if m.ndim == 3 else m

        img = (
            np.asarray(
                imageio.imread(
                    os.path.join(root, FULL_DIR, "img", f"camera{view:04d}", f"{pose_idx:04d}.jpg")
                ),
                np.float32,
            )
            / 255.0
        )
        full_mask = read_mask(FULL_DIR)
        garments = {
            "naked": read_mask("person"),
            "top": read_mask("top"),
            "bottom": read_mask("bottom"),
            "shoes": read_mask("shoes"),
        }
        img, msk = composite_layer_image(layer, img, full_mask, garments)

        K = np.asarray(cam["K"], np.float64).copy()
        R_cam = np.asarray(cam["R"], np.float64)
        T_cam = np.asarray(cam["T"], np.float64).reshape(3, 1)

        H, W = img.shape[:2]
        H2, W2 = int(H * self.image_scaling), int(W * self.image_scaling)
        if (H2, W2) != (H, W):
            img = cv2.resize(img, (W2, H2), interpolation=cv2.INTER_AREA)
            msk = cv2.resize(msk, (W2, H2), interpolation=cv2.INTER_NEAREST)
            K[:2] = K[:2] * self.image_scaling

        poses, betas, Rg, Th = self._smpl_params(s, pose_idx)
        verts, _ = lbs_forward(self.body_model, poses[None], betas[None])
        verts_smpl = np.asarray(verts[0], np.float32)  # SMPL space
        verts_world = verts_smpl @ Rg.T + Th
        world_bounds = _bounds_from_verts(verts_world)

        base = {
            "instance_idx": np.int32(s),
            "layer_idx": np.int32(layer),
            "box_warp": self.t_world_bounds,  # canonical-space warp
            "poses": poses,
            "betas": betas,
            "smpl_verts": verts_smpl,
            "R": Rg,
            "Th": Th,
            "t_poses": self.t_pose,
        }
        if self.split == "train":
            rays = sample_ray_batch_train(
                img, msk, K, R_cam, T_cam, world_bounds, self.n_rays, rng=rng
            )
            base.update(
                rays_o=rays["ray_o"], rays_d=rays["ray_d"], near=rays["near"],
                far=rays["far"], rgb=rays["rgb"], bkgd_msk=rays["bkgd"],
                ray_mask=rays["ray_mask"],
            )
        else:
            ray_o, ray_d, near, far, mask = full_image_rays(
                H2, W2, K, R_cam, T_cam, world_bounds
            )
            base.update(
                rays_o=ray_o, rays_d=ray_d, near=near, far=far,
                rgb=img.reshape(-1, 3).astype(np.float32),
                bkgd_msk=msk.reshape(-1).astype(np.float32),
                ray_mask=mask.astype(np.float32),
                hw=np.asarray([H2, W2], np.int32),
            )
        return base

"""Novel-view datasets for decoding generated tri-planes.

Reference: human_diffusion/SynBodyView_datasets.py / TightCapView_datasets.py — fixed
novel views 145-184 (:20) with per-view full-image rays, SMPL(-X) params, per-pose
world bounds, and GT tri-plane access for conditioning (:215-308 / :208-360).

Design differences from the reference:
- ``SynBodyViewDataset`` / ``TightCapViewDataset`` COMPOSE the stage-1 dataset
  classes (data/synbody.py, data/tightcap.py) instead of re-inlining 400 LoC of
  image/SMPL/ray code; the per-item schema is the repo's flat-array test split plus
  the view-dataset extras (x, x_cond, y, t_world_bounds).
- GT tri-planes are NOT all preloaded into memory (a reference wart noted in
  SURVEY.md); they are memmap slices of the packed stage-2 array.
- ``NovelViewCameras`` remains as an explicitly-labeled procedural-orbit fallback
  for decoding samples when no real capture data exists.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from humanliff_tpu.data.raygen import full_image_rays

DEFAULT_NOVEL_VIEWS: List[int] = list(range(145, 185))  # 40 views


@dataclass
class NovelViewCameras:
    """Camera set for rendering generated planes.

    From a subject's cameras.json when real data is present, else a procedural
    orbit matching the reference's view count.
    """

    image_size: int = 512
    cameras_json: Optional[str] = None
    views: Optional[List[int]] = None
    image_scaling: float = 1.0

    def __post_init__(self):
        self.views = self.views or DEFAULT_NOVEL_VIEWS
        self._cams = None
        if self.cameras_json and os.path.exists(self.cameras_json):
            self._cams = json.load(open(self.cameras_json))

    def __len__(self):
        return len(self.views)

    def camera(self, i: int):
        """Returns (K, R, T) for novel view i."""
        view = self.views[i]
        if self._cams is not None:
            cam = self._cams[f"camera{view:04d}"]
            K = np.asarray(cam["K"], np.float64).copy()
            K[:2] *= self.image_scaling
            return (
                K,
                np.asarray(cam["R"], np.float64),
                np.asarray(cam["T"], np.float64).reshape(3, 1),
            )
        # Procedural orbit fallback.
        S = self.image_size
        theta = 2 * np.pi * i / max(len(self.views), 1)
        eye = np.asarray([np.cos(theta), 0.15, np.sin(theta)])
        eye = 3.0 * eye / np.linalg.norm(eye)
        fwd = -eye / np.linalg.norm(eye)
        up = np.asarray([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        R = np.stack([right, -up2, fwd], axis=0)
        T = (-R @ eye).reshape(3, 1)
        f = S * 1.1
        K = np.asarray([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]])
        return K, R, T

    def rays(self, i: int, bounds: np.ndarray) -> Dict[str, np.ndarray]:
        K, R, T = self.camera(i)
        S = self.image_size
        ray_o, ray_d, near, far, mask = full_image_rays(S, S, K, R, T, bounds)
        return {
            "rays_o": ray_o,
            "rays_d": ray_d,
            "near": near,
            "far": far,
            "ray_mask": mask.astype(np.float32),
            "hw": np.asarray([S, S], np.int32),
        }


class _PackedPlanes:
    """Lazy GT-plane access shared by the view datasets.

    ``packed_path`` is the stage-2 packed memmap (data/triplane_data.py); the
    reference instead torch.loads EVERY subject's fine-tuned .tar into RAM at
    dataset construction (SynBodyView_datasets.py:103-110).
    """

    def __init__(self, packed_path: Optional[str]):
        self.planes = None
        if packed_path:
            self.planes = np.load(packed_path, mmap_mode="r")  # (N, L, C, D, D)
            assert self.planes.ndim == 5, self.planes.shape

    def pair(self, subject: int, layer: int):
        """(x, x_cond) as (C, D, D) fp32 NCHW, x_cond zeros for layer 0
        (SynBodyView_datasets.py:283-287)."""
        if self.planes is None:
            return None, None
        x = np.asarray(self.planes[subject, layer], np.float32)
        cond = (
            np.zeros_like(x)
            if layer == 0
            else np.asarray(self.planes[subject, layer - 1], np.float32)
        )
        return x, cond


class _ViewDatasetBase:
    """Shared novel-view item logic: index decomposition over (subject, pose,
    view), base-dataset delegation, and GT-plane pair attachment. Subclasses
    set ``self._base`` (a stage-1 dataset in split='test') and ``self._planes``
    in ``__post_init__``."""

    def __len__(self) -> int:
        return self.num_instances * self.pose_num * len(self.output_views)

    def _decompose(self, index: int):
        nv = len(self.output_views)
        s = index // (self.pose_num * nv)
        pose_slot = (index // nv) % self.pose_num
        view = self.output_views[index % nv]
        layer = 0 if self.layer_idx is None else int(self.layer_idx)
        return s, layer, pose_slot, view

    def item(self, index: int, rng=None) -> Dict[str, np.ndarray]:
        s, layer, pose_slot, view = self._decompose(index)
        b = self._base
        base_index = (
            (s * b.num_layers + layer) * b.poses_num + pose_slot
        ) * b.views_num + view
        out = b.item(base_index)
        x, x_cond = self._planes.pair(s, layer)
        if x is not None:
            out["x"] = x
            out["x_cond"] = x_cond
        out["y"] = np.int32(layer)
        out["view_index"] = np.int32(view)
        out["t_world_bounds"] = self.t_world_bounds
        return out


@dataclass
class SynBodyViewDataset(_ViewDatasetBase):
    """Full-fidelity novel-view items for decoding generated SynBody planes.

    Per item (SynBodyView_datasets.py:215-308): full-image rays against the
    subject's per-pose SMPL-X world bounds, the GT plane pair (x, x_cond), the
    layer label y, plus everything the stage-1 test split already carries.
    World-space rendering: ``box_warp`` is the per-pose world bounds.
    """

    data_root: str
    body_models: Dict  # gender -> BodyModel
    triplane_packed: Optional[str] = None
    num_instances: int = 1
    pose_start: int = 0
    pose_interval: int = 5
    pose_num: int = 1
    image_scaling: float = 0.5
    layer_idx: Optional[int] = None
    output_views: List[int] = field(default_factory=lambda: list(DEFAULT_NOVEL_VIEWS))

    def __post_init__(self):
        from humanliff_tpu.data.synbody import SynBodyDataset

        self._base = SynBodyDataset(
            data_root=self.data_root,
            body_models=self.body_models,
            num_instances=self.num_instances,
            pose_start=self.pose_start,
            pose_interval=self.pose_interval,
            poses_num=self.pose_num,
            views_num=max(self.output_views) + 1,
            image_scaling=self.image_scaling,
            layer_idx=None,  # layer handled here (cloth_layer_num=1 + override)
            split="test",
        )
        self._planes = _PackedPlanes(self.triplane_packed)
        self.t_world_bounds = self._base.t_world_bounds
        self.t_vertices = self._base.t_vertices



@dataclass
class TightCapViewDataset(_ViewDatasetBase):
    """Full-fidelity novel-view items for decoding generated TightCap planes.

    Canonical-space rendering (TightCapView_datasets.py:34-37, :208-360): items
    carry SMPL pose/shape/verts + global (R, Th) for inverse-LBS deformation and
    ``box_warp`` = big-pose bounds (y-pad 0.1); near/far still come from the
    POSED world bounds.
    """

    data_root: str
    body_model: object  # SMPL BodyModel
    triplane_packed: Optional[str] = None
    num_instances: int = 1
    pose_start: int = 0
    pose_interval: int = 5
    pose_num: int = 1
    image_scaling: float = 1.0
    layer_idx: Optional[int] = None
    output_views: List[int] = field(default_factory=lambda: list(DEFAULT_NOVEL_VIEWS))

    def __post_init__(self):
        from humanliff_tpu.data.tightcap import TightCapDataset

        self._base = TightCapDataset(
            data_root=self.data_root,
            body_model=self.body_model,
            num_instances=self.num_instances,
            pose_start=self.pose_start,
            pose_interval=self.pose_interval,
            poses_num=self.pose_num,
            views_num=max(self.output_views) + 1,
            image_scaling=self.image_scaling,
            layer_idx=None,
            split="test",
        )
        self._planes = _PackedPlanes(self.triplane_packed)
        self.t_world_bounds = self._base.t_world_bounds
        self.t_vertices = self._base.t_vertices


"""Dataset loader tests against fabricated on-disk fixtures (SynBody & TightCap
directory layouts with tiny images, cameras.json, and body-param files)."""

import json
import os

import numpy as np
import pytest

from humanliff_tpu.bodymodel.smpl import BodyModel

imageio = pytest.importorskip("imageio.v2")


def _toy_body(V=32, J=4, n_betas=10, n_expr=10, smplx=False, seed=0):
    rng = np.random.default_rng(seed)
    parents = np.arange(-1, J - 1)
    parents[0] = 0
    verts = rng.normal(scale=0.3, size=(V, 3)).astype(np.float32)
    Jreg = np.zeros((J, V), np.float32)
    for j in range(J):
        Jreg[j, rng.integers(0, V)] = 1.0
    w = np.abs(rng.normal(size=(V, J))).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    return BodyModel(
        v_template=verts,
        shapedirs=rng.normal(scale=0.01, size=(V, 3, n_betas)).astype(np.float32),
        posedirs=rng.normal(scale=0.001, size=(V * 3, (J - 1) * 9)).astype(np.float32),
        J_regressor=Jreg,
        weights=w,
        parents=parents.astype(np.int32),
        expr_dirs=rng.normal(scale=0.005, size=(V, 3, n_expr)).astype(np.float32)
        if smplx
        else None,
    )


def _write_cameras(path, views, size):
    cams = {}
    f = size * 1.5
    for v in range(views):
        theta = 2 * np.pi * v / views
        eye = 2.5 * np.asarray([np.cos(theta), 0.1, np.sin(theta)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.asarray([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        R = np.stack([right, -np.cross(right, fwd), fwd], 0)
        T = (-R @ eye).reshape(3, 1)
        cams[f"camera{v:04d}"] = {
            "K": [[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]],
            "R": R.tolist(),
            "T": T.tolist(),
        }
    json.dump(cams, open(path, "w"))


def _write_view_images(root, layer_dirs, views, poses, size):
    rng = np.random.default_rng(0)
    for ld in layer_dirs:
        for v in range(views):
            os.makedirs(os.path.join(root, ld, "img", f"camera{v:04d}"), exist_ok=True)
            os.makedirs(os.path.join(root, ld, "mask", f"camera{v:04d}"), exist_ok=True)
            for p in range(poses):
                img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
                msk = np.zeros((size, size), np.uint8)
                msk[size // 4 : 3 * size // 4, size // 4 : 3 * size // 4] = 255
                imageio.imwrite(
                    os.path.join(root, ld, "img", f"camera{v:04d}", f"{p:04d}.jpg"), img
                )
                imageio.imwrite(
                    os.path.join(root, ld, "mask", f"camera{v:04d}", f"{p:04d}.png"), msk
                )


def test_synbody_dataset_items(tmp_path):
    from humanliff_tpu.data.synbody import LAYER_DIRS, SynBodyDataset

    size, views, poses = 32, 2, 1
    root = tmp_path / "subjects"
    subj = root / "subj0"
    os.makedirs(subj)
    with open(root / "human_list.txt", "w") as f:
        f.write("subj0\n")
    _write_cameras(subj / "cameras.json", views, size)
    _write_view_images(str(subj), LAYER_DIRS, views, poses, size)

    # J=5 so global+body+jaw+leye+reye (3 each, no hands) == J*3 pose dims.
    body = _toy_body(J=5, smplx=True)
    # smplx.npz with the reference's key structure (SynBody_dataset.py:145-155)
    smplx_params = {
        "global_orient": np.zeros((poses, 3), np.float32),
        "body_pose": np.zeros((poses, 3), np.float32),
        "jaw_pose": np.zeros((poses, 3), np.float32),
        "leye_pose": np.zeros((poses, 3), np.float32),
        "reye_pose": np.zeros((poses, 3), np.float32),
        "left_hand_pose": np.zeros((poses, 0), np.float32),
        "right_hand_pose": np.zeros((poses, 0), np.float32),
        "betas": np.zeros((10,), np.float32),
        "expression": np.zeros((poses, 10), np.float32),
        "transl": np.zeros((poses, 3), np.float32),
    }
    np.savez(
        subj / "smplx.npz",
        smplx=np.asarray(smplx_params, dtype=object),
        meta=np.asarray({"gender": "neutral"}, dtype=object),
    )

    ds = SynBodyDataset(
        data_root=str(subj),
        body_models={"neutral": body, "male": body, "female": body},
        num_instances=1,
        views_num=views,
        poses_num=poses,
        n_rays=64,
        image_scaling=1.0,
    )
    assert len(ds) == 1 * 4 * poses * views

    item = ds.item(0, np.random.default_rng(0))
    assert item["rays_o"].shape == (64, 3)
    assert item["rgb"].shape == (64, 3)
    assert item["layer_idx"] == 0
    assert (item["far"] > item["near"]).all()

    # Index decomposition: last item is the last layer's last view.
    item_last = ds.item(len(ds) - 1, np.random.default_rng(0))
    assert item_last["layer_idx"] == 3

    # Test split returns full-image rays.
    ds.split = "test"
    t_item = ds.item(0, np.random.default_rng(0))
    assert t_item["rays_o"].shape == (size * size, 3)
    assert "hw" in t_item


def test_tightcap_dataset_items(tmp_path):
    from humanliff_tpu.data.tightcap import FULL_DIR, TightCapDataset

    size, views, poses = 32, 2, 1
    root = tmp_path / "subjects"
    subj = root / "tc0"
    os.makedirs(subj)
    with open(root / "TightCap_human_list.txt", "w") as f:
        f.write("tc0\n")
    dirs = [FULL_DIR, "person", "top", "bottom", "shoes"]
    _write_view_images(str(subj), dirs, views, poses, size)
    _write_cameras(os.path.join(str(subj), FULL_DIR, "cameras.json"), views, size)

    body = _toy_body()
    os.makedirs(subj / FULL_DIR / "outputs_re_fitting", exist_ok=True)
    smpl_params = {
        "global_orient": np.zeros((poses, 3), np.float32),
        "body_pose": np.zeros((poses, (body.num_joints - 1) * 3), np.float32),
        "betas": np.zeros((10,), np.float32),
        "transl": np.zeros((poses, 3), np.float32),
    }
    np.savez(
        subj / FULL_DIR / "outputs_re_fitting" / "refit_smpl_2nd.npz",
        smpl=np.asarray(smpl_params, dtype=object),
    )

    ds = TightCapDataset(
        data_root=str(subj),
        body_model=body,
        num_instances=1,
        views_num=views,
        poses_num=poses,
        n_rays=64,
        image_scaling=1.0,
    )
    for layer in range(4):
        idx = layer * poses * views
        item = ds.item(idx, np.random.default_rng(0))
        assert item["layer_idx"] == layer
        assert item["poses"].shape == (body.num_joints * 3,)
        assert item["smpl_verts"].shape == (body.num_verts, 3)
        assert item["rgb"].shape == (64, 3)

"""Full-fidelity view datasets: per-view rays + SMPL bounds + GT-plane access."""

import os

import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")

from test_datasets import _toy_body, _write_cameras, _write_view_images


def _pack_planes(tmp_path, N=1, L=4, C=27, D=8):
    rng = np.random.default_rng(5)
    arr = rng.normal(scale=0.1, size=(N, L, C, D, D)).astype(np.float32)
    path = str(tmp_path / "packed_planes.npy")
    np.save(path, arr)
    return path, arr


def test_synbody_view_dataset(tmp_path):
    from humanliff_tpu.data.synbody import LAYER_DIRS
    from humanliff_tpu.data.view_datasets import SynBodyViewDataset

    size, views, poses = 32, 3, 1
    root = tmp_path / "subjects"
    subj = root / "subj0"
    os.makedirs(subj)
    with open(root / "human_list.txt", "w") as f:
        f.write("subj0\n")
    _write_cameras(subj / "cameras.json", views, size)
    _write_view_images(str(subj), LAYER_DIRS, views, poses, size)

    body = _toy_body(J=5, smplx=True)
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
    packed, arr = _pack_planes(tmp_path)

    for layer in (0, 2):
        ds = SynBodyViewDataset(
            data_root=str(subj),
            body_models={"neutral": body, "male": body, "female": body},
            triplane_packed=packed,
            num_instances=1,
            image_scaling=1.0,
            layer_idx=layer,
            output_views=[1, 2],
        )
        assert len(ds) == 2
        item = ds.item(0)
        # Full-image rays against the per-pose world bounds.
        assert item["rays_o"].shape == (size * size, 3)
        assert (item["far"] >= item["near"]).all()
        assert item["box_warp"].shape == (2, 3)
        assert int(item["view_index"]) == 1
        assert int(item["y"]) == layer
        # GT plane pair follows the x_cond = layer k-1 contract.
        np.testing.assert_allclose(item["x"], arr[0, layer])
        if layer == 0:
            assert not item["x_cond"].any()
        else:
            np.testing.assert_allclose(item["x_cond"], arr[0, layer - 1])
        assert item["t_world_bounds"].shape == (2, 3)


def test_tightcap_view_dataset(tmp_path):
    from humanliff_tpu.data.tightcap import FULL_DIR
    from humanliff_tpu.data.view_datasets import TightCapViewDataset

    size, views, poses = 32, 3, 1
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
    packed, arr = _pack_planes(tmp_path)

    ds = TightCapViewDataset(
        data_root=str(subj),
        body_model=body,
        triplane_packed=packed,
        num_instances=1,
        image_scaling=1.0,
        layer_idx=1,
        output_views=[0, 2],
    )
    assert len(ds) == 2
    item = ds.item(1)
    assert int(item["view_index"]) == 2
    # Canonical-space: box_warp is the big-pose bounds, and the deform inputs
    # (poses/betas/verts/R/Th) ride along for inverse-LBS at decode time.
    np.testing.assert_allclose(item["box_warp"], ds.t_world_bounds)
    for k in ("poses", "betas", "smpl_verts", "R", "Th", "t_poses"):
        assert k in item, k
    np.testing.assert_allclose(item["x"], arr[0, 1])
    np.testing.assert_allclose(item["x_cond"], arr[0, 0])

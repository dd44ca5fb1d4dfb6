"""Body-model tests: Rodrigues vs cv2, kinematics properties, LBS round trips."""

import numpy as np
import jax.numpy as jnp
import pytest

from humanliff_tpu.bodymodel import (
    BodyModel,
    batch_rodrigues,
    rigid_transform_chain,
    lbs_forward,
    transform_params,
    deform_to_canonical,
    big_pose_params,
)


from humanliff_tpu.bodymodel.smpl import make_synthetic_body_model


def _synthetic_model(J=4, V=64, n_betas=5, seed=0):
    """A small random kinematic-chain body model for property tests."""
    return make_synthetic_body_model(J=J, V=V, n_betas=n_betas, seed=seed)


def test_rodrigues_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    vecs = rng.normal(scale=1.5, size=(16, 3)).astype(np.float32)
    ours = np.asarray(batch_rodrigues(jnp.asarray(vecs)))
    for i in range(16):
        ref, _ = cv2.Rodrigues(vecs[i].astype(np.float64))
        np.testing.assert_allclose(ours[i], ref, atol=2e-5)


def test_rodrigues_zero_pose_is_identity():
    R = np.asarray(batch_rodrigues(jnp.zeros((2, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_chain_identity_rotations_fix_rest_points():
    model = _synthetic_model()
    J = model.num_joints
    joints = jnp.asarray(model.J_regressor @ model.v_template)[None]
    rot = jnp.broadcast_to(jnp.eye(3), (1, J, 3, 3))
    A = np.asarray(rigid_transform_chain(rot, joints, model.parents))
    # Identity pose: every joint transform must be the identity.
    np.testing.assert_allclose(A, np.broadcast_to(np.eye(4), (1, J, 4, 4)), atol=1e-5)


def test_lbs_zero_pose_returns_template():
    model = _synthetic_model()
    verts, joints = lbs_forward(
        model, jnp.zeros((1, model.num_joints * 3)), jnp.zeros((1, 5))
    )
    np.testing.assert_allclose(np.asarray(verts[0]), model.v_template, atol=1e-5)


def test_lbs_rigid_consistency():
    # A pure global rotation must rigidly rotate all vertices.
    model = _synthetic_model()
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    R = jnp.asarray(q.astype(np.float32))[None]
    t = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32))
    v0, _ = lbs_forward(model, jnp.zeros((1, model.num_joints * 3)), jnp.zeros((1, 5)))
    v1, _ = lbs_forward(
        model,
        jnp.zeros((1, model.num_joints * 3)),
        jnp.zeros((1, 5)),
        global_rot=R,
        global_trans=t,
    )
    expected = np.asarray(v0[0]) @ np.asarray(q.T) + np.asarray(t)
    np.testing.assert_allclose(np.asarray(v1[0]), expected, atol=1e-5)


def test_canonicalization_roundtrip():
    """Posed vertices must canonicalize exactly onto the big-posed mean-shape verts."""
    model = _synthetic_model(J=4, V=64)
    rng = np.random.default_rng(3)
    J = model.num_joints

    poses = jnp.asarray(rng.normal(scale=0.4, size=(1, J * 3)).astype(np.float32))
    betas = jnp.asarray(rng.normal(scale=1.0, size=(1, 5)).astype(np.float32))
    big = jnp.asarray(rng.normal(scale=0.3, size=(J * 3,)).astype(np.float32))

    posed_verts, _ = lbs_forward(model, poses, betas)
    target_verts, _ = lbs_forward(model, big[None], jnp.zeros((1, 5)))

    can, _ = deform_to_canonical(
        model, poses[0], betas[0], big, posed_verts[0], posed_verts[0]
    )
    np.testing.assert_allclose(np.asarray(can), np.asarray(target_verts[0]), atol=1e-4)


def test_canonicalization_identity_when_already_big_pose():
    # Observing the big pose at mean shape: points and dirs must pass through
    # unchanged (inverse skinning exactly cancels the forward big-pose skinning).
    model = _synthetic_model()
    rng = np.random.default_rng(4)
    J = model.num_joints
    big = jnp.asarray(rng.normal(scale=0.3, size=(J * 3,)).astype(np.float32))
    betas = jnp.zeros((1, 5))
    posed_verts, _ = lbs_forward(model, big[None], betas)
    dirs = jnp.asarray(rng.normal(size=(model.num_verts, 3)).astype(np.float32))
    can, can_dirs = deform_to_canonical(
        model, big, betas[0], big, posed_verts[0], posed_verts[0], query_dirs=dirs
    )
    assert can_dirs is not None and can_dirs.shape == dirs.shape
    np.testing.assert_allclose(np.asarray(can), np.asarray(posed_verts[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(can_dirs), np.asarray(dirs), atol=1e-4)


def test_nearest_vertex_tiling():
    from humanliff_tpu.bodymodel import nearest_vertex

    rng = np.random.default_rng(5)
    verts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32))
    small = np.asarray(nearest_vertex(q, verts, tile=64))  # forces the lax.map path
    big = np.asarray(nearest_vertex(q, verts, tile=4096))  # single-tile path
    d = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(verts)[None], axis=-1)
    ref = d.argmin(1)
    np.testing.assert_array_equal(small, ref)
    np.testing.assert_array_equal(big, ref)


def test_big_pose_values():
    p = big_pose_params()
    assert p.shape == (72,)
    np.testing.assert_allclose(p[5], np.pi / 4)
    np.testing.assert_allclose(p[8], -np.pi / 4)
    np.testing.assert_allclose(p[23], -np.pi / 6)
    np.testing.assert_allclose(p[26], np.pi / 6)
    assert (np.delete(p, [5, 8, 23, 26]) == 0).all()

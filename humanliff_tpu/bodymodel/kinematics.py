"""Forward kinematics: per-joint rigid transforms along a static kinematic tree.

Matches ``get_rigid_transformation_torch`` (recon_NeRF/lib/renderer.py:403-433) /
``batch_rigid_transform`` (smplx/lbs.py:349). The joint tree is static (24 for SMPL,
55 for SMPL-X), so the chain is unrolled at trace time — XLA sees a fixed DAG of 4x4
matmuls, no dynamic control flow.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rigid_transform_chain(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray
) -> jnp.ndarray:
    """World transforms per joint, with the inverse-bind translation folded in.

    Args:
      rot_mats: ``(B, J, 3, 3)`` local joint rotations.
      joints: ``(B, J, 3)`` rest-pose joint locations.
      parents: static ``(J,)`` int array; ``parents[0]`` is the root.

    Returns:
      ``(B, J, 4, 4)`` transforms A such that ``A @ [p, 1]`` skins a rest-pose point
      bound to that joint (translation column already has ``-A_rot @ j`` applied,
      renderer.py:428-431).
    """
    parents = np.asarray(parents)
    B, J = joints.shape[:2]

    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, parents[1:]]], axis=1
    )

    # (B, J, 4, 4) local transforms.
    top = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], joints.dtype), (B, J, 1, 4)
    )
    local = jnp.concatenate([top, bottom], axis=-2)

    # Unrolled chain over the static tree.
    chain = [local[:, 0]]
    for i in range(1, J):
        chain.append(chain[parents[i]] @ local[:, i])
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    # Subtract the transformed rest joint so A acts on rest-pose points directly.
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    shifted = (transforms * joints_h[:, :, None, :]).sum(-1)  # (B, J, 4)
    transforms = transforms.at[..., 3].add(-shifted)
    return transforms

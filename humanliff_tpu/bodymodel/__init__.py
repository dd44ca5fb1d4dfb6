"""SMPL/SMPL-X body-model math in pure jnp: LBS, kinematics, canonicalization.

Replaces the reference's NumPy SMPL (recon_NeRF/smpl/smpl_numpy.py), vendored smplx
(recon_NeRF/smplx/), and the torch canonicalization path (lib/renderer.py:60-140) with
one generic, vmappable linear-blend-skinning model. The CUDA ``knn_points`` dependency
becomes a matmul+argmin 1-NN that runs on the MXU.
"""

from humanliff_tpu.bodymodel.rotations import batch_rodrigues
from humanliff_tpu.bodymodel.kinematics import rigid_transform_chain
from humanliff_tpu.bodymodel.smpl import (
    BodyModel,
    lbs_forward,
    transform_params,
    load_body_model,
)
from humanliff_tpu.bodymodel.canonical import nearest_vertex, deform_to_canonical
from humanliff_tpu.bodymodel.bigpose import big_pose_params

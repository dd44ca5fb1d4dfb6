"""Golden tests: nine-plane sampling vs committed torch-oracle outputs.

The oracle (an independent torch replica of renderer.py:488-549 semantics)
lives in tests/fixtures/gen_golden.py; its outputs are committed in
tests/fixtures/golden.npz so this — SURVEY §7's #1 hard part — is verified
even in torch-free environments.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from humanliff_tpu.ops import project_onto_planes, sample_triplane_features

from golden_cases import NINE_PLANE_CASES, nine_plane_inputs

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.npz")


def test_projection_matches_axis_algebra():
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(64, 3)).astype(np.float32)
    proj = np.asarray(project_onto_planes(jnp.asarray(coords)))
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    np.testing.assert_allclose(proj[0], np.stack([x, y], -1), atol=1e-6)
    np.testing.assert_allclose(proj[1], np.stack([x, z], -1), atol=1e-6)
    np.testing.assert_allclose(proj[2], np.stack([z, y], -1), atol=1e-6)


@pytest.mark.parametrize("case", range(len(NINE_PLANE_CASES)))
def test_matches_reference_nine_plane(case):
    D, C3 = NINE_PLANE_CASES[case]
    planes, coords, box = nine_plane_inputs(D, C3)

    ours = np.asarray(
        sample_triplane_features(
            jnp.asarray(planes), jnp.asarray(coords), jnp.asarray(box)
        )
    )
    with np.load(_FIXTURE) as z:
        ref = z[f"nine_plane_{case}"]
    assert ours.shape == ref.shape == (256, 3 * C3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

"""Deterministic input generation shared by the golden tests and the fixture
generator (tests/fixtures/gen_golden.py).

Inputs are regenerated from seeded ``np.random.default_rng`` on every run (the
Philox/PCG streams are platform-stable), so the committed fixtures only need to
store the torch oracle OUTPUTS — keeping them tiny.
"""

import numpy as np

GRID_SAMPLE_CASES = [(16, 16, 3), (32, 16, 9), (256, 256, 3)]
NINE_PLANE_CASES = [(32, 9), (64, 9)]


def grid_sample_inputs(H, W, C):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(H, W, C)).astype(np.float32)
    # Include far out-of-range coords to exercise zero padding.
    grid = rng.uniform(-1.6, 1.6, size=(512, 2)).astype(np.float32)
    return img, grid


def nine_plane_inputs(D, C3):
    rng = np.random.default_rng(2)
    planes = rng.normal(scale=0.1, size=(3, C3, D, D)).astype(np.float32)
    box = np.asarray([[-0.8, -1.1, -0.5], [0.9, 1.0, 0.7]], dtype=np.float32)
    coords = rng.uniform(-1.2, 1.2, size=(256, 3)).astype(np.float32) * (
        (box[1] - box[0]) / 2
    ) + (box[0] + box[1]) / 2
    return planes, coords, box


def decoder_state_dict():
    """Random reference-named decoder state dict (numpy) for import tests."""
    rng = np.random.default_rng(3)
    sizes = {
        "pts_linears.0": (27, 128),
        "pts_linears.1": (128, 128),
        "pts_linears.2": (155, 128),
        "feature_linear": (128, 128),
        "alpha_linear": (128, 1),
        "views_linear": (155, 64),
        "rgb_linear": (64, 3),
    }
    sd = {}
    for name, (i, o) in sizes.items():
        sd[f"{name}.weight"] = rng.normal(scale=0.1, size=(o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(scale=0.01, size=(o,)).astype(np.float32)
    return sd


def decoder_oracle_forward(sd, feats, viewdir_enc):
    """Reference decoder math (renderer.py:142-164) in plain numpy."""

    def softplus(x):
        return np.logaddexp(0.0, x)

    def lin(p, x):
        return x @ sd[f"{p}.weight"].T + sd[f"{p}.bias"]

    h = softplus(lin("pts_linears.0", feats))
    h = softplus(lin("pts_linears.1", h))
    h = np.concatenate([feats, h], -1)
    h = softplus(lin("pts_linears.2", h))
    alpha = lin("alpha_linear", h)
    feat = lin("feature_linear", h)
    h2 = softplus(lin("views_linear", np.concatenate([feat, viewdir_enc], -1)))
    return lin("rgb_linear", h2), alpha

"""LPIPS port tests (eval/lpips_jax.py vs the torch lpips v0.1 semantics).

The real VGG weights are a 56 MB artifact imported once via compat/lpips_import;
tests run the same math on a tiny conv pyramid: identity/symmetry/positivity
properties, the npz round-trip contract, and a seeded regression value that pins
the normalization + lin-weighting + scaling-layer arithmetic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from humanliff_tpu.eval.lpips_jax import (
    VGG16_CFG,
    VGG16_SLICES,
    load_weights,
    lpips_distance,
    make_lpips,
    vgg_features,
)

TINY_CFG = (8, "M", 16, "M", 16)
TINY_SLICES = (1, 2, 3)


def _tiny_params(seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    ci = 0
    chans = []
    for c in TINY_CFG:
        if c == "M":
            continue
        params[f"conv{ci}_w"] = jnp.asarray(
            rng.normal(0, 0.2, (3, 3, cin, c)).astype(np.float32)
        )
        params[f"conv{ci}_b"] = jnp.asarray(
            rng.normal(0, 0.05, (c,)).astype(np.float32)
        )
        cin = c
        ci += 1
        chans.append(c)
    for li, sl in enumerate(TINY_SLICES):
        params[f"lin{li}"] = jnp.asarray(
            rng.uniform(0, 1, (chans[sl - 1],)).astype(np.float32)
        )
    return params


def _dist(params, a, b):
    return lpips_distance(params, a, b, cfg=TINY_CFG, slices=TINY_SLICES)


def test_lpips_identity_symmetry_positivity():
    params = _tiny_params()
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    d_aa = _dist(params, a, a)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-6)
    d_ab = _dist(params, a, b)
    d_ba = _dist(params, b, a)
    np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-6)
    assert np.all(np.asarray(d_ab) > 0)


def test_lpips_feature_slices_shapes():
    params = _tiny_params()
    x = jnp.zeros((1, 16, 16, 3))
    feats = vgg_features(params, x, cfg=TINY_CFG, slices=TINY_SLICES)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 8),
        (1, 8, 8, 16),
        (1, 4, 4, 16),
    ]


def test_lpips_seeded_regression():
    """Pins the full arithmetic (scaling layer, unit-normalize, lin, spatial mean).

    The value was computed once from this exact seeded configuration; any change
    to the math shows up as a mismatch here.
    """
    params = _tiny_params(seed=7)
    rng = np.random.default_rng(42)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    got = float(_dist(params, a, b)[0])
    import os

    pin_path = os.path.join(os.path.dirname(__file__), "fixtures", "lpips_pin.npy")
    if not os.path.exists(pin_path):  # pragma: no cover - fixture generation
        np.save(pin_path, np.asarray(got, np.float64))
    want = float(np.load(pin_path))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lpips_npz_roundtrip(tmp_path):
    params = _tiny_params()
    p = tmp_path / "w.npz"
    np.savez(p, **{k: np.asarray(v) for k, v in params.items()})
    loaded = load_weights(str(p))
    assert set(loaded) == set(params)
    a = jnp.zeros((1, 8, 8, 3))
    d1 = _dist(params, a, a)
    d2 = _dist(loaded, a, a)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_make_lpips_gates_on_weights(tmp_path, monkeypatch):
    monkeypatch.delenv("HL_LPIPS_WEIGHTS", raising=False)
    # Point the env var at a nonexistent file -> gate closed (unless the real
    # asset has been imported into assets/, in which case make_lpips() is live).
    import humanliff_tpu.eval.lpips_jax as mod

    monkeypatch.setattr(mod, "default_weights_path", lambda: None)
    assert mod.make_lpips() is None


def test_vgg16_slice_spec_is_lpips_v01():
    """The real-weight configuration must match lpips v0.1's VGG16 slices."""
    assert VGG16_SLICES == (2, 4, 7, 10, 13)
    convs = [c for c in VGG16_CFG if c != "M"]
    assert len(convs) == 13 and convs[-1] == 512


@pytest.mark.slow
def test_full_vgg16_tower_and_distance_match_torch_oracle():
    """Full-architecture oracle check (VERDICT r2 item 7): the SAME random
    weights run through (a) eval/lpips_jax's VGG16 tower + LPIPS math and
    (b) an independent raw-torch implementation of the lpips v0.1 forward
    (ScalingLayer -> VGG16 relu slices -> unit-normalize -> squared diff ->
    lin 1x1 weights -> spatial mean -> sum). Proves the slice indices, SAME/
    padding=1 conv equivalence, floor max-pool semantics, and the scaling
    constants — everything a transcription bug could silently break."""
    torch = pytest.importorskip("torch")
    from humanliff_tpu.eval.lpips_jax import _SCALE, _SHIFT

    rng = np.random.default_rng(0)
    params_np = {}
    cin, ci, chans = 3, 0, []
    for c in VGG16_CFG:
        if c == "M":
            continue
        fan_in = 3 * 3 * cin
        params_np[f"conv{ci}_w"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), (3, 3, cin, c)
        ).astype(np.float32)
        params_np[f"conv{ci}_b"] = rng.normal(0, 0.01, (c,)).astype(np.float32)
        chans.append(c)
        cin = c
        ci += 1
    for li, sl in enumerate(VGG16_SLICES):
        params_np[f"lin{li}"] = rng.uniform(0, 1, (chans[sl - 1],)).astype(
            np.float32
        )

    a = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)

    # ---- torch oracle ----
    def torch_features(x_nhwc):
        x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
        x = (x - shift) / scale
        feats = []
        conv_i = 0
        with torch.no_grad():
            for c in VGG16_CFG:
                if c == "M":
                    x = torch.nn.functional.max_pool2d(x, 2, 2)
                    continue
                w = torch.from_numpy(
                    np.transpose(params_np[f"conv{conv_i}_w"], (3, 2, 0, 1))
                )
                bias = torch.from_numpy(params_np[f"conv{conv_i}_b"])
                x = torch.nn.functional.conv2d(x, w, bias, padding=1)
                x = torch.relu(x)
                conv_i += 1
                if conv_i in VGG16_SLICES:
                    feats.append(x)
        return feats

    def torch_norm(x):
        return x / (torch.sqrt((x * x).sum(1, keepdim=True)) + 1e-10)

    fa_t = torch_features(a)
    fb_t = torch_features(b)
    dist_t = 0.0
    for li, (xa, xb) in enumerate(zip(fa_t, fb_t)):
        d = (torch_norm(xa) - torch_norm(xb)) ** 2
        w = torch.from_numpy(params_np[f"lin{li}"]).view(1, -1, 1, 1)
        dist_t = dist_t + (d * w).sum(1).mean(dim=(1, 2))
    dist_t = float(dist_t[0])

    # ---- jax port ----
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    fa_j = vgg_features(params, (jnp.asarray(a) - shift) / scale)
    dist_j = float(lpips_distance(params, jnp.asarray(a), jnp.asarray(b))[0])

    assert len(fa_j) == len(fa_t) == 5
    for li, (xj, xt) in enumerate(zip(fa_j, fa_t)):
        xt_nhwc = np.transpose(xt.numpy(), (0, 2, 3, 1))
        assert xj.shape == xt_nhwc.shape, f"slice {li} shape"
        scale_ref = max(np.abs(xt_nhwc).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(xj) / scale_ref, xt_nhwc / scale_ref, atol=2e-5,
            err_msg=f"feature slice {li}",
        )
    np.testing.assert_allclose(dist_j, dist_t, rtol=2e-4, atol=1e-6)

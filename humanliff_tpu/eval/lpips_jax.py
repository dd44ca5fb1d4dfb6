"""LPIPS perceptual distance in pure JAX (reference: recon_NeRF/lib/all_test.py:14,37-40,
which scores eval renders with the torch ``lpips`` package, net='vgg').

The metric (Zhang et al. 2018, v0.1 weights): scale the [-1, 1] inputs by the
fixed ImageNet shift/scale, run VGG16 conv features, take the five ReLU slices
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), unit-normalize each along channels,
square the difference, collapse channels with the learned non-negative 1x1 "lin"
weights, average spatially, and sum over the five layers.

Weights ship as a plain ``.npz`` produced once by ``compat/lpips_import.py`` from
the torch package (this repo cannot fetch them offline); pass its path or set
``HL_LPIPS_WEIGHTS``. The math is architecture-parameterized so tests exercise it
with a tiny random pyramid without the 56 MB VGG file.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: conv output channels, 'M' = 2x2 max pool.
VGG16_CFG: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                       512, 512, 512, "M", 512, 512, 512)
# Indices (counting conv layers only) AFTER which a feature slice is taken:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
VGG16_SLICES = (2, 4, 7, 10, 13)

# lpips v0.1 input scaling layer constants (ScalingLayer in lpips/lpips.py).
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Channel-wise unit normalization (lpips ``normalize_tensor``)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def vgg_features(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    cfg: Sequence = VGG16_CFG,
    slices: Sequence[int] = VGG16_SLICES,
) -> List[jnp.ndarray]:
    """VGG conv tower on NHWC input; returns the feature slices (post-ReLU)."""
    feats = []
    conv_i = 0
    for c in cfg:
        if c == "M":
            # 2x2 max pool, stride 2 (floor semantics like torch).
            H, W = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
            x = x[:, :H, :W]
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        w = params[f"conv{conv_i}_w"]  # (kh, kw, cin, cout)
        b = params[f"conv{conv_i}_b"]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
        conv_i += 1
        if conv_i in slices:
            feats.append(x)
    return feats


def lpips_distance(
    params: Dict[str, jnp.ndarray],
    a: jnp.ndarray,
    b: jnp.ndarray,
    cfg: Sequence = VGG16_CFG,
    slices: Sequence[int] = VGG16_SLICES,
) -> jnp.ndarray:
    """LPIPS(a, b) for NHWC RGB images in [-1, 1]. Returns (N,) distances."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    fa = vgg_features(params, (a - shift) / scale, cfg, slices)
    fb = vgg_features(params, (b - shift) / scale, cfg, slices)
    total = 0.0
    for li, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
        w = params[f"lin{li}"]  # (C,) non-negative learned channel weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


_WEIGHT_CACHE: Dict[str, Dict[str, jnp.ndarray]] = {}


def load_weights(path: str) -> Dict[str, jnp.ndarray]:
    """Load the npz written by ``compat/lpips_import.py`` (cached per path —
    eval loops re-instantiate lpips_fn per subject/layer)."""
    cached = _WEIGHT_CACHE.get(path)
    if cached is None:
        raw = np.load(path)
        cached = {k: jnp.asarray(raw[k]) for k in raw.files}
        _WEIGHT_CACHE[path] = cached
    return cached


def default_weights_path() -> Optional[str]:
    p = os.environ.get("HL_LPIPS_WEIGHTS")
    if p and os.path.exists(p):
        return p
    here = os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                        "lpips_vgg.npz")
    return os.path.abspath(here) if os.path.exists(here) else None


def make_lpips(path: Optional[str] = None):
    """Returns ``fn(a_hwc01, b_hwc01) -> float`` or None when no weights exist.

    Inputs are float images in [0, 1] (the eval harness convention); they are
    mapped to [-1, 1] as the torch wrapper in eval/metrics.py did.
    """
    path = path or default_weights_path()
    if path is None:
        return None
    params = load_weights(path)

    # Params are a jit ARGUMENT: closing over the ~59 MB VGG tree would embed
    # it as HLO constants (catastrophic remote-compile stalls — CLAUDE.md).
    # One compilation per distinct crop shape; the jit cache is shared across
    # make_lpips() instances via the module-level function.
    def compute(a: np.ndarray, b: np.ndarray) -> float:
        ta = jnp.asarray(a, jnp.float32)[None] * 2.0 - 1.0
        tb = jnp.asarray(b, jnp.float32)[None] * 2.0 - 1.0
        return float(_dist_jit(params, ta, tb))

    return compute


@jax.jit
def _dist_jit(params, a, b):
    return lpips_distance(params, a, b)[0]

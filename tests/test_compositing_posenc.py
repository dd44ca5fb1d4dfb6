"""Tests for alpha compositing and positional encoding vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.ops import composite_rays, volume_weights, positional_encoding


def test_volume_weights_matches_reference_math():
    rng = np.random.default_rng(6)
    R, S = 8, 32
    dens = rng.normal(size=(R, S)).astype(np.float32)
    z = np.sort(rng.uniform(1, 3, size=(R, S)).astype(np.float32), axis=-1)

    w = np.asarray(volume_weights(jnp.asarray(dens), jnp.asarray(z)))

    # numpy oracle of renderer.py:221-230 (test path: no noise, raw dists).
    dists = z[..., 1:] - z[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    alpha = 1.0 - np.exp(-np.logaddexp(0.0, dens) * dists)
    trans = np.cumprod(
        np.concatenate([np.ones((R, 1), np.float32), 1.0 - alpha + 1e-7], -1), -1
    )[:, :-1]
    ref = alpha * trans
    np.testing.assert_allclose(w, ref, rtol=1e-5, atol=1e-6)


def test_composite_white_background():
    R, S = 4, 16
    rgb = jnp.zeros((R, S, 3))
    dens = jnp.full((R, S), -100.0)  # zero density -> empty space
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (R, S))
    rgb_map, acc, _ = composite_rays(rgb, dens, z, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-5)


def test_density_noise_changes_weights():
    R, S = 4, 16
    dens = jnp.zeros((R, S))
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (R, S))
    a = volume_weights(dens, z)
    b = volume_weights(dens, z, noise_key=jax.random.key(0))
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_positional_encoding_matches_reference_layout():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(32, 3)).astype(np.float32)
    enc = np.asarray(positional_encoding(jnp.asarray(x), num_freqs=4))
    assert enc.shape == (32, 27)

    # Oracle: layout [x, sin(2^k x), cos(2^k x) ...] (fields.py:45-85).
    parts = [x]
    for k in range(4):
        parts.append(np.sin((2.0**k) * x))
        parts.append(np.cos((2.0**k) * x))
    ref = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(enc, ref, rtol=1e-5, atol=1e-6)

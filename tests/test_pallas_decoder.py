"""Fused Pallas decoder: parity vs NeRFDecoder (interpret mode on CPU) + gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.nerf.decoder import NeRFDecoder
from humanliff_tpu.ops.pallas.decoder import (
    fused_decoder,
    weights_from_decoder_vars,
)


def _setup(M=300):
    dec = NeRFDecoder()
    params = dec.init(jax.random.key(0), jnp.zeros((1, 27)), jnp.zeros((1, 3)))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(M, 27)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    return dec, params, feats, dirs


def test_fused_matches_flax_decoder():
    dec, params, feats, dirs = _setup()
    rgb_ref, alpha_ref = dec.apply(params, feats, dirs)
    weights = weights_from_decoder_vars(params)
    rgb, alpha = fused_decoder(weights, feats, dirs, True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref), atol=1e-5)


def test_fused_gradients_match():
    dec, params, feats, dirs = _setup(128)
    weights = weights_from_decoder_vars(params)

    def loss_fused(w, f):
        rgb, alpha = fused_decoder(w, f, dirs, True)
        return (rgb**2).sum() + (alpha**2).sum()

    def loss_ref(p, f):
        rgb, alpha = dec.apply(p, f, dirs)
        return (rgb**2).sum() + (alpha**2).sum()

    gw, gf = jax.grad(loss_fused, argnums=(0, 1))(weights, feats)
    gp, gf_ref = jax.grad(loss_ref, argnums=(0, 1))(params, feats)

    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref), atol=1e-4)
    # Spot-check one weight gradient against its flax counterpart.
    np.testing.assert_allclose(
        np.asarray(gw[0]), np.asarray(gp["params"]["trunk_0"]["kernel"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw[-2]), np.asarray(gp["params"]["rgb"]["kernel"]), atol=1e-4
    )

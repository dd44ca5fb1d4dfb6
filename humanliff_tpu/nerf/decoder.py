"""The shared NeRF MLP decoder.

Architecture parity with the reference renderer's MLP (recon_NeRF/lib/renderer.py:32-43,
:142-164): trunk of three softplus Dense layers (27 -> 128 -> 128, skip-concat of the
input before the third), a 1-d alpha head off the trunk, and a view-conditioned RGB
head (feature 128 + PE(4)·viewdir 27 -> 64 -> 3). ~54k params — tiny; the cost is that
it runs per sample point (batch·rays·256 points).

TPU note: all the matmuls here are (N, 27/128/155) x (.., 128) GEMMs — they land on
the MXU as long as N is large, which the renderer guarantees by flattening
rays x samples into one axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from humanliff_tpu.ops.posenc import positional_encoding


class NeRFDecoder(nn.Module):
    d_in: int = 27
    d_hidden: int = 128
    n_trunk_layers: int = 2  # layers after the input layer; skip-concat mid-trunk
    view_freqs: int = 4

    def setup(self):
        skip = self.n_trunk_layers // 2  # matches reference skips=[n_layers/2]
        self.skip_at = skip  # index within the enumerate over all trunk layers
        layers = [nn.Dense(self.d_hidden, name="trunk_0")]
        for i in range(self.n_trunk_layers):
            layers.append(nn.Dense(self.d_hidden, name=f"trunk_{i + 1}"))
        self.trunk = layers
        self.alpha_head = nn.Dense(1, name="alpha")
        self.feature = nn.Dense(self.d_hidden, name="feature")
        self.views = nn.Dense(self.d_hidden // 2, name="views")
        self.rgb_head = nn.Dense(3, name="rgb")

    def _trunk(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i, layer in enumerate(self.trunk):
            h = nn.softplus(layer(h))
            if i == 1:  # reference: concat input after the second softplus
                h = jnp.concatenate([x, h], axis=-1)
        return h

    def density(self, features: jnp.ndarray) -> jnp.ndarray:
        """Raw (pre-softplus) density ``(N, 1)`` from point features ``(N, d_in)``."""
        return self.alpha_head(self._trunk(features))

    def __call__(
        self, features: jnp.ndarray, viewdirs: Optional[jnp.ndarray] = None
    ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
        """Returns (raw rgb or None, raw density)."""
        h = self._trunk(features)
        alpha = self.alpha_head(h)
        if viewdirs is None:
            return None, alpha
        feat = self.feature(h)
        venc = positional_encoding(viewdirs, num_freqs=self.view_freqs)
        h2 = nn.softplus(self.views(jnp.concatenate([feat, venc], axis=-1)))
        rgb = self.rgb_head(h2)
        return rgb, alpha

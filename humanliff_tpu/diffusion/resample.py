"""Timestep schedule samplers (reference: improved_diffusion/resample.py).

The loss-aware sampler is functional: its state (a per-timestep ring buffer of recent
losses) is an ordinary pytree updated in the train step. Cross-host synchronization —
the reference's all_gather of per-rank losses (resample.py:83-99) — falls out for free
when the update runs inside the pjit-ed step on replicated state: every host applies
the same update to the same globally-visible (t, loss) pairs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class UniformSampler:
    num_timesteps: int

    def sample(self, key: jax.Array, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jax.random.randint(key, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)


@dataclass(frozen=True)
class LossSecondMomentResampler:
    """Importance-sample timesteps by sqrt E[loss^2] (resample.py:70-154)."""

    num_timesteps: int
    history_per_term: int = 10
    uniform_prob: float = 0.001

    def init_state(self) -> Dict[str, jnp.ndarray]:
        return {
            "history": jnp.zeros(
                (self.num_timesteps, self.history_per_term), jnp.float32
            ),
            "counts": jnp.zeros((self.num_timesteps,), jnp.int32),
        }

    def _weights(self, state) -> jnp.ndarray:
        warmed = jnp.all(state["counts"] == self.history_per_term)
        w = jnp.sqrt(jnp.mean(state["history"] ** 2, axis=-1))
        w = jnp.where(warmed, w, jnp.ones_like(w))
        p = w / w.sum()
        return p * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps

    def sample(
        self, state, key: jax.Array, batch: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p = self._weights(state)
        t = jax.random.choice(key, self.num_timesteps, (batch,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights

    def update(self, state, t: jnp.ndarray, losses: jnp.ndarray):
        """Insert per-example losses into the per-timestep ring buffers."""

        def insert_one(state, inp):
            ti, li = inp
            count = state["counts"][ti]
            full = count == self.history_per_term
            row = state["history"][ti]
            shifted = jnp.where(full, jnp.roll(row, -1).at[-1].set(li), row)
            appended = row.at[jnp.minimum(count, self.history_per_term - 1)].set(li)
            new_row = jnp.where(full, shifted, appended)
            state = {
                "history": state["history"].at[ti].set(new_row),
                "counts": state["counts"].at[ti].set(
                    jnp.minimum(count + 1, self.history_per_term)
                ),
            }
            return state, None

        state, _ = jax.lax.scan(insert_one, state, (t, losses))
        return state


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")

"""Mixed-batch workload planner (VERDICT r3 item 4).

The reference's sample script runs 25 subjects x 4 layers strictly at B=1
(triplane_scripts/SynBody_triplane_sample_layered_*.sh); the single chip has
exactly two clean batch operating points (B=1 and B=8 — docs/BATCH_PATHOLOGY.md),
and pure B=8 loses on N=25 to pad-to-32 waste. plan_workload solves the covering
problem exactly by DP over the measured chain-cost table.
"""

import jax
import jax.numpy as jnp
import numpy as np

from humanliff_tpu.diffusion.respace import create_diffusion
from humanliff_tpu.sampling.layered import (
    DEFAULT_CHAIN_COSTS,
    LAYER_NAMES,
    generate_workload,
    plan_workload,
)


def _plan_cost(plan, costs):
    return sum(costs[b] for b in plan)


def test_plan_25_is_mixed():
    # The headline case: 3 chains at B=8 + 1 at B=1 beats naive and pure-B8.
    plan = plan_workload(25)
    assert sorted(plan, reverse=True) == [8, 8, 8, 1]
    c = DEFAULT_CHAIN_COSTS
    assert _plan_cost(plan, c) < 25 * c[1]  # beats naive B=1
    assert _plan_cost(plan, c) < 4 * c[8]  # beats pure B=8 (pad to 32)


def test_plan_edge_cases():
    assert plan_workload(0) == []
    assert plan_workload(8) == [8]
    assert plan_workload(16) == [8, 8]
    assert plan_workload(1) == [1]
    # With the default costs a 7-sample tail is cheaper as one padded B=8
    # chain (38.1 s) than seven B=1 chains (38.5 s)...
    assert plan_workload(7) == [8]
    # ...but a 6-sample tail is cheaper serial.
    assert plan_workload(6) == [1] * 6


def test_plan_covers_and_is_optimal_vs_pure_strategies():
    costs = {1: 1.0, 8: 6.5}
    for n in range(1, 40):
        plan = plan_workload(n, costs)
        assert sum(plan) >= n  # covering
        cost = _plan_cost(plan, costs)
        naive = n * costs[1]
        pure8 = int(np.ceil(n / 8)) * costs[8]
        assert cost <= naive + 1e-9
        assert cost <= pure8 + 1e-9


def test_plan_respects_custom_cost_table():
    # If B=8 were free of pathology-adjacent pricing, everything batches.
    plan = plan_workload(9, {1: 1.0, 8: 1.5})
    assert plan == [8, 8] or sorted(plan, reverse=True) == [8, 1]
    assert _plan_cost(plan, {1: 1.0, 8: 1.5}) <= 3.0


class _ToyModel:
    """Deterministic epsilon predictor: enough to drive the sampling chain."""

    def apply(self, params, x, ts, xc, y):
        return 0.1 * x + params["w"] * 0.01 + 0.0 * xc

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def test_generate_workload_shapes_and_trim():
    model = _ToyModel()
    params = {"w": jnp.ones(())}
    diffusion = create_diffusion(steps=8)
    object.__setattr__(diffusion, "channel_axis", -1)
    # Costs force a [2, 2] plan for N=3: the overshoot lane must be trimmed.
    out = generate_workload(
        model, params, diffusion, jax.random.key(0), num_samples=3,
        image_size=8, channels=6, chain_costs={1: 1.0, 2: 0.9},
    )
    assert set(out) == set(LAYER_NAMES)
    for arr in out.values():
        assert arr.shape == (3, 8, 8, 6)
        assert np.isfinite(np.asarray(arr)).all()

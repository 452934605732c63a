"""Static phase specialization must be bitwise-identical to the dynamic step.

The dynamic path branches on ``state.step < burn_in_steps`` inside the scan
(`samplers/_adaptive.py`); the phase-split path runs one ``phase="burn_in"``
scan followed by a ``phase="sampling"`` scan.  Driving both with identical
per-step keys must produce the exact same positions — the specialization is
a pure traffic optimization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
from pysgmcmc_tpu.samplers.sgld import SGLDSampler

COST = lambda x: 0.5 * jnp.sum(x**2)
BURN = 7
TOTAL = 15


def _drive(sampler, phase_plan):
    """Run TOTAL steps; phase_plan maps step index -> phase (or None)."""
    state = sampler.init(jnp.asarray([2.0, -1.0]))
    positions = []
    step = jax.jit(sampler.step, static_argnames=("phase",))
    for i in range(TOTAL):
        key = jax.random.PRNGKey(100 + i)
        state, _ = step(state, key, phase=phase_plan(i))
        positions.append(np.asarray(state.position))
    return np.stack(positions)


@pytest.mark.parametrize("cls", [SGHMCSampler, SGLDSampler])
def test_phase_split_bitwise_equals_dynamic(cls):
    sampler = cls(COST, stepsize_schedule=0.05, burn_in_steps=BURN)
    dynamic = _drive(sampler, lambda i: None)
    split = _drive(
        sampler, lambda i: "burn_in" if i < BURN else "sampling"
    )
    np.testing.assert_array_equal(dynamic, split)


def test_phase_sampling_freezes_stats():
    sampler = SGHMCSampler(COST, stepsize_schedule=0.05, burn_in_steps=3)
    state = sampler.init(jnp.asarray([1.0]))
    # adapt for 3 steps
    for i in range(3):
        state, _ = sampler.step(state, jax.random.PRNGKey(i), phase="burn_in")
    stats_before = jax.tree_util.tree_map(np.asarray, state.stats)
    state, _ = sampler.step(state, jax.random.PRNGKey(9), phase="sampling")
    stats_after = jax.tree_util.tree_map(np.asarray, state.stats)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, stats_before, stats_after
    )


def test_sample_chain_phase_plumbed():
    from pysgmcmc_tpu.samplers.base import sample_chain

    sampler = SGHMCSampler(COST, stepsize_schedule=0.05, burn_in_steps=5)
    state = sampler.init(jnp.asarray([1.0]))
    key = jax.random.PRNGKey(0)
    state, _ = sample_chain(
        sampler, state, key, 1, keep_every=5, collect_costs=False,
        phase="burn_in",
    )
    state, pos, costs = sample_chain(
        sampler, state, jax.random.PRNGKey(1), 4, phase="sampling"
    )
    assert pos.shape == (4, 1)
    assert np.isfinite(np.asarray(pos)).all()


def test_run_chains_phase_plumbed():
    from pysgmcmc_tpu.parallel.chains import run_chains, stack_positions

    sampler = SGLDSampler(COST, stepsize_schedule=0.05, burn_in_steps=0)
    positions = stack_positions(jnp.zeros(2), 4)
    chains, costs = run_chains(
        sampler, positions, jax.random.PRNGKey(0), 10, phase="sampling"
    )
    assert chains.shape == (4, 10, 2)
    assert np.isfinite(np.asarray(chains)).all()

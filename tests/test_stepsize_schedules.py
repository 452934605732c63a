import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
from pysgmcmc_tpu.stepsize_schedules import (
    ConstantStepsizeSchedule,
    CyclicalStepsizeSchedule,
    PolynomialDecaySchedule,
    TracedStepsizeSchedule,
)


def test_constant_iterator_protocol():
    schedule = ConstantStepsizeSchedule(0.01)
    assert schedule.initial_value == 0.01
    assert next(schedule) == 0.01
    from itertools import islice

    assert list(islice(schedule, 3)) == [0.01, 0.01, 0.01]


def test_polynomial_decay_monotone():
    schedule = PolynomialDecaySchedule(a=0.1, b=1.0, gamma=0.55)
    values = [float(schedule.value((), t)) for t in range(10)]
    assert all(a > b for a, b in zip(values, values[1:]))
    np.testing.assert_allclose(values[0], 0.1, rtol=1e-6)


def test_cyclical_period():
    schedule = CyclicalStepsizeSchedule(0.2, cycle_length=10)
    v0 = float(schedule.value((), 0))
    v10 = float(schedule.value((), 10))
    np.testing.assert_allclose(v0, 0.2, rtol=1e-6)
    np.testing.assert_allclose(v0, v10, rtol=1e-6)
    assert float(schedule.value((), 5)) < v0


def test_traced_schedule_sweeps_without_recompile():
    """One jitted program serves any stepsize via the schedule state."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGHMCSampler(
        cost_fn, stepsize_schedule=TracedStepsizeSchedule(0.01),
        burn_in_steps=0,
    )

    traced = 0

    def run(eps):
        nonlocal traced

        def chain(eps):
            nonlocal traced
            traced += 1
            state = sampler.init(jnp.zeros(2))
            state = state._replace(schedule_state=eps)
            _, positions, _ = sample_chain(
                sampler, state, jax.random.PRNGKey(0), 10
            )
            return positions

        if not hasattr(run, "_jitted"):
            run._jitted = jax.jit(chain)
        return run._jitted(jnp.float32(eps))

    out_small = np.asarray(run(1e-3))
    out_large = np.asarray(run(1e-2))
    assert traced == 1  # second call hit the compile cache
    # different stepsizes genuinely produce different trajectories
    assert not np.allclose(out_small, out_large)
    assert np.abs(out_small).max() < np.abs(out_large).max()


def test_schedules_inside_sampler():
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    for schedule in (
        PolynomialDecaySchedule(a=0.05),
        CyclicalStepsizeSchedule(0.05, cycle_length=20),
    ):
        sampler = SGHMCSampler(cost_fn, stepsize_schedule=schedule,
                               burn_in_steps=5)
        state = sampler.init(jnp.zeros(1))
        _, positions, costs = sample_chain(
            sampler, state, jax.random.PRNGKey(0), 50
        )
        assert np.isfinite(np.asarray(positions)).all()

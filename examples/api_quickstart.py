"""API quickstart — executable counterpart of the reference's
``docs/source/notebooks/api_quickstart.ipynb``.

Covers: building samplers through the ``Sampler`` enum factory, the
iterator protocol, the scan-based fast path, stepsize schedules, and
multi-chain diagnostics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu import Sampler
from pysgmcmc_tpu.diagnostics import (
    effective_sample_size,
    gelman_rubin,
    pysgmcmc_multitrace,
)
from pysgmcmc_tpu.diagnostics.objective_functions import (
    gmm1_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers import IterativeSampler, sample_chain
from pysgmcmc_tpu.stepsize_schedules import CyclicalStepsizeSchedule


def main():
    cost_fn = to_negative_log_likelihood(gmm1_log_likelihood)

    # 1. The reference-style iterator protocol.
    sampler = Sampler.get_sampler(
        Sampler.SGHMC, cost_fn=cost_fn, stepsize_schedule=0.05,
        burn_in_steps=300,
    )
    it = IterativeSampler(sampler, params=jnp.zeros(1), key=0)
    for _ in range(3):
        sample, cost = next(it)
        print("next(sampler) -> sample {} cost {:.3f}".format(
            np.asarray(sample), float(cost)))

    # 2. The fast path: one compiled scan for the whole chain.
    state = sampler.init(jnp.zeros(1))
    state, samples, costs = sample_chain(
        sampler, state, jax.random.PRNGKey(0), n_samples=20_000
    )
    draws = np.asarray(samples)[5000:, 0]
    print("single chain: mean {:.2f} std {:.2f}".format(draws.mean(), draws.std()))

    # 3. Cyclical stepsizes (new capability vs the reference).
    cyclical = Sampler.get_sampler(
        Sampler.SGHMC, cost_fn=cost_fn,
        stepsize_schedule=CyclicalStepsizeSchedule(0.1, cycle_length=2000),
        burn_in_steps=300,
    )
    state = cyclical.init(jnp.zeros(1))
    _, samples, _ = sample_chain(cyclical, state, jax.random.PRNGKey(1), 10_000)
    print("cyclical-schedule chain spans modes: min {:.1f} max {:.1f}".format(
        float(samples.min()), float(samples.max())))

    # 4. Parallel chains + diagnostics.
    multitrace = pysgmcmc_multitrace(
        sampler, jnp.zeros(1), key=2, n_chains=4, samples_per_chain=2000,
        keep_every=5, jitter=3.0, varnames=["x"],
    )
    chains = multitrace.chains_array("x")
    ess = np.asarray(effective_sample_size(chains)).ravel()[0]
    r_hat = np.asarray(gelman_rubin(chains)).ravel()[0]
    print("4 chains: ESS {:.0f}, R-hat {:.3f}".format(float(ess), float(r_hat)))


if __name__ == "__main__":
    main()

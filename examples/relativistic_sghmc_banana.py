"""Relativistic SGHMC on the banana density.

Executable counterpart of the reference's
``docs/source/notebooks/Relativistic_SGHMC.ipynb`` (reproducing Lu et al.,
AISTATS 2017, fig. 1-style runs): sample the 2-D banana-shaped density with
relativistic dynamics and report coverage of the ridge.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.objective_functions import (
    banana_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers import RelativisticSGHMCSampler, sample_chain


def main():
    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    sampler = RelativisticSGHMCSampler(
        cost_fn, stepsize_schedule=0.1, mass=1.0, speed_of_light=1.0,
    )
    state = sampler.init(jnp.zeros(2), key=jax.random.PRNGKey(0))
    state, samples, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(1), n_samples=50_000
    )
    draws = np.asarray(samples)[10_000:]

    # The banana's ridge is x1 = 10 - 0.1 x0^2; check the sampler tracks it.
    x0, x1 = draws[:, 0], draws[:, 1]
    ridge_residual = x1 + 0.1 * x0**2 - 10.0
    print("x0 spread (std):          {:.2f}".format(x0.std()))
    print("ridge residual mean/std:  {:.3f} / {:.3f}".format(
        ridge_residual.mean(), ridge_residual.std()))
    print("(residual should be ~N(0,1); x0 std should be large, ~7)")


if __name__ == "__main__":
    main()

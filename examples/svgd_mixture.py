"""SVGD particle ensemble on a Gaussian mixture.

Executable counterpart of the reference's
``docs/source/notebooks/SVGD.ipynb``: transport a badly-initialized particle
cloud onto a multimodal target and report per-mode mass.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.objective_functions import (
    gmm1_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers import SVGDSampler


def main():
    cost_fn = to_negative_log_likelihood(gmm1_log_likelihood)
    sampler = SVGDSampler(cost_fn, stepsize_schedule=0.5)

    particles = jax.random.normal(jax.random.PRNGKey(0), (200, 1)) * 0.3
    state = sampler.init(particles)

    step = jax.jit(sampler.step)
    for i in range(2000):
        state, info = step(state, jax.random.PRNGKey(i))

    final = np.asarray(state.position)[:, 0]
    for mode in (-5, 0, 5):
        mass = np.mean(np.abs(final - mode) < 1.5)
        print("mass near mode {:+d}: {:.2f} (target 0.33)".format(mode, mass))


if __name__ == "__main__":
    main()

"""float64 support (the reference's default dtype, ``sghmc.py:34``).

JAX disables x64 globally by default; the framework supports it through the
standard ``jax.experimental.enable_x64`` scope (or the global flag).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


def test_float64_sampling():
    jax.config.update("jax_enable_x64", True)
    try:
        cost_fn = lambda p: 0.5 * jnp.sum(p**2)
        sampler = SGHMCSampler(
            cost_fn, stepsize_schedule=0.05, burn_in_steps=20,
            dtype=jnp.float64,
        )
        state = sampler.init(jnp.zeros(2, jnp.float64))
        assert state.position.dtype == jnp.float64
        state, positions, costs = sample_chain(
            sampler, state, jax.random.PRNGKey(0), 50
        )
        assert positions.dtype == jnp.float64
        assert np.isfinite(np.asarray(positions)).all()
    finally:
        jax.config.update("jax_enable_x64", False)

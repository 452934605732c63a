"""Prior log-likelihood regression tests.

The reference pins its priors against golden ``.npy`` files
(``tests/bayesian_neural_network/test_priors.py:14-81``).  Here the same
role is played by closed-form checks: both priors are simple Gaussian
expressions whose values we can compute independently in numpy.
"""

import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.models import log_variance_prior_log_like, weight_prior_log_like


def test_log_variance_prior_matches_closed_form():
    rng = np.random.default_rng(0)
    log_var = rng.normal(size=(16, 1)).astype(np.float32)
    mean, var = 1e-6, 0.01

    expected = np.mean(
        np.sum(
            -((log_var - np.log(mean)) ** 2) / (2.0 * var) - 0.5 * np.log(var),
            axis=1,
        )
    )
    got = float(log_variance_prior_log_like(jnp.asarray(log_var), mean, var))
    np.testing.assert_allclose(got, expected, rtol=2e-5)


def test_weight_prior_matches_closed_form():
    rng = np.random.default_rng(1)
    params = {
        "w": rng.normal(size=(5, 3)).astype(np.float32),
        "b": rng.normal(size=(3,)).astype(np.float32),
    }
    total = sum(np.sum(-0.5 * leaf**2) for leaf in params.values())
    n = sum(leaf.size for leaf in params.values())
    expected = total / n
    got = float(
        weight_prior_log_like({k: jnp.asarray(v) for k, v in params.items()})
    )
    np.testing.assert_allclose(got, expected, rtol=2e-5)


def test_weight_prior_scale_invariance_in_count():
    """Doubling the parameter count at fixed values leaves the prior
    unchanged (it is normalized per parameter, bayesian_neural_network.py:141)."""
    p1 = {"w": jnp.ones((4, 4))}
    p2 = {"w": jnp.ones((4, 4)), "w2": jnp.ones((4, 4))}
    np.testing.assert_allclose(
        float(weight_prior_log_like(p1)), float(weight_prior_log_like(p2)), rtol=1e-6
    )

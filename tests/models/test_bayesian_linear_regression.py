"""Samplers validated against the EXACT conjugate posterior.

The closed-form posterior of Bayesian linear regression lets us check the
whole pipeline (minibatching, burn-in adaptation, scale_grad conventions,
thinned collection) against ground truth — something the reference's test
suite never does.
"""

import numpy as np
import pytest

from pysgmcmc_tpu.models.bayesian_linear_regression import (
    BayesianLinearRegression,
    exact_posterior,
)
from pysgmcmc_tpu.sampling import Sampler


def _data(n=128, d=3, seed=0, noise=0.2):
    rng = np.random.RandomState(seed)
    X = rng.uniform(-1, 1, (n, d))
    w_true = np.asarray([1.5, -0.7, 0.3])[:d]
    y = X @ w_true + noise * rng.randn(n)
    return X, y


def test_exact_posterior_shrinks_to_truth():
    X, y = _data(n=2000)
    mean, cov = exact_posterior(X, y, alpha=1.0, beta=25.0)
    np.testing.assert_allclose(mean, [1.5, -0.7, 0.3], atol=0.1)
    assert np.all(np.diag(cov) < 0.01)


@pytest.mark.parametrize(
    "method,stepsize",
    [(Sampler.SGHMC, 1e-2), (Sampler.SGLD, 1e-2)],
)
def test_sampled_posterior_matches_exact(method, stepsize):
    X, y = _data()
    model = BayesianLinearRegression(
        alpha=1.0, beta=25.0, sampling_method=method,
        stepsize_schedule=stepsize, n_nets=400, burn_in_steps=2000,
        sample_steps=20, seed=0,
    )
    model.train(X, y)
    samples = np.asarray(model.samples)
    assert samples.shape == (400, 3)

    mean_exact, cov_exact = model.exact_posterior()
    mean_mc = samples.mean(axis=0)
    std_exact = np.sqrt(np.diag(cov_exact))

    # Posterior mean within a fraction of a posterior stddev.
    np.testing.assert_allclose(mean_mc, mean_exact, atol=0.5 * std_exact.max())
    # Marginal stddevs within 40% (MC error + discretization bias).
    std_mc = samples.std(axis=0)
    np.testing.assert_allclose(std_mc, std_exact, rtol=0.4)


def test_predictive_interface():
    X, y = _data()
    model = BayesianLinearRegression(
        n_nets=50, burn_in_steps=500, sample_steps=5, seed=1
    )
    model.train(X, y)
    x_test = np.linspace(-1, 1, 20)[:, None] * np.ones((1, 3))
    mean, var = model.predict(x_test)
    assert mean.shape == (20,)
    assert np.all(var >= 1.0 / 25.0 - 1e-6)  # at least the noise floor

    untrained = BayesianLinearRegression()
    with pytest.raises(ValueError):
        untrained.predict(x_test)

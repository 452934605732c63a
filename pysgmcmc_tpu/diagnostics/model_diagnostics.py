"""Predictive-quality diagnostics for sampled model ensembles.

The reference ships this module as an empty placeholder
(``/root/reference/pysgmcmc/diagnostics/model_diagnostics.py:1``).  Here it
provides the standard predictive metrics for Bayesian regression ensembles
(as produced by :class:`pysgmcmc_tpu.models.BayesianNeuralNetwork` with
``return_individual_predictions=True``): predictive log likelihood,
calibration curves, and RMSE — all plain jnp, jit/vmap friendly.

Examples
--------
>>> import numpy as np
>>> round(float(rmse(np.array([1.0, 2.0]), np.array([1.0, 4.0]))), 3)
1.414
>>> f_out = np.zeros((3, 4)); var = np.ones((3, 4))
>>> ll = float(predictive_log_likelihood(f_out, var, np.zeros(4)))
>>> round(ll, 3)  # standard normal log density at 0
-0.919
"""

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def predictive_log_likelihood(f_out, noise_variance, y_true):
    """Mean log predictive density of a Gaussian mixture ensemble.

    ``f_out``: (n_nets, N) member means; ``noise_variance``: (n_nets, N)
    member predictive variances; ``y_true``: (N,).  Each ensemble member
    contributes a Gaussian; the predictive density is their equal-weight
    mixture (the standard MC approximation of the posterior predictive).
    """
    f_out = jnp.asarray(f_out)
    noise_variance = jnp.asarray(noise_variance)
    y = jnp.asarray(y_true)[None, :]
    n_nets = f_out.shape[0]
    log_members = (
        -0.5 * jnp.log(2.0 * jnp.pi * noise_variance)
        - 0.5 * (y - f_out) ** 2 / noise_variance
    )
    return jnp.mean(logsumexp(log_members, axis=0) - jnp.log(n_nets))


def rmse(mean_prediction, y_true):
    """Root mean squared error of the ensemble mean."""
    return jnp.sqrt(jnp.mean((jnp.asarray(mean_prediction) - jnp.asarray(y_true)) ** 2))


def calibration_curve(f_out, noise_variance, y_true, quantiles=None):
    """Observed coverage of centered predictive intervals.

    Returns ``(nominal, observed)``: for each nominal central-interval mass
    ``q``, the fraction of ``y_true`` falling inside the ensemble's
    ``q``-interval (estimated from the mixture's mean/variance under a
    Gaussian approximation).  A well-calibrated model has
    ``observed ~= nominal``.
    """
    if quantiles is None:
        quantiles = jnp.linspace(0.1, 0.9, 9)
    quantiles = jnp.asarray(quantiles)

    f_out = jnp.asarray(f_out)
    noise_variance = jnp.asarray(noise_variance)
    y = jnp.asarray(y_true)

    mixture_mean = jnp.mean(f_out, axis=0)
    # law of total variance: mean of member variances + variance of means
    mixture_var = jnp.mean(noise_variance, axis=0) + jnp.var(f_out, axis=0)
    z = (y - mixture_mean) / jnp.sqrt(mixture_var)

    # central interval of mass q <-> |z| < Phi^-1((1+q)/2)
    from jax.scipy.stats import norm

    thresholds = norm.ppf((1.0 + quantiles) / 2.0)
    observed = jnp.mean(
        jnp.abs(z)[None, :] < thresholds[:, None], axis=1
    )
    return quantiles, observed


def expected_calibration_error(f_out, noise_variance, y_true, quantiles=None):
    """Mean absolute gap between nominal and observed coverage."""
    nominal, observed = calibration_curve(
        f_out, noise_variance, y_true, quantiles
    )
    return jnp.mean(jnp.abs(nominal - observed))

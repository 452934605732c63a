import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.model_diagnostics import (
    calibration_curve,
    expected_calibration_error,
    predictive_log_likelihood,
    rmse,
)


def _well_calibrated_ensemble(n_nets=50, n_points=2000, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    truth = rng.normal(size=n_points)
    y = truth + sigma * rng.normal(size=n_points)
    f_out = truth[None, :] + 0.0 * rng.normal(size=(n_nets, n_points))
    noise_var = np.full((n_nets, n_points), sigma**2)
    return f_out, noise_var, y


def test_predictive_log_likelihood_matches_gaussian():
    f_out, noise_var, y = _well_calibrated_ensemble()
    lpd = float(predictive_log_likelihood(f_out, noise_var, y))
    # all members identical -> mixture == single Gaussian; analytic E[lpd]
    sigma = 0.5
    expected = -0.5 * np.log(2 * np.pi * sigma**2) - 0.5  # E[(y-f)^2]/sigma^2 = 1
    assert abs(lpd - expected) < 0.05


def test_calibration_of_well_calibrated_model():
    f_out, noise_var, y = _well_calibrated_ensemble()
    nominal, observed = calibration_curve(f_out, noise_var, y)
    np.testing.assert_allclose(
        np.asarray(observed), np.asarray(nominal), atol=0.05
    )
    ece = float(expected_calibration_error(f_out, noise_var, y))
    assert ece < 0.05


def test_overconfident_model_flagged():
    f_out, noise_var, y = _well_calibrated_ensemble()
    overconfident_var = noise_var / 25.0  # claims 5x smaller stddev
    ece = float(expected_calibration_error(f_out, overconfident_var, y))
    assert ece > 0.2


def test_rmse():
    got = float(rmse(jnp.asarray([1.0, 2.0]), jnp.asarray([1.0, 4.0])))
    np.testing.assert_allclose(got, np.sqrt(2.0), rtol=1e-6)

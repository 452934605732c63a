"""Cross-validate the FFT-based ESS against a direct O(n^2) implementation."""

import pytest
import numpy as np

from pysgmcmc_tpu.diagnostics.sampler_diagnostics import effective_sample_size

pytestmark = pytest.mark.slow


def _direct_ess(chains):
    """Textbook implementation: direct autocovariance sums, Geyer pairs."""
    chains = np.asarray(chains, np.float64)
    m, n = chains.shape

    acov = np.zeros((m, n))
    for c in range(m):
        x = chains[c] - chains[c].mean()
        for t in range(n):
            acov[c, t] = np.sum(x[: n - t] * x[t:]) / n
    mean_acov = acov.mean(axis=0)

    within = np.mean(acov[:, 0] * n / (n - 1.0))
    if m > 1:
        between = n * np.var(chains.mean(axis=1), ddof=1)
    else:
        between = 0.0
    var_plus = within * (n - 1.0) / n + between / n
    rho = 1.0 - (within - mean_acov) / var_plus

    tau = 1.0
    running_min = np.inf
    for k in range((n - 1) // 2):
        pair = rho[1 + 2 * k] + rho[2 + 2 * k]
        if pair < 0:
            break
        running_min = min(running_min, pair)
        tau += 2.0 * max(running_min, 0.0)
    return min(m * n / tau, m * n)


def test_fft_matches_direct_iid():
    rng = np.random.default_rng(0)
    chains = rng.normal(size=(3, 400)).astype(np.float32)
    fft_ess = float(effective_sample_size(chains))
    direct = _direct_ess(chains)
    np.testing.assert_allclose(fft_ess, direct, rtol=1e-3)


def test_fft_matches_direct_ar1():
    rng = np.random.default_rng(1)
    phi = 0.8
    m, n = 2, 600
    x = np.zeros((m, n))
    noise = rng.normal(size=(m, n))
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + noise[:, t] * np.sqrt(1 - phi**2)
    fft_ess = float(effective_sample_size(x.astype(np.float32)))
    direct = _direct_ess(x)
    np.testing.assert_allclose(fft_ess, direct, rtol=5e-3)


def test_fft_matches_direct_single_chain():
    rng = np.random.default_rng(2)
    chains = rng.normal(size=(1, 300)).astype(np.float32)
    fft_ess = float(effective_sample_size(chains))
    direct = _direct_ess(chains)
    np.testing.assert_allclose(fft_ess, direct, rtol=1e-3)

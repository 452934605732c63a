"""External validation of the ESS / R-hat estimators against ground truth.

The reference delegated these estimators to pymc3, i.e. its numbers were
the ecosystem's numbers (``/root/reference/pysgmcmc/diagnostics/
sampler_diagnostics.py:7-44``).  No MCMC ecosystem package ships in this
environment, so validation is against *analytic* ground truth instead —
stronger than a package cross-check, and independent of any formula this
repo implements:

- AR(1) chains with coefficient ``phi`` have a closed-form integrated
  autocorrelation time ``tau = (1 + phi) / (1 - phi)``, so
  ``ESS = m * n * (1 - phi) / (1 + phi)``.
- Two iid N(+-delta/2, 1) chains have, for large n, a closed-form
  ``R_hat -> sqrt(1 + delta^2 / 2)``.

Both the classic Gelman et al. estimators and the independent
rank-normalized split estimators (Vehtari et al. 2021 — the algorithm
modern pymc/arviz report) must hit these targets, and must agree with each
other on well-behaved chains.
"""

import numpy as np
import pytest

from pysgmcmc_tpu.diagnostics.sampler_diagnostics import (
    effective_sample_size,
    effective_sample_size_bulk,
    gelman_rubin,
    gelman_rubin_split,
)


def _ar1_chains(phi, m, n, seed=0):
    rng = np.random.default_rng(seed)
    innovations = rng.standard_normal((m, n)).astype(np.float32)
    chains = np.empty((m, n), np.float32)
    scale = np.sqrt(1.0 - phi**2)  # stationary unit variance
    chains[:, 0] = innovations[:, 0]
    for t in range(1, n):
        chains[:, t] = phi * chains[:, t - 1] + scale * innovations[:, t]
    return chains


@pytest.mark.parametrize("phi", [0.0, 0.5, 0.9])
@pytest.mark.parametrize(
    "estimator", [effective_sample_size, effective_sample_size_bulk]
)
def test_ess_matches_analytic_ar1(phi, estimator):
    m, n = 8, 8192
    chains = _ar1_chains(phi, m, n, seed=int(phi * 10))
    expected = m * n * (1.0 - phi) / (1.0 + phi)
    got = float(estimator(chains))
    assert abs(got - expected) / expected < 0.15, (phi, got, expected)


def test_classic_and_rank_normalized_ess_agree():
    chains = _ar1_chains(0.7, 4, 4096, seed=3)
    classic = float(effective_sample_size(chains))
    bulk = float(effective_sample_size_bulk(chains))
    assert abs(classic - bulk) / classic < 0.2


def test_rhat_matches_analytic_offset():
    """Two chains offset by +-delta/2 around 0: R_hat -> sqrt(1 + delta^2/2)."""
    rng = np.random.default_rng(4)
    n, delta = 20000, 1.0
    chains = rng.standard_normal((2, n)).astype(np.float32)
    chains[0] += delta / 2.0
    chains[1] -= delta / 2.0
    expected = np.sqrt(1.0 + delta**2 / 2.0)
    got = float(gelman_rubin(chains))
    assert abs(got - expected) / expected < 0.03, (got, expected)


def test_rhat_well_mixed_is_one():
    rng = np.random.default_rng(5)
    chains = rng.standard_normal((4, 5000)).astype(np.float32)
    assert abs(float(gelman_rubin(chains)) - 1.0) < 0.01
    assert abs(float(gelman_rubin_split(chains)) - 1.0) < 0.01


def test_split_rhat_detects_drift_classic_cannot():
    """A single still-drifting chain: split-R_hat flags it (its two halves
    disagree); classic R_hat cannot even be computed for one chain."""
    rng = np.random.default_rng(6)
    n = 4000
    drift = np.linspace(0.0, 3.0, n).astype(np.float32)
    chain = (rng.standard_normal(n).astype(np.float32) + drift)[None, :]
    r_split = float(gelman_rubin_split(chain))
    assert r_split > 1.2
    with pytest.raises(ValueError):
        gelman_rubin(chain)


def test_bulk_ess_robust_to_heavy_tails():
    """Rank normalization keeps ESS meaningful under infinite-variance draws
    (Cauchy), where the classic moment-based estimator is unstable."""
    rng = np.random.default_rng(7)
    chains = rng.standard_cauchy((4, 4096)).astype(np.float32)
    bulk = float(effective_sample_size_bulk(chains))
    total = 4 * 4096
    assert 0.5 * total < bulk <= 1.05 * total

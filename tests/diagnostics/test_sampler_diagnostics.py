import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.sampler_diagnostics import (
    effective_sample_size,
    effective_sample_sizes,
    gelman_rubin,
    gelman_rubin_from_sampler,
)
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


@pytest.mark.slow
def test_ess_iid_chains():
    """Independent draws: ESS should be close to the total draw count."""
    m, n = 4, 2000
    chains = jax.random.normal(jax.random.PRNGKey(0), (m, n))
    ess = float(effective_sample_size(chains))
    assert 0.75 * m * n < ess <= m * n


@pytest.mark.slow
def test_ess_correlated_chain():
    """AR(1) with autocorrelation phi: ESS ~ m*n*(1-phi)/(1+phi)."""
    phi = 0.9
    m, n = 2, 20000
    noise = np.random.default_rng(0).normal(size=(m, n))
    x = np.zeros((m, n))
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + noise[:, t] * np.sqrt(1 - phi**2)
    ess = float(effective_sample_size(jnp.asarray(x)))
    expected = m * n * (1 - phi) / (1 + phi)
    assert 0.5 * expected < ess < 2.0 * expected


@pytest.mark.slow
def test_ess_multidimensional_variable():
    chains = jax.random.normal(jax.random.PRNGKey(1), (2, 500, 3, 2))
    ess = effective_sample_size(chains)
    assert ess.shape == (3, 2)
    assert np.all(np.asarray(ess) > 0)


def test_ess_nan_on_nonfinite_chain():
    """A diverged (non-finite) chain must report NaN, never the m*n cap.

    Regression: NaN autocovariances truncate Geyer's sum at the first lag
    pair, so tau collapses to 1 and a blown-up chain would read as
    *perfectly mixed* (ESS = m*n) — observed on the SGNHT banana sweep at
    stepsizes >= 0.21.
    """
    from pysgmcmc_tpu.diagnostics.sampler_diagnostics import (
        effective_sample_size_bulk,
    )

    chains = np.array(
        jax.random.normal(jax.random.PRNGKey(2), (2, 200, 2)))
    chains[0, 150:, 0] = np.nan  # one dim of one chain diverges
    for estimator in (effective_sample_size, effective_sample_size_bulk):
        ess = np.asarray(estimator(jnp.asarray(chains)))
        assert ess.shape == (2,)
        assert np.isnan(ess[0])       # diverged dim -> NaN
        assert np.isfinite(ess[1])    # healthy dim unaffected


def test_gelman_rubin_converged_vs_diverged():
    key = jax.random.PRNGKey(2)
    converged = jax.random.normal(key, (4, 1000))
    r_hat = float(gelman_rubin(converged))
    assert abs(r_hat - 1.0) < 0.05

    # Chains with different means: R_hat must blow up.
    offsets = jnp.asarray([0.0, 5.0, -5.0, 10.0])[:, None]
    diverged = converged + offsets
    assert float(gelman_rubin(diverged)) > 2.0


def test_gelman_rubin_requires_two_chains():
    import pytest

    with pytest.raises(ValueError):
        gelman_rubin(jnp.zeros((1, 100)))


@pytest.mark.slow
def test_from_sampler_entrypoints():
    """Reference-style entry points run chains in parallel and return pytrees."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGHMCSampler(cost_fn, stepsize_schedule=0.05, burn_in_steps=100)

    ess = effective_sample_sizes(
        sampler,
        jnp.zeros(2),
        key=0,
        n_chains=2,
        samples_per_chain=200,
        keep_every=2,
    )
    assert np.asarray(ess).shape == (2,)
    assert np.all(np.asarray(ess) > 0)

    r_hat = gelman_rubin_from_sampler(
        sampler,
        jnp.zeros(2),
        key=1,
        n_chains=4,
        samples_per_chain=500,
        keep_every=1,
        jitter=0.5,
    )
    assert np.asarray(r_hat).shape == (2,)
    # Gaussian target, modest chains: should be near 1.
    assert np.all(np.asarray(r_hat) < 1.7)

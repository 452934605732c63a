import jax
import numpy as np
import pytest

from pysgmcmc_tpu.diagnostics.objective_functions import sinc
from pysgmcmc_tpu.models import BayesianNeuralNetwork
from pysgmcmc_tpu.parallel.mesh import chain_mesh


def _sinc_data(seed=1, n=100):
    rng = np.random.RandomState(seed)
    x_train = rng.uniform(0.0, 1.0, (n, 1))
    y_train = np.asarray(sinc(x_train))
    x_test = np.linspace(0, 1, 100)[:, None]
    y_test = np.asarray(sinc(x_test))
    return x_train, y_train, x_test, y_test


@pytest.mark.slow
def test_multichain_training_pools_samples():
    x_train, y_train, x_test, y_test = _sinc_data()
    bnn = BayesianNeuralNetwork(
        n_chains=4, n_nets=8, burn_in_steps=500, sample_steps=50, seed=3
    )
    bnn.train(x_train, y_train)
    assert bnn._n_collected == 8
    f_out, _ = bnn.predict(x_test, return_individual_predictions=True)
    assert f_out.shape == (8, 100)
    # members from different chains differ
    assert np.std(f_out, axis=0).mean() > 1e-6
    mean, _ = bnn.predict(x_test)
    mse = float(np.mean((mean - y_test) ** 2))
    assert mse < 0.2


@pytest.mark.slow
def test_multichain_on_mesh():
    x_train, y_train, x_test, _ = _sinc_data()
    mesh = chain_mesh(8)
    bnn = BayesianNeuralNetwork(
        n_chains=8, n_nets=8, burn_in_steps=200, sample_steps=20,
        seed=0, mesh=mesh,
    )
    bnn.train(x_train, y_train)
    mean, var = bnn.predict(x_test)
    assert np.isfinite(mean).all()
    assert np.all(var >= 0)


def test_multichain_validation():
    with pytest.raises(ValueError):
        BayesianNeuralNetwork(n_chains=0)
    with pytest.raises(ValueError):
        BayesianNeuralNetwork(n_chains=3, n_nets=10)

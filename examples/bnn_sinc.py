"""Bayesian neural network regression on sinc data.

Executable counterpart of the reference's BNN quickstart usage
(``docs/source/notebooks/api_quickstart.ipynb`` BNN section +
``tests/bayesian_neural_network/test_train_predict.py``): train the
3x50-tanh heteroscedastic BNN with SGHMC, predict with the vmapped
ensemble, and report accuracy + calibration.  Also shows multi-chain
training and the SVGD ensemble variant.
"""

import numpy as np

from pysgmcmc_tpu.diagnostics.model_diagnostics import (
    expected_calibration_error,
    predictive_log_likelihood,
    rmse,
)
from pysgmcmc_tpu.diagnostics.objective_functions import sinc
from pysgmcmc_tpu.models import BayesianNeuralNetwork
from pysgmcmc_tpu.sampling import Sampler


def main():
    rng = np.random.RandomState(1)
    x_train = rng.uniform(0.0, 1.0, (100, 1))
    y_train = np.asarray(sinc(x_train))
    x_test = np.linspace(0, 1, 100)[:, None]
    y_test = np.asarray(sinc(x_test))

    # 1. Single-chain SGHMC (reference defaults, shortened)
    bnn = BayesianNeuralNetwork(burn_in_steps=1000, n_nets=10, seed=1)
    bnn.train(x_train, y_train)
    mean, variance = bnn.predict(x_test)
    print("SGHMC   : RMSE {:.4f}".format(float(rmse(mean, y_test))))

    f_out, noise = bnn.predict(x_test, return_individual_predictions=True)
    print("          lpd {:.3f}  ECE {:.3f}".format(
        float(predictive_log_likelihood(f_out, noise, y_test)),
        float(expected_calibration_error(f_out, noise, y_test)),
    ))

    # 2. Multi-chain training: 4 chains pooled (better posterior coverage)
    bnn4 = BayesianNeuralNetwork(
        n_chains=4, n_nets=12, burn_in_steps=500, sample_steps=50, seed=2
    )
    bnn4.train(x_train, y_train)
    mean4, _ = bnn4.predict(x_test)
    print("4 chains: RMSE {:.4f}".format(float(rmse(mean4, y_test))))

    # 3. SVGD particle-network ensemble
    bnn_svgd = BayesianNeuralNetwork(
        sampling_method=Sampler.SVGD, stepsize_schedule=1e-3,
        n_nets=8, n_iters=2000, seed=3,
    )
    bnn_svgd.train(x_train, y_train)
    mean_svgd, _ = bnn_svgd.predict(x_test)
    print("SVGD    : RMSE {:.4f}".format(float(rmse(mean_svgd, y_test))))


if __name__ == "__main__":
    main()

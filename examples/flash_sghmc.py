"""flash-SGHMC: the whole-step fused kernel as a model fast path.

The flagship BNN workload (3x50-tanh heteroscedastic net, SGHMC) can run
its entire sampling-phase step — forward, likelihood, hand-derived
backward, in-kernel TPU-PRNG noise, and the SGHMC update — inside ONE
Pallas kernel (``pysgmcmc_tpu.ops.fused_step``).  Measured on a TPU v5e
chip: 4.41 ms for 8192 parallel chains per step (1.86M update-steps/sec)
vs 5.52 ms for the best XLA program, with the sinc posterior-quality gate
at predictive MSE 0.00018.

Opt in with two constructor flags:

- ``network="dense"`` — the TPU-lane-friendly parameterization of the
  same architecture (identical math AND identical init draws)
- ``step_impl="fused"`` — pytree burn-in, flash-SGHMC sampling phase

On CPU (this script's default test environment) the kernel runs in
interpret mode with a zeroed PRNG, so the posterior shown here is
noise-free dynamics — run on a TPU for the real sampler.
"""

import numpy as np

from pysgmcmc_tpu.diagnostics.model_diagnostics import rmse
from pysgmcmc_tpu.diagnostics.objective_functions import sinc
from pysgmcmc_tpu.models import BayesianNeuralNetwork


def main():
    rng = np.random.RandomState(1)
    x_train = rng.uniform(0.0, 1.0, (100, 1))
    y_train = np.asarray(sinc(x_train))
    x_test = np.linspace(0, 1, 100)[:, None]
    y_test = np.asarray(sinc(x_test))

    # dense parameterization, pytree step (works everywhere)
    bnn = BayesianNeuralNetwork(
        network="dense", burn_in_steps=500, n_nets=10, n_iters=2000,
        sample_steps=50, seed=1,
    )
    bnn.train(x_train, y_train)
    mean, _ = bnn.predict(x_test)
    print("dense + pytree    : RMSE {:.4f}".format(float(rmse(mean, y_test))))

    # flash-SGHMC: 4 chains, fused sampling phase
    bnn = BayesianNeuralNetwork(
        network="dense", step_impl="fused", n_chains=4,
        burn_in_steps=500, n_nets=8, n_iters=2000, sample_steps=50,
        compute_dtype=None, seed=1,
    )
    bnn.train(x_train, y_train)
    mean, variance = bnn.predict(x_test)
    print("dense + flash-SGHMC: RMSE {:.4f} (interpret-mode on CPU)".format(
        float(rmse(mean, y_test))))
    assert np.isfinite(mean).all() and np.all(variance >= 0)


if __name__ == "__main__":
    main()

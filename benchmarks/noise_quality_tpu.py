"""On-chip posterior-quality gate for the MXU-CLT noise generator.

Trains the flagship BNN on sinc through ``step_impl='fused'`` twice —
``noise_impl='box_muller'`` and ``noise_impl='hadamard_clt'`` (burn-in
AND sampling phases switch generators) — and reports predictive MSE for
both.  The CLT generator draws a different (statistically equivalent up
to an O(1/n) fourth-moment deficit; distribution gates in
``benchmarks/archive/noise_clt_tpu.py``) noise stream, so the gate is
the posterior quality itself, matching the fused path's round-3 gate
(sinc predictive MSE 0.00018, docs/performance.md).

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python benchmarks/noise_quality_tpu.py
"""

import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True, exit=False)

import numpy as np

sys.path.insert(0, "/root/repo")

from pysgmcmc_tpu.diagnostics.objective_functions import sinc  # noqa: E402
from pysgmcmc_tpu.models.bayesian_neural_network import (  # noqa: E402
    BayesianNeuralNetwork,
)


def main():
    rng = np.random.RandomState(1)
    x_train = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    y_train = np.asarray(sinc(x_train), np.float32).ravel()
    x_grid = np.linspace(0.0, 1.0, 200, dtype=np.float32).reshape(-1, 1)
    y_grid = np.asarray(sinc(x_grid), np.float32).ravel()

    results = []
    for noise_impl in ("box_muller", "hadamard_clt"):
        t0 = time.time()
        bnn = BayesianNeuralNetwork(
            network="dense", step_impl="fused", n_chains=16, n_nets=96,
            n_iters=50000, burn_in_steps=3000, sample_steps=100, seed=7,
            log_every=None, noise_impl=noise_impl)
        bnn.train(x_train, y_train)
        mean, _ = bnn.predict(x_grid)
        mse = float(np.mean((np.asarray(mean).ravel() - y_grid) ** 2))
        row = {
            "noise_impl": noise_impl,
            "sinc_predictive_mse": round(mse, 6),
            "train_plus_predict_s": round(time.time() - t0, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        assert np.isfinite(mse), "non-finite MSE"
        assert mse < 0.01, ("posterior-quality gate FAILED", row)

    bm = next(r for r in results if r["noise_impl"] == "box_muller")
    clt = next(r for r in results if r["noise_impl"] == "hadamard_clt")
    assert clt["sinc_predictive_mse"] <= 2.0 * bm["sinc_predictive_mse"], (
        "CLT posterior quality >2x worse than Box-Muller", results)
    payload = {
        "metric": "sinc predictive MSE, fused BNN, noise generator A/B",
        "gate": "both < 0.01 and CLT <= 2x Box-Muller",
        "workload": "16 chains x 96 nets, 50k iters, burn-in 3000, seed 7",
        "driver": ("models.BayesianNeuralNetwork(step_impl='fused', "
                   "noise_impl=...) -> parallel.packed.sample_chain_fused"),
        "results": results,
    }
    out_path = os.path.join(os.path.dirname(__file__),
                            "results_noise_quality.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

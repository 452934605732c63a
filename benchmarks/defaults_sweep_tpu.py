"""Hardware defaults sweep: every main user-facing surface on the real chip.

The round-5 `n_chains=1` Mosaic failure proved that an all-green CPU suite
(interpret-mode kernels included) can still hide TPU-only compile bugs in
DEFAULT user configurations.  This sweep runs each primary user-facing
surface — the models with their default/near-default settings on every
`step_impl`, each sampler family's driver, the SVGD paths, diagnostics and
checkpointing — as a tiny-but-real program ON the chip, asserts finite
results, and records pass/fail + wall time.

Iteration counts are shrunk (compile time dominates; the point is "does
the shipped default compile and produce finite numbers on hardware", not
statistical quality — quality gates live in the dedicated benchmarks).

Run ON THE CHIP:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/defaults_sweep_tpu.py
"""

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sinc_data(n=100, seed=0):
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    rng = np.random.RandomState(seed)
    x = rng.uniform(0.0, 1.0, (n, 1))
    return x, np.asarray(sinc(x))


def bnn_pytree_default_single_chain():
    # the reference's own default call pattern: BNN(), train, predict
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        BayesianNeuralNetwork,
    )

    x, y = _sinc_data()
    bnn = BayesianNeuralNetwork(
        n_iters=400, burn_in_steps=200, sample_steps=4, n_nets=20, seed=1)
    bnn.train(x, y)
    mean, var = bnn.predict(np.linspace(0, 1, 64).reshape(-1, 1))
    assert np.isfinite(mean).all() and np.isfinite(var).all()


def bnn_lanes_single_chain():
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        BayesianNeuralNetwork,
    )

    x, y = _sinc_data()
    bnn = BayesianNeuralNetwork(
        n_iters=400, burn_in_steps=200, sample_steps=4, n_nets=20,
        step_impl="lanes", seed=1)
    bnn.train(x, y)
    mean, _ = bnn.predict(np.linspace(0, 1, 64).reshape(-1, 1))
    assert np.isfinite(mean).all()


def bnn_fused_single_chain():
    # the config that exposed the Mosaic 1-row-block failure
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        BayesianNeuralNetwork,
    )

    x, y = _sinc_data()
    bnn = BayesianNeuralNetwork(
        n_iters=600, burn_in_steps=300, sample_steps=4, n_nets=20,
        step_impl="fused", network="dense", seed=1)
    bnn.train(x, y)
    mean, _ = bnn.predict(np.linspace(0, 1, 64).reshape(-1, 1))
    assert np.isfinite(mean).all()


def bnn_fused_multichain_sgld():
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        BayesianNeuralNetwork,
    )
    from pysgmcmc_tpu.sampling import Sampler

    x, y = _sinc_data()
    bnn = BayesianNeuralNetwork(
        sampling_method=Sampler.SGLD, n_chains=16, n_iters=600,
        burn_in_steps=300, sample_steps=4, n_nets=32,
        step_impl="fused", network="dense", seed=1)
    bnn.train(x, y)
    mean, _ = bnn.predict(np.linspace(0, 1, 64).reshape(-1, 1))
    assert np.isfinite(mean).all()


def bnn_svgd_ensemble():
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        BayesianNeuralNetwork,
    )
    from pysgmcmc_tpu.sampling import Sampler

    x, y = _sinc_data()
    bnn = BayesianNeuralNetwork(
        sampling_method=Sampler.SVGD, n_nets=20, n_iters=300, seed=1)
    bnn.train(x, y)
    mean, _ = bnn.predict(np.linspace(0, 1, 64).reshape(-1, 1))
    assert np.isfinite(mean).all()


def sampler_families_banana():
    # every sampler family's init/step through one jitted sample_chain
    from pysgmcmc_tpu.diagnostics.objective_functions import (
        banana_log_likelihood, to_negative_log_likelihood)
    from pysgmcmc_tpu.sampling import Sampler

    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    from pysgmcmc_tpu.samplers.base import sample_chain

    for method in (Sampler.SGHMC, Sampler.SGLD, Sampler.PSGLD,
                   Sampler.SGNHT, Sampler.RelativisticSGHMC):
        sampler = Sampler.get_sampler(
            method, cost_fn=cost_fn, stepsize_schedule=0.01)
        state = sampler.init(
            jnp.zeros(2), key=jax.random.PRNGKey(3))
        _, pos, costs = sample_chain(
            sampler, state, jax.random.PRNGKey(4), 200)
        assert np.isfinite(np.asarray(pos)).all(), method
        assert np.isfinite(np.asarray(costs)).all(), method


def svgd_particles_banana():
    from pysgmcmc_tpu.diagnostics.objective_functions import (
        banana_log_likelihood, to_negative_log_likelihood)
    from pysgmcmc_tpu.samplers.base import sample_chain
    from pysgmcmc_tpu.samplers.svgd import SVGDSampler

    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    sampler = SVGDSampler(cost_fn=cost_fn, stepsize_schedule=0.5)
    particles = jax.random.normal(jax.random.PRNGKey(0), (50, 2))
    state = sampler.init(particles)
    _, pos, _ = sample_chain(sampler, state, jax.random.PRNGKey(1), 100)
    assert np.isfinite(np.asarray(pos)).all()


def svgd_streaming_kernel():
    from pysgmcmc_tpu.ops.svgd_streaming import svgd_phi_streaming

    key = jax.random.PRNGKey(0)
    particles = jax.random.normal(key, (4096, 2))
    grads = -particles

    phi = svgd_phi_streaming(particles, grads, 1.0)
    assert np.isfinite(np.asarray(phi)).all()


def bayesian_linear_regression():
    from pysgmcmc_tpu.models.bayesian_linear_regression import (
        BayesianLinearRegression,
    )

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (80, 2))
    y = 2.0 * x[:, 0] - 1.0 * x[:, 1] + 0.1 * rng.randn(80)
    model = BayesianLinearRegression(
        n_nets=20, sample_steps=5, burn_in_steps=400, seed=1)
    model.train(x, y)
    mean, var = model.predict(x[:16])
    assert np.isfinite(mean).all() and np.isfinite(var).all()


def bayesian_logistic_regression():
    from pysgmcmc_tpu.models.bayesian_logistic_regression import (
        BayesianLogisticRegression,
    )

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (80, 2))
    y = (x[:, 0] + x[:, 1] > 0).astype(np.float64)
    model = BayesianLogisticRegression(
        n_nets=20, sample_steps=5, burn_in_steps=400, seed=1)
    model.train(x, y)
    probs, var = model.predict(x[:16])
    assert np.isfinite(probs).all() and np.isfinite(var).all()
    assert ((probs >= 0) & (probs <= 1)).all()


def checkpoint_roundtrip_on_chip():
    import tempfile

    from pysgmcmc_tpu.diagnostics.objective_functions import (
        banana_log_likelihood, to_negative_log_likelihood)
    from pysgmcmc_tpu.samplers.base import sample_chain
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
    from pysgmcmc_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)

    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    sampler = SGHMCSampler(cost_fn=cost_fn, stepsize_schedule=0.01)
    state = sampler.init(jnp.zeros(2), key=jax.random.PRNGKey(0))
    state, _, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(1), 50)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ckpt")
        save_checkpoint(path, state)
        restored = restore_checkpoint(path, like=state)
    a = jax.tree_util.tree_leaves(state)
    b = jax.tree_util.tree_leaves(restored)
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def diagnostics_on_chip():
    from pysgmcmc_tpu.diagnostics.sampler_diagnostics import (
        effective_sample_size, gelman_rubin)

    chains = np.random.RandomState(0).randn(4, 500, 2)
    ess = effective_sample_size(jnp.asarray(chains))
    psrf = gelman_rubin(jnp.asarray(chains))
    assert np.isfinite(np.asarray(ess)).all()
    assert np.isfinite(np.asarray(psrf)).all()


SURFACES = [
    bnn_pytree_default_single_chain,
    bnn_lanes_single_chain,
    bnn_fused_single_chain,
    bnn_fused_multichain_sgld,
    bnn_svgd_ensemble,
    sampler_families_banana,
    svgd_particles_banana,
    svgd_streaming_kernel,
    bayesian_linear_regression,
    bayesian_logistic_regression,
    checkpoint_roundtrip_on_chip,
    diagnostics_on_chip,
]


def main():
    rows = []
    n_fail = 0
    for fn in SURFACES:
        t0 = time.time()
        try:
            fn()
            rows.append({"surface": fn.__name__, "ok": True,
                         "s": round(time.time() - t0, 1)})
            print("PASS %-34s %6.1fs" % (fn.__name__, time.time() - t0),
                  flush=True)
        except Exception as exc:
            n_fail += 1
            rows.append({"surface": fn.__name__, "ok": False,
                         "s": round(time.time() - t0, 1),
                         "error": "{}: {}".format(
                             type(exc).__name__, str(exc)[:300])})
            print("FAIL %-34s %6.1fs  %s" % (
                fn.__name__, time.time() - t0, str(exc)[:160]), flush=True)
            traceback.print_exc(limit=4)

    result = {
        "metric": "hardware defaults sweep: user-facing surfaces on chip",
        "driver": "benchmarks/defaults_sweep_tpu.py (models.*, samplers.*, "
                  "parallel.packed, ops.svgd_streaming, utils.checkpoint, "
                  "diagnostics.sampler_diagnostics)",
        "device": str(jax.devices()[0]),
        "n_surfaces": len(SURFACES),
        "n_fail": n_fail,
        "rows": rows,
    }
    out = os.path.join(os.path.dirname(__file__),
                       "results_defaults_sweep.json")
    with open(out, "w") as handle:
        json.dump(result, handle, indent=1)
    print(json.dumps({"surfaces": len(SURFACES), "failed": n_fail}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

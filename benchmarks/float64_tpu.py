"""float64 ON THE CHIP: determinism + the software-emulation cost multiplier.

The reference runs float64 everywhere (its TF default dtype,
``/root/reference/pysgmcmc/samplers/sghmc.py:34``,
``models/bayesian_neural_network.py:156``); this framework defaults to
f32/bf16 (the TPU-native dtypes) and supports x64 via ``jax_enable_x64``.
TPU has no f64 ALUs — XLA software-emulates doubles — so "f64 works on
TPU" is a claim that must be *measured*, not asserted (SURVEY.md §7 hard
part c).  This script runs, on the real chip:

1. the 2-D banana seed-determinism protocol in float64 (two identical
   vmapped 8-chain runs must be bitwise equal, dtype verified), and
2. a short BNN posterior sampling scan (the bench.py workload at 64
   chains, pytree path — the kernel fast paths are f32/bf16 by design)
   in float32 and float64, recording the emulation cost multiplier.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/float64_tpu.py

Writes ``benchmarks/results_float64.json``; docs/performance.md quotes it.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from pysgmcmc_tpu.diagnostics.objective_functions import (
    banana_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler

N_CHAINS_BANANA = 8
BANANA_STEPS = 2000
N_CHAINS_BNN = 64
BNN_STEPS = 200


def banana_determinism():
    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    sampler = SGHMCSampler(
        cost_fn, stepsize_schedule=0.1, burn_in_steps=500,
        dtype=jnp.float64)

    @jax.jit
    def run(keys):
        def one(k):
            k1, k2 = jax.random.split(k)
            st = sampler.init(jnp.zeros(2, jnp.float64), k1)
            _, pos, costs = sample_chain(sampler, st, k2, BANANA_STEPS)
            return pos, costs
        return jax.vmap(one)(keys)

    keys = jax.random.split(jax.random.PRNGKey(11), N_CHAINS_BANANA)
    pos_a, costs_a = jax.block_until_ready(run(keys))
    t0 = time.perf_counter()
    pos_b, costs_b = jax.block_until_ready(run(keys))
    wall = time.perf_counter() - t0

    assert pos_a.dtype == jnp.float64, pos_a.dtype
    assert np.isfinite(np.asarray(pos_a)).all()
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_array_equal(np.asarray(costs_a), np.asarray(costs_b))
    # f64 really exercised: the draws use the extra mantissa bits
    assert (np.asarray(pos_a) != np.asarray(pos_a, np.float32)).any()
    return {"chains": N_CHAINS_BANANA, "steps": BANANA_STEPS,
            "deterministic_bitwise": True, "dtype": "float64",
            "wall_s": round(wall, 3)}


def bnn_scan_wall(dtype):
    from bench import build_workload
    from pysgmcmc_tpu.parallel.chains import run_chains

    sampler, positions, select_batch = build_workload(
        N_CHAINS_BNN, dtype=dtype, compute_dtype=None)
    sampler.burn_in_steps = 100

    def run(key):
        return run_chains(
            sampler, positions, key, 1,
            batch_fn=select_batch, keep_every=BNN_STEPS)

    jax.block_until_ready(run(jax.random.PRNGKey(0)))  # compile + burn
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        _, costs = run(jax.random.PRNGKey(1 + i))
        jax.block_until_ready(costs)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(costs)).all()
    assert jax.tree_util.tree_leaves(positions)[0].dtype == dtype
    return best


def main():
    assert jax.default_backend() not in ("cpu",), (
        "run this on the chip: backend is " + jax.default_backend())

    # f32 first, with x64 globally OFF (the shipped default config)
    wall32 = bnn_scan_wall(jnp.float32)

    jax.config.update("jax_enable_x64", True)
    try:
        banana = banana_determinism()
        wall64 = bnn_scan_wall(jnp.float64)
    finally:
        jax.config.update("jax_enable_x64", False)

    payload = {
        "metric": "float64 on TPU (software emulation): determinism + "
                  "cost multiplier vs float32",
        "platform": jax.devices()[0].device_kind,
        "banana_f64": banana,
        "bnn_scan": {
            "workload": "{} chains x 3x50 BNN, {}-step sampling scan, "
                        "pytree path (kernel fast paths are f32/bf16 "
                        "by design)".format(N_CHAINS_BNN, BNN_STEPS),
            "wall_f32_s": round(wall32, 4),
            "wall_f64_s": round(wall64, 4),
            "f64_cost_multiplier": round(wall64 / wall32, 2),
        },
        "driver": "samplers.base.sample_chain via parallel.chains.run_chains",
    }
    out = os.path.join(os.path.dirname(__file__), "results_float64.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

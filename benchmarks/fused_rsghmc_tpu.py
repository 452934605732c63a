"""On-chip measurement: fused whole-step relativistic-SGHMC kernel.

8192 chains x dense 3x50 BNN, 200-step scans through
``ops/fused_step.fused_bnn_step_rsghmc``, A/B'd against the pytree path —
the same protocol as the other fused-family measurements in
docs/performance.md.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/fused_rsghmc_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_workload  # noqa: E402
from pysgmcmc_tpu.parallel.packed import sample_chain_fused  # noqa: E402
from pysgmcmc_tpu.samplers.base import sample_chain  # noqa: E402
from pysgmcmc_tpu.samplers.relativistic_sghmc import (  # noqa: E402
    RelativisticSGHMCSampler,
)


def main():
    n_chains = 8192
    warm_steps = 500
    scan_steps = 200
    repeats = 3

    base, positions, select_batch, (x_data, y_data) = build_workload(
        n_chains, network="dense", return_data=True)
    sampler = RelativisticSGHMCSampler(
        base.cost_fn, stepsize_schedule=1e-3,
        gaussian_prior_scale=base.gaussian_prior_scale)

    @jax.jit
    def warm(positions, key):
        def one(position, ck):
            k_init, k_run = jax.random.split(ck)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_run, 1, batch_fn=select_batch,
                keep_every=warm_steps, collect_costs=False)
            return state
        return jax.vmap(one)(positions, jax.random.split(key, n_chains))

    states = warm(positions, jax.random.PRNGKey(0))

    @jax.jit
    def pytree_path(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=scan_steps)
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, n_chains))

    @jax.jit
    def fused_path(states, key):
        states, _, costs = sample_chain_fused(
            sampler, states, key, 1, x_data, y_data,
            batch_size=20, keep_every=scan_steps, block_chains=32,
            state_dtype=jnp.bfloat16, collect_positions=False)
        return states, costs

    for label, fn in (("pytree", pytree_path), ("fused", fused_path)):
        out = fn(states, jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        best = float("inf")
        for i in range(repeats):
            t0 = time.perf_counter()
            out = fn(states, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(out[1])
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(np.asarray(out[1])).all(), label
        ms = best / scan_steps * 1e3
        print("RSGHMC %-8s %.3f ms/step (%.2fM steps/s)" % (
            label, ms, n_chains / ms / 1e3))


if __name__ == "__main__":
    main()

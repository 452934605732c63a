"""SGLD on the chains-on-lanes fused path: on-chip A/B vs the pytree path.

The flagship BNN workload with SGLD instead of SGHMC (8192 chains,
sampling phase after burn-in): the momentum-free slim kernel
(ops/slim_update.slim_sgld_update) vs the vmapped pytree step.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.parallel.packed import sample_chain_lanes
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sgld import SGLDSampler

N_CHAINS = 8192
STEPS = 200


def main():
    # same data/cost as the bench workload, SGLD sampler
    sampler_h, positions, select_batch = build_workload(
        N_CHAINS, network="dense")
    sampler = SGLDSampler(
        sampler_h.cost_fn, stepsize_schedule=1e-5,
        burn_in_steps=3000, scale_grad=sampler_h.scale_grad,
        gaussian_prior_scale=sampler_h.gaussian_prior_scale,
    )

    @jax.jit
    def burn(positions, key):
        def one(position, ck):
            k_init, k_burn = jax.random.split(ck)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_burn, 1, batch_fn=select_batch,
                keep_every=3000, collect_costs=False, phase="burn_in")
            return state
        return jax.vmap(one)(positions, jax.random.split(key, N_CHAINS))

    states = burn(positions, jax.random.PRNGKey(0))

    @jax.jit
    def pytree_path(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS, phase="sampling")
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, N_CHAINS))

    @jax.jit
    def lanes_path(states, key):
        states, _, costs = sample_chain_lanes(
            sampler, states, key, 1, batch_fn=select_batch,
            keep_every=STEPS, backend="pallas",
            state_dtype=jnp.bfloat16, collect_positions=False)
        return states, costs

    def timeit(fn):
        out = fn(states, jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(states, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(out[1])
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(np.asarray(out[1])).all()
        return best / STEPS * 1e3

    for name, fn in (("SGLD pytree", pytree_path),
                     ("SGLD lanes pallas", lanes_path)):
        ms = timeit(fn)
        print("%-20s %.3f ms/step (%.2fM steps/s)" % (
            name, ms, N_CHAINS / ms / 1e3))


if __name__ == "__main__":
    main()

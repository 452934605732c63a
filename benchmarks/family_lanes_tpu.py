"""pSGLD + relativistic SGHMC + SGNHT on the lanes path: on-chip A/B vs pytree.

Completes the kernel-family measurement table (SGHMC and SGLD measured in
packed_ab_tpu.py / sgld_lanes_tpu.py) on the flagship 8192-chain BNN
workload.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.parallel.packed import sample_chain_lanes
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.psgld import PSGLDSampler
from pysgmcmc_tpu.samplers.relativistic_sghmc import RelativisticSGHMCSampler
from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler

N_CHAINS = 8192
STEPS = 200


def measure(name, sampler, positions, select_batch, warm_steps=500):
    @jax.jit
    def warm(positions, key):
        def one(position, ck):
            k_init, k_run = jax.random.split(ck)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_run, 1, batch_fn=select_batch,
                keep_every=warm_steps, collect_costs=False)
            return state
        return jax.vmap(one)(positions, jax.random.split(key, N_CHAINS))

    states = warm(positions, jax.random.PRNGKey(0))

    @jax.jit
    def pytree_path(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS)
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, N_CHAINS))

    @jax.jit
    def lanes_path(states, key):
        states, _, costs = sample_chain_lanes(
            sampler, states, key, 1, batch_fn=select_batch,
            keep_every=STEPS, backend="pallas",
            state_dtype=jnp.bfloat16, collect_positions=False)
        return states, costs

    for label, fn in (("pytree", pytree_path), ("lanes", lanes_path)):
        out = fn(states, jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(states, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(out[1])
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(np.asarray(out[1])).all(), (name, label)
        ms = best / STEPS * 1e3
        print("%-10s %-8s %.3f ms/step (%.2fM steps/s)" % (
            name, label, ms, N_CHAINS / ms / 1e3))


def main():
    base, positions, select_batch = build_workload(N_CHAINS, network="dense")
    measure("pSGLD", PSGLDSampler(
        base.cost_fn, stepsize_schedule=1e-4, scale_grad=base.scale_grad,
    ), positions, select_batch)
    measure("RSGHMC", RelativisticSGHMCSampler(
        base.cost_fn, stepsize_schedule=1e-3,
    ), positions, select_batch)
    measure("SGNHT", SGNHTSampler(
        base.cost_fn, stepsize_schedule=1e-3, scale_grad=base.scale_grad,
    ), positions, select_batch)


if __name__ == "__main__":
    main()

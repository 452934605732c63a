"""On-chip measurement: wide 128-slot (H=100) multi-step fused kernel.

The multi-step VMEM-resident kernels originally supported only the
64-slot flagship layout (H <= 50); this measures the width-parameterized
variant on an H=100 dense BNN — 4x the per-chain FLOPs and state of the
flagship — for SGHMC and SGNHT, 8192 chains x 200-step launches.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/multistep_wide_tpu.py
"""

import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
from pysgmcmc_tpu.diagnostics.objective_functions import sinc
from pysgmcmc_tpu.models.architectures import dense_network
from pysgmcmc_tpu.models.bayesian_neural_network import (
    log_variance_prior_log_like,
)
from pysgmcmc_tpu.parallel.packed import sample_chain_fused
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler

H, N_CHAINS, SCAN_STEPS = 100, 8192, 200


def build(h=H, n_chains=N_CHAINS, n_data=100, batch_size=20):
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (n_data, 1)).astype(np.float32)
    y = np.asarray(sinc(x), np.float32)
    init_fn, apply_fn = dense_network(1, units=(h, h, h))
    params = jax.vmap(init_fn)(
        jax.random.split(jax.random.PRNGKey(0), n_chains))

    def cost(p, batch):
        xb, yb = batch
        net = apply_fn(p, xb)
        mse = jnp.square(yb - net[:, 0:1])
        flv = net[:, 1:2]
        ll = jnp.sum(jnp.sum(
            -mse * 0.5 / (jnp.exp(flv) + 1e-16) - 0.5 * flv,
            axis=1)) / batch_size
        ll += log_variance_prior_log_like(flv) / n_data
        return -ll

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), batch_size)
    return params, cost, select, (jnp.asarray(x), jnp.asarray(y))


def measure(name, sampler, params, select, x, y, block_chains,
            state_dtype=jnp.bfloat16):
    @jax.jit
    def warm(params, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            st = sampler.init(p, k1)
            st, _ = sample_chain(sampler, st, k2, 1, batch_fn=select,
                                 keep_every=500, collect_costs=False)
            return st
        return jax.vmap(one)(params, jax.random.split(key, N_CHAINS))

    states = warm(params, jax.random.PRNGKey(0))

    @jax.jit
    def f(states, key):
        states, _, costs = sample_chain_fused(
            sampler, states, key, 1, x, y, batch_size=20,
            keep_every=SCAN_STEPS, block_chains=block_chains,
            state_dtype=state_dtype, collect_positions=False,
            multistep=True)
        return states, costs

    out = f(states, jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = f(states, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out[1])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out[1])).all(), name
    ms = best / SCAN_STEPS * 1e3
    print("%s H=%d wide multi-step (C=%d)  %.3f ms/step (%.2fM steps/s)"
          % (name, H, block_chains, ms, N_CHAINS / ms / 1e3))


def main():
    params, cost, select, (x, y) = build()
    for block_chains in (8, 16, 32):
        measure("SGHMC", SGHMCSampler(
            cost, stepsize_schedule=1e-3, burn_in_steps=10,
            scale_grad=100.0, gaussian_prior_scale=1e-5),
            params, select, x, y, block_chains)
    measure("SGNHT", SGNHTSampler(
        cost, stepsize_schedule=1e-3, gaussian_prior_scale=1e-5),
        params, select, x, y, 16, state_dtype=jnp.float32)


if __name__ == "__main__":
    main()

"""On-chip measurement: pSGLD + RSGHMC multi-step fused kernels.

Completes the k-steps-per-launch VMEM-resident family (SGHMC/SGLD/SGNHT
measured in multistep_tpu.py / multistep_sgld_tpu.py /
multistep_sgnht_tpu.py): 8192 chains x dense 3x50 BNN, 200-step scans.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/multistep_family_tpu.py
"""

import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from bench import build_workload
from pysgmcmc_tpu.parallel.packed import sample_chain_fused
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.psgld import PSGLDSampler
from pysgmcmc_tpu.samplers.relativistic_sghmc import RelativisticSGHMCSampler

n_chains, scan_steps = 8192, 200


def measure(name, sampler, state_dtype, positions, select_batch, x, y):
    @jax.jit
    def warm(positions, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            s = sampler.init(p, k1)
            s, _ = sample_chain(sampler, s, k2, 1, batch_fn=select_batch,
                                keep_every=500, collect_costs=False)
            return s
        return jax.vmap(one)(positions, jax.random.split(key, n_chains))
    states = warm(positions, jax.random.PRNGKey(0))

    @jax.jit
    def f(states, key):
        states, _, costs = sample_chain_fused(
            sampler, states, key, 1, x, y, batch_size=20,
            keep_every=scan_steps, block_chains=32,
            state_dtype=state_dtype, collect_positions=False,
            multistep=True)
        return states, costs

    out = f(states, jax.random.PRNGKey(1)); jax.block_until_ready(out[1])
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = f(states, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out[1])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out[1])).all(), name
    ms = best / scan_steps * 1e3
    print("%s fused multi-step  %.3f ms/step (%.2fM steps/s)" % (
        name, ms, n_chains / ms / 1e3))

def main():
    base, positions, select_batch, (x, y) = build_workload(
        n_chains, network="dense", return_data=True)
    measure("pSGLD", PSGLDSampler(
        base.cost_fn, stepsize_schedule=1e-4, scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale), jnp.float32,
        positions, select_batch, x, y)
    measure("RSGHMC", RelativisticSGHMCSampler(
        base.cost_fn, stepsize_schedule=1e-3,
        gaussian_prior_scale=base.gaussian_prior_scale), jnp.bfloat16,
        positions, select_batch, x, y)


if __name__ == "__main__":
    main()

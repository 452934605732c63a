"""On-chip A/B: single-step vs multi-step fused SGLD on the flagship.

8192 chains x dense 3x50 BNN after burn-in, 200-step scans: the
single-step whole-step kernel (one launch + theta HBM round trip per
step) vs the k=200 VMEM-resident multi-step kernel
(``ops/fused_step.fused_bnn_multistep_sgld``) — the SGLD analog of the
SGHMC 3.62 -> 3.19 ms/step multi-step win.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/multistep_sgld_tpu.py
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
from pysgmcmc_tpu.samplers.sgld import SGLDSampler  # noqa: E402


def main():
    n_chains = 8192
    burn_in_steps = 3000
    scan_steps = 200
    repeats = 3

    base, positions, select_batch, (x_data, y_data) = build_workload(
        n_chains, network="dense", return_data=True)
    sampler = SGLDSampler(
        base.cost_fn, stepsize_schedule=1e-5, burn_in_steps=burn_in_steps,
        scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale)

    @jax.jit
    def init_and_burn(positions, key):
        def one(position, ck):
            k_init, k_burn = jax.random.split(ck)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_burn, 1, batch_fn=select_batch,
                keep_every=burn_in_steps, collect_costs=False,
                phase="burn_in")
            return state
        return jax.vmap(one)(positions, jax.random.split(key, n_chains))

    states = init_and_burn(positions, jax.random.PRNGKey(0))

    def make_scan(multistep):
        @jax.jit
        def scan(states, key):
            states, _, costs = sample_chain_fused(
                sampler, states, key, 1, x_data, y_data,
                batch_size=20, keep_every=scan_steps, block_chains=32,
                state_dtype=jnp.bfloat16, collect_positions=False,
                multistep=multistep)
            return states, costs
        return scan

    for label, fn in (("single-step", make_scan(False)),
                      ("multi-step", make_scan(True))):
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
        print("SGLD fused %-12s %.3f ms/step (%.2fM steps/s)" % (
            label, ms, n_chains / ms / 1e3))


if __name__ == "__main__":
    main()

"""On-chip A/B: single-step vs multi-step fused SGNHT on the flagship.

8192 chains x dense 3x50 BNN, 200-step scans: the single-step whole-step
kernel vs the k=200 VMEM-resident multi-step kernel
(``ops/fused_step.fused_bnn_multistep_sgnht``) with the per-chain
thermostat riding the aliased xi output ref across the whole loop.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/multistep_sgnht_tpu.py
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
from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler  # noqa: E402


def main():
    n_chains, scan_steps = 8192, 200
    base, positions, select_batch, (x, y) = build_workload(
        n_chains, network="dense", return_data=True)
    sampler = SGNHTSampler(
        base.cost_fn, stepsize_schedule=1e-3, scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale)

    @jax.jit
    def warm(positions, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            s = sampler.init(p, k1)
            s, _ = sample_chain(
                sampler, s, k2, 1, batch_fn=select_batch,
                keep_every=500, collect_costs=False)
            return s
        return jax.vmap(one)(positions, jax.random.split(key, n_chains))

    states = warm(positions, jax.random.PRNGKey(0))

    def make(multistep):
        @jax.jit
        def f(states, key):
            states, _, costs = sample_chain_fused(
                sampler, states, key, 1, x, y, batch_size=20,
                keep_every=scan_steps, block_chains=32,
                state_dtype=jnp.bfloat16, collect_positions=False,
                multistep=multistep)
            return states, costs
        return f

    for label, fn in (("single-step", make(False)),
                      ("multi-step", make(True))):
        out = fn(states, jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(states, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(out[1])
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(np.asarray(out[1])).all(), label
        xi = np.asarray(out[0].xi)
        assert np.isfinite(xi).all()
        ms_step = best / scan_steps * 1e3
        print("SGNHT fused %-12s %.3f ms/step (%.2fM steps/s)  "
              "xi mean %.3f" % (
                  label, ms_step, n_chains / ms_step / 1e3, xi.mean()))


if __name__ == "__main__":
    main()

"""On-chip A/B: paired-dot vs standard multi-step kernels, whole family.

Measures pair_dots=True against pair_dots=False for all five samplers'
multi-step kernels on the 8192-chain flagship (dense 3x50 BNN, 200-step
launches).  The pairing halves the batched-dot instance count (the
measured roofline bound) at 2x padded FLOPs — this quantifies the trade
per sampler.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python benchmarks/paired_family_tpu.py
"""

import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True, exit=False)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_workload  # noqa: E402
from pysgmcmc_tpu.parallel.packed import sample_chain_fused  # noqa: E402
from pysgmcmc_tpu.samplers.base import sample_chain  # noqa: E402
from pysgmcmc_tpu.samplers.psgld import PSGLDSampler  # noqa: E402
from pysgmcmc_tpu.samplers.relativistic_sghmc import (  # noqa: E402
    RelativisticSGHMCSampler,
)
from pysgmcmc_tpu.samplers.sgld import SGLDSampler  # noqa: E402
from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler  # noqa: E402

n_chains, scan_steps = 8192, 200
block_chains, interpret, n_repeats = 32, False, 3

# CPU smoke mode: tiny scale + interpret kernels validate the whole
# script before chip time is spent on it.
if os.environ.get("PYSGMCMC_BENCH_SMOKE"):
    n_chains, scan_steps = 4, 2
    block_chains, interpret, n_repeats = 4, True, 1


def measure(name, sampler, state_dtype, positions, select_batch, x, y):
    # adaptive samplers (SGHMC/SGLD) warm through their full burn-in so
    # minv is frozen; the rest just spin up their accumulators
    warm_steps = getattr(sampler, "burn_in_steps", 0) or 500
    if os.environ.get("PYSGMCMC_BENCH_SMOKE"):
        warm_steps = 10

    @jax.jit
    def warm(positions, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            s = sampler.init(p, k1)
            s, _ = sample_chain(
                sampler, s, k2, 1, batch_fn=select_batch,
                keep_every=warm_steps, collect_costs=False)
            return s
        return jax.vmap(one)(positions, jax.random.split(key, n_chains))
    states = warm(positions, jax.random.PRNGKey(0))
    jax.block_until_ready(states)

    for paired in (False, True):
        @jax.jit
        def f(states, key):
            states, _, costs = sample_chain_fused(
                sampler, states, key, 1, x, y, batch_size=20,
                keep_every=scan_steps, block_chains=block_chains,
                state_dtype=state_dtype, collect_positions=False,
                multistep=True, pair_dots=paired, interpret=interpret)
            return states, costs

        t0 = time.perf_counter()
        out = f(states, jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        print("%s paired=%s compile+run %.1fs" % (
            name, paired, time.perf_counter() - t0), flush=True)
        assert np.isfinite(np.asarray(out[1])).all(), (name, paired)
        best = float("inf")
        for i in range(n_repeats):
            t0 = time.perf_counter()
            out = f(states, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(out[1])
            best = min(best, time.perf_counter() - t0)
        ms = best / scan_steps * 1e3
        print(json.dumps({
            "sampler": name,
            "pair_dots": paired,
            "ms_per_step": round(ms, 3),
            "steps_per_sec_per_chip": round(n_chains / ms * 1e3, 1),
        }), flush=True)


def main():
    base, positions, select_batch, (x, y) = build_workload(
        n_chains, network="dense", return_data=True)
    measure("SGHMC", base, jnp.bfloat16, positions, select_batch, x, y)
    measure("SGLD", SGLDSampler(
        base.cost_fn, stepsize_schedule=1e-5, burn_in_steps=3000,
        scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale), jnp.float32,
        positions, select_batch, x, y)
    measure("SGNHT", SGNHTSampler(
        base.cost_fn, stepsize_schedule=1e-3, scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale), jnp.bfloat16,
        positions, select_batch, x, y)
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

"""Round-3 on-chip measurements: burn-in kernel + fused SGLD/pSGLD.

Three tables on the flagship 8192-chain 3x50 BNN workload:

1. burn-in: pytree path vs the fused EMA burn-in lanes kernel
   (parallel/packed.burnin_chain_lanes) — the phase round 2 left
   un-kernelized.
2. fused SGLD whole-step kernel ms/step.
3. fused pSGLD whole-step kernel ms/step.

Run ON THE CHIP:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/burnin_fused_tpu.py
"""

import faulthandler
import json
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True, exit=False)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_workload  # noqa: E402
from pysgmcmc_tpu.parallel.packed import (  # noqa: E402
    burnin_chain_lanes,
    sample_chain_fused,
)
from pysgmcmc_tpu.samplers.base import sample_chain  # noqa: E402
from pysgmcmc_tpu.samplers.psgld import PSGLDSampler  # noqa: E402
from pysgmcmc_tpu.samplers.sgld import SGLDSampler  # noqa: E402

N = 8192
STEPS = 200


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    sampler, positions, select_batch, (x, y) = build_workload(
        N, network="dense", return_data=True)

    states0 = jax.jit(jax.vmap(sampler.init))(
        positions, jax.random.split(jax.random.PRNGKey(0), N))

    # --- 1. burn-in: pytree vs fused EMA kernel -------------------------
    @jax.jit
    def burn_pytree(states, key):
        def one(state, ck):
            state, _ = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS, collect_costs=False, phase="burn_in")
            return state
        return jax.vmap(one)(states, jax.random.split(key, N))

    @jax.jit
    def burn_lanes(states, key):
        return burnin_chain_lanes(
            sampler, states, key, STEPS, batch_fn=select_batch,
            compute_dtype=jnp.bfloat16, backend="pallas")

    _, t_pytree = timeit(burn_pytree, states0, jax.random.PRNGKey(1))
    out_lanes, t_lanes = timeit(burn_lanes, states0, jax.random.PRNGKey(1))
    minv = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out_lanes.stats.minv)])
    assert np.isfinite(minv).all() and (minv > 0).all()
    print(json.dumps({
        "phase": "burn-in",
        "pytree_ms_per_step": round(1000 * t_pytree / STEPS, 3),
        "lanes_kernel_ms_per_step": round(1000 * t_lanes / STEPS, 3),
    }), flush=True)

    # --- 2./3. fused SGLD / pSGLD whole-step kernels --------------------
    for name, smp, kw in (
        ("fused-sgld", SGLDSampler(
            sampler.cost_fn, stepsize_schedule=1e-4, burn_in_steps=3000,
            scale_grad=sampler.scale_grad,
            gaussian_prior_scale=sampler.gaussian_prior_scale), {}),
        ("fused-psgld", PSGLDSampler(
            sampler.cost_fn, stepsize_schedule=1e-5,
            scale_grad=sampler.scale_grad,
            gaussian_prior_scale=sampler.gaussian_prior_scale), {}),
    ):
        st = jax.jit(jax.vmap(smp.init))(
            positions, jax.random.split(jax.random.PRNGKey(2), N))
        if name == "fused-sgld":
            # adapt + freeze the mass matrix with the burn-in kernel
            st = jax.jit(lambda s, k: burnin_chain_lanes(
                smp, s, k, 3000, batch_fn=select_batch,
                compute_dtype=jnp.bfloat16, backend="pallas",
            ))(st, jax.random.PRNGKey(3))

        @jax.jit
        def run_fused(st, key, smp=smp):
            st, _, costs = sample_chain_fused(
                smp, st, key, 1, x, y, batch_size=20, keep_every=STEPS,
                block_chains=32,
                state_dtype=jnp.bfloat16, collect_positions=False)
            return st, costs

        (st, costs), t = timeit(run_fused, st, jax.random.PRNGKey(4))
        assert np.isfinite(np.asarray(costs)).all(), name
        print(json.dumps({
            "phase": name,
            "kernel_ms_per_step": round(1000 * t / STEPS, 3),
            "steps_per_sec_per_chip": round(N * STEPS / t, 1),
            "mean_final_cost": float(np.asarray(costs).mean()),
        }), flush=True)


if __name__ == "__main__":
    main()

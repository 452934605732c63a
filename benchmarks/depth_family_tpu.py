"""On-chip measurement: the parametric-depth fused multi-step kernels.

Round 4 lifted the fused family's fixed 3-hidden-layer topology to the
2-4 layer dense family (one ``(H, H)`` matrix slab per hidden layer
beyond the first; ``ops/fused_step.pack_fused`` / ``_fwd_bwd``).  This
measures SGHMC multi-step throughput at depths 2/3/4 (H=50, 8192 chains,
200 steps per launch) — depth 3 is the flagship and must reproduce
bench.py's number; depths 2/4 calibrate the cost of one hidden layer.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/depth_family_tpu.py
Smoke mode (CPU, tiny shapes): add --smoke.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_workload
from pysgmcmc_tpu.parallel.packed import sample_chain_fused
from pysgmcmc_tpu.samplers.base import sample_chain


def measure(depth, n_chains, scan_steps, interpret=False):
    sampler, positions, select_batch, (x, y) = build_workload(
        n_chains, network="dense", units=(50,) * depth, return_data=True)
    sampler.burn_in_steps = 100  # short: steady-state phase is what's timed

    @jax.jit
    def warm(positions, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            s = sampler.init(p, k1)
            s, _ = sample_chain(
                sampler, s, k2, 1, batch_fn=select_batch,
                keep_every=sampler.burn_in_steps + 10,
                collect_costs=False)
            return s
        return jax.vmap(one)(positions, jax.random.split(key, n_chains))

    states = warm(positions, jax.random.PRNGKey(0))

    @jax.jit
    def f(states, key):
        states, _, costs = sample_chain_fused(
            sampler, states, key, 1, x, y, batch_size=20,
            # depth 4's slab set OOMs the 100 MB scoped VMEM at block
            # 128 (113 MB measured); it runs at 64
            keep_every=scan_steps,
            block_chains=min(128 if depth <= 3 else 64, n_chains),
            state_dtype=jnp.bfloat16, collect_positions=False,
            multistep=True, interpret=interpret)
        return states, costs

    out = f(states, jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = f(states, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out[1])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out[1])).all(), depth
    ms = best / scan_steps * 1e3
    return {"depth": depth, "ms_per_step": round(ms, 4),
            "steps_per_sec_chip": round(n_chains / ms * 1e3)}


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
        n_chains, scan_steps = 4, 3
    else:
        n_chains, scan_steps = 8192, 200
    rows = [measure(d, n_chains, scan_steps, interpret=smoke)
            for d in (2, 3, 4)]
    for r in rows:
        print("depth %d  fused multi-step  %.3f ms/step (%.2fM steps/s)" % (
            r["depth"], r["ms_per_step"],
            r["steps_per_sec_chip"] / 1e6))
    if not smoke:
        from pysgmcmc_tpu.parallel.packed import resolve_noise_impl

        with open("benchmarks/results_depth_family.json", "w") as f:
            json.dump({
                "workload": "8192-chain dense BNN H=50, SGHMC multi-step "
                            "fused kernel, 200 steps/launch, v5e",
                "driver": "parallel.packed.sample_chain_fused"
                          "(multistep=True)",
                # measure-time default generator, freshness-pinned by
                # tests/test_benchmark_results.py
                "noise_impl": resolve_noise_impl("auto"),
                "rows": rows,
            }, f, indent=1)
        print("wrote benchmarks/results_depth_family.json")


if __name__ == "__main__":
    main()

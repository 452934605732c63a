"""On-chip A/B: multi-step flash-SGHMC, standard vs paired-dot variant.

The multi-step kernel is dot-instance-overhead bound (~83% of the
12.5 us block-step; docs/performance.md).  ``pair_dots=True`` packs
chain pairs into block-diagonal (Cp, 2s, 2s) W2/W3 state held in VMEM
for the whole k-step loop, halving the batched-dot instance count at
the cost of 2x padded FLOPs (nearly free on the MXU) and 2x W2/W3
elementwise/noise work.  This measures whether the trade wins on the
8192-chain flagship after a full burn-in.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python benchmarks/multistep_paired_tpu.py
"""

import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(600, repeat=True, exit=False)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_workload  # noqa: E402
from pysgmcmc_tpu.parallel.packed import sample_chain_fused  # noqa: E402
from pysgmcmc_tpu.samplers.base import sample_chain  # noqa: E402


def main():
    n_chains = 8192
    burn_in_steps = 3000
    scan_steps = 200
    repeats = 3
    block_chains = 32
    interpret = False

    # CPU smoke mode: tiny scale + interpret-mode kernels, so the whole
    # script (burn-in, both A/Bs, timing glue) is validated before any
    # chip time is spent on it.
    if os.environ.get("PYSGMCMC_BENCH_SMOKE"):
        n_chains, burn_in_steps, scan_steps, repeats = 4, 20, 2, 1
        block_chains, interpret = 4, True

    sampler, positions, select_batch, (x_data, y_data) = build_workload(
        n_chains, network="dense", return_data=True)

    @jax.jit
    def init_and_burn(positions, key):
        def one_chain(position, chain_key):
            k_init, k_burn = jax.random.split(chain_key)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_burn, 1, batch_fn=select_batch,
                keep_every=burn_in_steps, collect_costs=False,
                phase="burn_in",
            )
            return state
        return jax.vmap(one_chain)(
            positions, jax.random.split(key, n_chains))

    def make_scan(pair_dots):
        @jax.jit
        def scan(states, key):
            states, _, costs = sample_chain_fused(
                sampler, states, key, 1, x_data, y_data,
                batch_size=20, keep_every=scan_steps,
                block_chains=block_chains, state_dtype=jnp.bfloat16,
                collect_positions=False, multistep=True,
                pair_dots=pair_dots, interpret=interpret,
            )
            return states, costs
        return scan

    t0 = time.perf_counter()
    states = init_and_burn(positions, jax.random.PRNGKey(2))
    jax.block_until_ready(states)
    print("burn-in done in %.1fs" % (time.perf_counter() - t0), flush=True)

    # burn-in A/B: one 200-step adaptive launch, standard vs paired
    from pysgmcmc_tpu.parallel.packed import burnin_chain_fused

    fresh = jax.jit(jax.vmap(sampler.init))(
        positions, jax.random.split(jax.random.PRNGKey(9), n_chains))
    for name, pair_dots in (("burn-in multi-step", False),
                            ("burn-in multi-step paired", True)):
        bfn = jax.jit(lambda s, k, p=pair_dots: burnin_chain_fused(
            sampler, s, k, scan_steps, x_data, y_data,
            batch_size=20, block_chains=block_chains,
            state_dtype=jnp.bfloat16, pair_dots=p, interpret=interpret))
        st = bfn(fresh, jax.random.PRNGKey(10))
        jax.block_until_ready(st)
        elapsed = []
        for i in range(repeats):
            t0 = time.perf_counter()
            st = bfn(fresh, jax.random.PRNGKey(11 + i))
            jax.block_until_ready(st)
            elapsed.append(time.perf_counter() - t0)
        best = min(elapsed)
        print(json.dumps({
            "variant": name,
            "ms_per_step": round(1000.0 * best / scan_steps, 3),
            "steps_per_sec_per_chip": round(
                n_chains * scan_steps / best, 1),
        }), flush=True)

    for name, pair_dots in (("multi-step", False),
                            ("multi-step paired", True)):
        scan = make_scan(pair_dots)
        t0 = time.perf_counter()
        st, costs = scan(states, jax.random.PRNGKey(3))
        jax.block_until_ready(st)
        print("%s compile+run: %.1fs" % (name, time.perf_counter() - t0),
              flush=True)
        assert np.isfinite(np.asarray(costs)).all(), (name, "non-finite")

        elapsed = []
        for i in range(repeats):
            t0 = time.perf_counter()
            st, costs = scan(st, jax.random.PRNGKey(4 + i))
            jax.block_until_ready(st)
            elapsed.append(time.perf_counter() - t0)
        best = min(elapsed)
        steps_per_sec = n_chains * scan_steps / best
        print(json.dumps({
            "variant": name,
            "ms_per_step": round(1000.0 * best / scan_steps, 3),
            "steps_per_sec_per_chip": round(steps_per_sec, 1),
            "mean_final_cost": float(np.asarray(costs).mean()),
        }), flush=True)


if __name__ == "__main__":
    main()

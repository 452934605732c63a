"""block_chains A/B on the H=50 multi-step kernel (post-CLT operating point).

The post-CLT roofline (``results_wide_roofline.json``) puts the skeleton
floor at 0.40 ms/step of the 1.90 full — k-step loop + slab residency +
cost row, amortized over ``block_chains`` chains per grid instance.  The
shipped BLOCK=32 was tuned at the pre-CLT 3.19 ms operating point where
the floor share was half as large; re-sweep the knob where it matters
more.  Larger blocks amortize per-instance overhead over more chains but
raise VMEM pressure (all five state slabs stay resident for 200 steps);
smaller blocks pipeline more grid instances.

Run ON THE CHIP:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/block_ab_tpu.py
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

K = 200
N_CHAINS = 8192


def main():
    sampler, positions, select_batch, (x, y) = build_workload(
        N_CHAINS, network="dense", return_data=True)
    sampler.burn_in_steps = 100

    @jax.jit
    def warm(positions, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            st = sampler.init(p, k1)
            st, _ = sample_chain(
                sampler, st, k2, 1, batch_fn=select_batch,
                keep_every=sampler.burn_in_steps + 10,
                collect_costs=False)
            return st
        return jax.vmap(one)(positions, jax.random.split(key, N_CHAINS))

    states = warm(positions, jax.random.PRNGKey(0))
    jax.block_until_ready(states)

    rows = []
    for block in (8, 16, 32, 64, 128):
        @jax.jit
        def f(states, key, _b=block):
            st, _, costs = sample_chain_fused(
                sampler, states, key, 1, x, y, batch_size=20,
                keep_every=K, block_chains=_b,
                state_dtype=jnp.bfloat16,
                collect_positions=False, multistep=True)
            return st, costs

        try:
            out = f(states, jax.random.PRNGKey(1))
            jax.block_until_ready(out[1])
        except Exception as exc:  # VMEM OOM at large blocks is a finding
            rows.append({"block_chains": block,
                         "error": type(exc).__name__,
                         "detail": str(exc)[:200]})
            print("block %3d  FAILED: %s" % (block, str(exc)[:120]),
                  flush=True)
            continue
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = f(states, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(out[1])
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(np.asarray(out[1])).all()
        ms = best / K * 1e3
        rows.append({"block_chains": block, "ms_per_step": round(ms, 4),
                     "steps_per_sec_chip": int(N_CHAINS / ms * 1e3)})
        print("block %3d  %7.3f ms/step (%.2fM steps/s)"
              % (block, ms, N_CHAINS / ms / 1e3), flush=True)

    with open("benchmarks/results_block_ab.json", "w") as fh:
        json.dump({
            "workload": "8192-chain dense BNN H=50, SGHMC multi-step "
                        "fused kernel, 200 steps/launch, hadamard_clt",
            "driver": "parallel.packed.sample_chain_fused(multistep=True)",
            "rows": rows,
        }, fh, indent=1)
    print("wrote benchmarks/results_block_ab.json")


if __name__ == "__main__":
    main()

"""Where the wide-slot (H=100, S=128) multi-step milliseconds go.

The flagship (H=50, S=64) roofline (docs/performance.md "Where the 3.19
ms goes") attributed ~83% to MXU batched-dot instance overhead on dots
that use a FRACTION of the 128x128 systolic array.  At S=128 every
matrix dot spans the full array, so that accounting cannot transfer.

Methodology — the kernel measures itself, by ablation.  Isolated
component microbenchmarks through the tunneled backend proved
untrustworthy (three attempts: loop bodies get hoisted/elided and walls
below ~100 ms are launch noise — benchmarks/archive/wide_probe_debug.py
records the evidence, including a 536 MB-output "control" kernel
reporting a physically impossible 50 us).  Instead,
``ops/fused_step._ABLATE`` regenerates the REAL multi-step kernel with
one component neutralized:

- ``fwdbwd``: constant grads — removes all 6 MXU dots + tanh +
  likelihood + the window gather they consume
- ``window``: pinned window 0 — removes the per-step PRNG draw + masked
  gather of the minibatch
- ``noise``: constant etas — removes the whole injected-noise generator
  (uniform bits + Box-Muller transcendentals, or uniform bits + the
  MXU-CLT Hadamard dots under the shipped ``noise_impl='auto'`` →
  ``hadamard_clt`` default; the downstream sigma*eta arithmetic remains)
- ``rulemath``: plain SGD-style update — removes the EMA/mass-matrix/
  momentum chain (grads and etas stay live)

Each variant runs the FULL driver protocol (8192 chains, k=200 steps
per launch, identical to benchmarks/multistep_wide_tpu.py), whose
~1.5 s walls are far above tunnel noise; the component's marginal cost
is full minus ablated.  Marginals measured this way include overlap
effects (VPU/MXU co-issue), which is the honest accounting for a fused
kernel — the parts may legitimately sum to more or less than the whole.

Run ON THE CHIP:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/wide_roofline_tpu.py
Optional: pass --flagship to also decompose the H=50 kernel for
comparison against the round-3 instance-overhead accounting.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from pysgmcmc_tpu.ops import fused_step
from pysgmcmc_tpu.parallel.packed import sample_chain_fused
from pysgmcmc_tpu.samplers.base import sample_chain
from bench import build_workload

K = 200
N_CHAINS = 8192
BLOCK = 32

ABLATIONS = [
    ("full", None),
    ("no fwd/bwd (dots+tanh+loss+gather)", "fwdbwd"),
    ("pinned window (no PRNG/gather)", "window"),
    ("constant noise (no generator)", "noise"),
    ("plain-SGD update (no EMA/minv)", "rulemath"),
    # Composites: single ablations cannot separate "component is cheap"
    # from "component overlaps another unit's critical path" (MXU dots
    # can hide under VPU noise and vice versa).  Removing both at once
    # exposes the co-issue structure; the floor is the irreducible
    # skeleton (slab load/store + loop + cost row).
    ("no dots AND no noise generator", "fwdbwd+noise"),
    ("floor (skeleton only)", "fwdbwd+noise+rulemath"),
]


def measure(units, label):
    sampler, positions, select_batch, (x, y) = build_workload(
        N_CHAINS, network="dense", units=units, return_data=True)
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
    for name, ablate in ABLATIONS:
        fused_step._ABLATE = ablate
        # The public kernel drivers are @jax.jit-wrapped; the module
        # global is invisible to the jit cache key, so a variant would
        # silently reuse the previous variant's traced kernel without
        # this.  (Bitten once: the first committed run of this file
        # timed the SAME kernel five times — the liveness assert below
        # now makes that impossible.)
        jax.clear_caches()
        try:
            @jax.jit
            def f(states, key):
                st, _, costs = sample_chain_fused(
                    sampler, states, key, 1, x, y, batch_size=20,
                    keep_every=K, block_chains=BLOCK,
                    state_dtype=jnp.bfloat16,
                    collect_positions=False, multistep=True)
                return st, costs

            out = f(states, jax.random.PRNGKey(1))
            jax.block_until_ready(out[1])
            if ablate is None:
                full_costs = np.asarray(out[1])
            else:
                # liveness: the ablation must have changed the traced
                # program — identical costs would mean a cached/uncut
                # kernel and a meaningless marginal.
                assert not np.array_equal(np.asarray(out[1]), full_costs), (
                    "ablation %r produced bitwise-identical costs — "
                    "the knob did not take effect" % ablate)
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                out = f(states, jax.random.PRNGKey(2 + i))
                jax.block_until_ready(out[1])
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(np.asarray(out[1])).all() or ablate, name
        finally:
            fused_step._ABLATE = None
        ms = best / K * 1e3
        rows.append({"variant": name, "ablate": ablate,
                     "ms_per_step": round(ms, 4)})
        print("  %-38s %7.3f ms/step" % (name, ms), flush=True)

    full = rows[0]["ms_per_step"]
    print("%s: %.3f ms/step (%.2fM steps/s/chip)"
          % (label, full, N_CHAINS / full / 1e3))
    print("marginal costs (full - ablated):")
    acc = 0.0
    for r in rows[1:]:
        marg = full - r["ms_per_step"]
        r["marginal_ms"] = round(marg, 4)
        if "+" not in (r["ablate"] or ""):
            acc += marg  # composites would double-count the singles
        print("  %-38s %7.3f ms (%5.1f%%)"
              % (r["variant"], marg, 100.0 * marg / full))
    print("  %-38s %7.3f ms (%5.1f%%)"
          % ("residual (loop/store/cost-row/overlap)",
             full - acc, 100.0 * (full - acc) / full))
    return {"label": label, "units": list(units), "k_steps": K,
            "n_chains": N_CHAINS,
            "driver": "parallel.packed.sample_chain_fused(multistep=True)"
                      " with ops.fused_step._ABLATE variants",
            "rows": rows}


def main():
    results = [measure((100, 100, 100), "H=100 multi-step SGHMC")]
    if "--flagship" in sys.argv:
        results.append(measure((50, 50, 50), "H=50 multi-step SGHMC"))
    from pysgmcmc_tpu.parallel.packed import resolve_noise_impl

    with open("benchmarks/results_wide_roofline.json", "w") as handle:
        json.dump({"driver":
                   "parallel.packed.sample_chain_fused(multistep=True)"
                   " with ops.fused_step._ABLATE variants",
                   "noise_impl": resolve_noise_impl("auto"),
                   "results": results}, handle, indent=1)
    print("wrote benchmarks/results_wide_roofline.json")


if __name__ == "__main__":
    main()

"""Dump the optimized HLO + cost analysis of the flagship sampling step.

Answers, with compiler ground truth instead of tile-math speculation:
which tensors the while-body actually materializes, with which layouts,
and how many bytes XLA thinks one step moves.
"""

import re
import sys

import jax
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.samplers.base import sample_chain

N_CHAINS = 8192
STEPS = 200


def main():
    sampler, positions, select_batch = build_workload(N_CHAINS)

    @jax.jit
    def burn(positions, key):
        def one(position, ck):
            k_init, k_burn = jax.random.split(ck)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_burn, 1, batch_fn=select_batch,
                keep_every=2, collect_costs=False, phase="burn_in")
            return state
        return jax.vmap(one)(positions, jax.random.split(key, N_CHAINS))

    states = burn(positions, jax.random.PRNGKey(0))

    def sampling(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS, phase="sampling")
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, N_CHAINS))

    lowered = jax.jit(sampling).lower(states, jax.random.PRNGKey(1))
    compiled = lowered.compile()

    print("=== cost analysis ===")
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    for k in sorted(ca):
        v = ca[k]
        if isinstance(v, float) and v > 1e6:
            print("  %-28s %.3e" % (k, v))

    print("=== memory analysis ===")
    ma = compiled.memory_analysis()
    for attr in dir(ma):
        if not attr.startswith("_"):
            try:
                print("  %-32s %s" % (attr, getattr(ma, attr)))
            except Exception:
                pass

    text = compiled.as_text()
    with open("/tmp/flagship_sampling_hlo.txt", "w") as f:
        f.write(text)
    print("HLO written to /tmp/flagship_sampling_hlo.txt",
          len(text), "chars")

    # summarize the while-body fusions: shapes with layouts
    print("=== while-body tensors over 4 MiB ===")
    sizes = {}
    for m in re.finditer(
        r"(f32|bf16|u32|s32|pred)\[([\d,]*)\]\{([^}]*)\}", text
    ):
        dtype, dims, layout = m.groups()
        if not dims:
            continue
        shape = tuple(int(d) for d in dims.split(","))
        n = int(np.prod(shape))
        bytes_ = n * (2 if dtype == "bf16" else 4)
        key = (dtype, shape, layout)
        if bytes_ >= 4 * 1024 * 1024:
            sizes[key] = sizes.get(key, 0) + 1
    for (dtype, shape, layout), count in sorted(
        sizes.items(), key=lambda kv: -np.prod(kv[0][1])
    ):
        n = int(np.prod(shape))
        print("  %-6s %-22s layout={%s} x%d  (%.0f MB logical)" % (
            dtype, "x".join(map(str, shape)), layout, count, n * 4 / 1e6))


if __name__ == "__main__":
    main()

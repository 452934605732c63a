"""A/B sweep of the sampling-phase step: dtype x RNG impl x prior fold.

Uses the real library path (sample_chain phase='sampling' with the frozen
stats hoisted).  Times are ms/step over 8192 chains.
"""

import time

import jax
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.samplers.base import sample_chain

N_CHAINS = 8192
STEPS = 200


def measure(compute_dtype, key_impl, fold):
    import jax.numpy as jnp

    dt = {"bf16": jnp.bfloat16, "f32": None}[compute_dtype]
    sampler, positions, select_batch = build_workload(
        N_CHAINS, compute_dtype=dt, fold_weight_prior=fold)

    @jax.jit
    def burn(positions, key):
        def one(position, ck):
            k_init, k_burn = jax.random.split(ck)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_burn, 1, batch_fn=select_batch,
                keep_every=50, collect_costs=False, phase="burn_in")
            return state
        return jax.vmap(one)(positions, jax.random.split(key, N_CHAINS))

    @jax.jit
    def sampling(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS, phase="sampling")
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, N_CHAINS))

    key = jax.random.key(0, impl=key_impl)
    states = burn(positions, key)
    states, costs = sampling(states, jax.random.fold_in(key, 1))
    jax.block_until_ready(costs)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        states, costs = sampling(states, jax.random.fold_in(key, 2 + i))
        jax.block_until_ready(costs)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(costs)).all()
    return best / STEPS * 1e3


def main():
    combos = [
        ("bf16", "threefry2x32", False),  # round-1 configuration
        ("bf16", "rbg", False),
        ("f32", "threefry2x32", False),
        ("f32", "threefry2x32", True),
        ("f32", "rbg", True),
        ("f32", "rbg", False),
    ]
    for dt, impl, fold in combos:
        ms = measure(dt, impl, fold)
        print("%-5s %-13s fold=%-5s  %.3f ms/step  (%.2fM steps/s)" % (
            dt, impl, fold, ms, N_CHAINS / ms / 1e3))


if __name__ == "__main__":
    main()

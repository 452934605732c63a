"""A/B the packed flat sampling-phase path against the pytree path, on chip.

Workload: the bench.py north star (8192-chain 3x50 BNN, sinc, batch 20),
sampling phase after a short burn-in.  Times ms/step for:

- pytree (current bench path, bf16 matmul / f32 state, threefry noise)
- packed xla (flat state, one flat threefry draw, slim update in jnp)
- packed pallas (flat state, fused slim kernel, in-kernel RNG)
"""

import time

import jax
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.parallel.packed import sample_chain_packed
from pysgmcmc_tpu.samplers.base import sample_chain

N_CHAINS = 8192
STEPS = 200


def burn(sampler, positions, select_batch, key, steps=200):
    @jax.jit
    def go(positions, key):
        def one(position, ck):
            k_init, k_burn = jax.random.split(ck)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_burn, 1, batch_fn=select_batch,
                keep_every=steps, collect_costs=False, phase="burn_in")
            return state
        return jax.vmap(one)(positions, jax.random.split(key, N_CHAINS))
    return go(positions, key)


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3, out


def main():
    import os

    # the reference-shapes workload paths have all been measured (pytree
    # 5.52 ms; lanes 5.67/5.90; packed-flat 6.36/6.57) — re-run on demand
    run_ref = bool(
        os.environ.get("PYTREE") or os.environ.get("LANES_REF")
        or os.environ.get("PACKED_FLAT"))
    sampler, positions, select_batch = build_workload(N_CHAINS)
    states = (
        burn(sampler, positions, select_batch, jax.random.PRNGKey(0))
        if run_ref else None
    )

    @jax.jit
    def pytree_path(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS, phase="sampling")
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, N_CHAINS))

    def packed_path(backend):
        @jax.jit
        def go(states, key):
            states, _, costs = sample_chain_packed(
                sampler, states, key, 1, batch_fn=select_batch,
                keep_every=STEPS, backend=backend,
                collect_positions=False)
            return states, costs
        return go

    results = {}
    if os.environ.get("PYTREE"):
        ms, out = timeit(pytree_path, states, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out[1])).all()
        results["pytree (bench r2 path)"] = ms

    if os.environ.get("PACKED_FLAT"):  # measured r2: 6.36 / 6.57 ms (loses)
        for backend in ("xla", "pallas"):
            ms, out = timeit(
                packed_path(backend), states, jax.random.PRNGKey(2))
            assert np.isfinite(np.asarray(out[1])).all(), backend
            results["packed " + backend] = ms

    from pysgmcmc_tpu.parallel.packed import sample_chain_stacked

    def stacked_path(backend, bf16_params):
        @jax.jit
        def go(states, key):
            states, _, costs = sample_chain_stacked(
                sampler, states, key, 1, batch_fn=select_batch,
                keep_every=STEPS, backend=backend,
                bf16_params=bf16_params, collect_positions=False)
            return states, costs
        return go

    if os.environ.get("STACKED"):  # measured r2: 12.7 / 11.7 / 7.3 (loses:
        # pallas forces row-major relayouts of the chains-minor state)
        for backend, bf16 in (("pallas", False), ("pallas", True),
                              ("xla", True)):
            ms, out = timeit(
                stacked_path(backend, bf16), states, jax.random.PRNGKey(3))
            assert np.isfinite(np.asarray(out[1])).all(), (backend, bf16)
            results["stacked %s bf16=%s" % (backend, bf16)] = ms

    from pysgmcmc_tpu.parallel.packed import sample_chain_lanes

    def lanes_path(backend):
        @jax.jit
        def go(states, key):
            states, _, costs = sample_chain_lanes(
                sampler, states, key, 1, batch_fn=select_batch,
                keep_every=STEPS, backend=backend,
                collect_positions=False)
            return states, costs
        return go

    for backend in ("pallas", "xla"):
        if not os.environ.get("LANES_REF"):
            continue  # measured r2: pallas 5.67 / xla 5.90 ms
        ms, out = timeit(lanes_path(backend), states, jax.random.PRNGKey(4))
        assert np.isfinite(np.asarray(out[1])).all(), backend
        results["lanes " + backend] = ms

    # dense (lane-friendly) network shapes + bf16 momentum/mass state
    import jax.numpy as jnp

    sampler_d, positions_d, select_d = build_workload(
        N_CHAINS, network="dense")
    states_d = burn(sampler_d, positions_d, select_d, jax.random.PRNGKey(0))

    @jax.jit
    def lanes_dense(states, key):
        states, _, costs = sample_chain_lanes(
            sampler_d, states, key, 1, batch_fn=select_d,
            keep_every=STEPS, backend="pallas",
            state_dtype=jnp.bfloat16, collect_positions=False)
        return states, costs

    ms, out = timeit(lanes_dense, states_d, jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(out[1])).all()
    results["lanes pallas dense+bf16st"] = ms

    # flash-SGHMC: whole step (fwd+bwd+update) in ONE kernel
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused

    rng = np.random.RandomState(0)  # bench.build_workload's dataset
    x_data = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    y_data = np.asarray(sinc(x_data), np.float32)

    for bc in (64, 128, 256):
        @jax.jit
        def fused(states, key, bc=bc):
            states, _, costs = sample_chain_fused(
                sampler_d, states, key, 1, x_data, y_data,
                batch_size=20, keep_every=STEPS, block_chains=bc,
                state_dtype=jnp.bfloat16, collect_positions=False)
            return states, costs

        ms, out = timeit(fused, states_d, jax.random.PRNGKey(6))
        assert np.isfinite(np.asarray(out[1])).all(), bc
        results["flash-SGHMC fused C=%d" % bc] = ms

    for k, v in results.items():
        print("%-24s %.3f ms/step  (%.2fM steps/s)" % (
            k, v, N_CHAINS / v / 1e3))


if __name__ == "__main__":
    main()

"""Decompose the flagship sampling-phase step on the TPU chip.

Times, in isolation: the vmapped gradient, the noise draw, the slim SGHMC
update, the full sampling-phase step (stats in carry), and a variant where
the frozen minv is a closure constant instead of scan carry.  Guides the
kernel work; results recorded in docs/performance.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.utils.pytree import normal_like_tree

N_CHAINS = 8192
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
    return best / STEPS * 1e3  # ms per step


def main():
    sampler, positions, select_batch = build_workload(N_CHAINS)
    key = jax.random.PRNGKey(0)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(key, N_CHAINS)
    )

    cost_grad = jax.vmap(
        lambda pos, batch: jax.value_and_grad(sampler.cost_fn)(pos, batch)
    )

    @jax.jit
    def grad_only(positions, key):
        def body(carry, _):
            pos, key = carry
            key, kb = jax.random.split(key)
            batch = jax.vmap(select_batch)(jax.random.split(kb, N_CHAINS))
            cost, grads = cost_grad(pos, batch)
            # feed the gradient back in so the scan can't be elided
            pos = jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, pos, grads)
            return (pos, key), cost[0]
        (_, _), costs = jax.lax.scan(
            body, (positions, key), None, length=STEPS)
        return costs

    @jax.jit
    def noise_only(positions, key):
        def body(carry, _):
            pos, key = carry
            key, kn = jax.random.split(key)
            keys = jax.random.split(kn, N_CHAINS)
            eta = jax.vmap(normal_like_tree)(keys, pos)
            pos = jax.tree_util.tree_map(lambda p, e: p + 1e-9 * e, pos, eta)
            return (pos, key), ()
        (pos, _), _ = jax.lax.scan(body, (positions, key), None, length=STEPS)
        return pos

    @jax.jit
    def update_only(states, key):
        """Slim update math on fixed grads (no gradient computation)."""
        mdecay, eps = 0.05, 0.01
        minv = states.stats.minv
        grads = jax.tree_util.tree_map(jnp.ones_like, states.position)

        def body(carry, _):
            (theta, v), key = carry
            key, kn = jax.random.split(key)
            keys = jax.random.split(kn, N_CHAINS)
            eta = jax.vmap(normal_like_tree)(keys, theta)
            def leaf(v, g, mi, e):
                sigma = jnp.sqrt(jnp.maximum(
                    2.0 * eps**2 * mdecay * mi - eps**4, 1e-16))
                return v - eps**2 * mi * g - mdecay * v + sigma * e
            v = jax.tree_util.tree_map(leaf, v, grads, minv, eta)
            theta = jax.tree_util.tree_map(lambda t, vv: t + vv, theta, v)
            return ((theta, v), key), ()
        (carry, _), _ = jax.lax.scan(
            body, ((states.position, states.momentum), key), None,
            length=STEPS)
        return carry

    @jax.jit
    def full_sampling(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS, phase="sampling")
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, N_CHAINS))

    @jax.jit
    def full_dynamic(states, key):
        def one(state, ck):
            state, _, costs = sample_chain(
                sampler, state, ck, 1, batch_fn=select_batch,
                keep_every=STEPS)
            return state, costs
        return jax.vmap(one)(states, jax.random.split(key, N_CHAINS))

    @jax.jit
    def sampling_closure_minv(states, key):
        """Sampling-phase scan with minv closed over (NOT in the carry)."""
        mdecay, eps = 0.05, 0.01
        eps_s = eps / jnp.sqrt(jnp.asarray(sampler.scale_grad, jnp.float32))
        minv = states.stats.minv

        def body(carry, _):
            (theta, v), key = carry
            key, ks, kb = jax.random.split(key, 3)
            batch = jax.vmap(select_batch)(jax.random.split(kb, N_CHAINS))
            cost, grads = cost_grad(theta, batch)
            keys = jax.random.split(ks, N_CHAINS)
            eta = jax.vmap(normal_like_tree)(keys, theta)
            def leaf(v, g, mi, e):
                sigma = jnp.sqrt(jnp.maximum(
                    2.0 * eps_s**2 * mdecay * mi - eps_s**4, 1e-16))
                return v - eps**2 * mi * g - mdecay * v + sigma * e
            v = jax.tree_util.tree_map(leaf, v, grads, minv, eta)
            theta = jax.tree_util.tree_map(lambda t, vv: t + vv, theta, v)
            return ((theta, v), key), cost[0]
        (carry, _), costs = jax.lax.scan(
            body, ((states.position, states.momentum), key), None,
            length=STEPS)
        return carry, costs

    results = {}
    results["grad_only"] = timeit(grad_only, positions, jax.random.PRNGKey(1))
    results["noise_only"] = timeit(noise_only, positions, jax.random.PRNGKey(2))
    results["update_only(incl noise)"] = timeit(
        update_only, states, jax.random.PRNGKey(3))
    results["full_sampling(phase-split)"] = timeit(
        full_sampling, states, jax.random.PRNGKey(4))
    results["full_dynamic"] = timeit(full_dynamic, states, jax.random.PRNGKey(5))
    results["sampling_closure_minv"] = timeit(
        sampling_closure_minv, states, jax.random.PRNGKey(6))

    for k, v in results.items():
        print("%-32s %.3f ms/step  (%.0f chain-steps/s)" % (
            k, v, N_CHAINS / v * 1e3))


if __name__ == "__main__":
    main()

"""Elimination probes for the flagship step: gradient fat and RNG cost.

Each probe scans 200 steps over 8192 chains; times are ms/step.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
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
    return best / STEPS * 1e3


def grad_scan(cost_fn, select_batch, positions, key, per_chain_batch=True):
    cost_grad = jax.vmap(
        lambda pos, batch: jax.value_and_grad(cost_fn)(pos, batch)
    )

    @jax.jit
    def run(positions, key):
        def body(carry, _):
            pos, key = carry
            key, kb = jax.random.split(key)
            if per_chain_batch:
                batch = jax.vmap(select_batch)(
                    jax.random.split(kb, N_CHAINS))
            else:
                single = select_batch(kb)
                batch = jax.tree_util.tree_map(
                    lambda leaf: jnp.broadcast_to(
                        leaf[None], (N_CHAINS,) + leaf.shape), single)
            cost, grads = cost_grad(pos, batch)
            pos = jax.tree_util.tree_map(
                lambda p, g: p - 1e-9 * g, pos, grads)
            return (pos, key), cost[0]
        (_, _), costs = jax.lax.scan(body, (positions, key), None,
                                     length=STEPS)
        return costs
    return run


def noise_scan(positions, impl):
    @jax.jit
    def run(positions, key):
        def body(carry, _):
            pos, key = carry
            key, kn = jax.random.split(key)
            keys = jax.random.split(kn, N_CHAINS)
            eta = jax.vmap(normal_like_tree)(keys, pos)
            pos = jax.tree_util.tree_map(lambda p, e: p + 1e-9 * e, pos, eta)
            return (pos, key), ()
        (pos, _), _ = jax.lax.scan(body, (positions, key), None, length=STEPS)
        return pos

    key = jax.random.key(0, impl=impl)
    return run, key


def main():
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc
    from pysgmcmc_tpu.models.architectures import default_network
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        log_variance_prior_log_like, weight_prior_log_like)

    sampler, positions, select_batch = build_workload(N_CHAINS)
    results = {}

    # baseline gradient scan (per-chain one-hot batches, bf16, priors)
    results["grad base"] = timeit(
        grad_scan(sampler.cost_fn, select_batch, positions,
                  jax.random.PRNGKey(0)),
        positions, jax.random.PRNGKey(0))

    # shared batch across chains
    results["grad shared-batch"] = timeit(
        grad_scan(sampler.cost_fn, select_batch, positions,
                  jax.random.PRNGKey(0), per_chain_batch=False),
        positions, jax.random.PRNGKey(0))

    # rebuild cost variants
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0.0, 1.0, (100, 1)), jnp.float32)
    y = jnp.asarray(np.asarray(sinc(np.asarray(x))), jnp.float32)
    init_fn, apply_fn = default_network(1)

    def cost_no_priors(params, batch):
        xb, yb = batch
        params_c = jax.tree_util.tree_map(
            lambda l: l.astype(jnp.bfloat16), params)
        out = apply_fn(params_c, xb.astype(jnp.bfloat16)).astype(jnp.float32)
        f_mean, f_log_var = out[:, 0:1], out[:, 1:2]
        mse = jnp.square(yb - f_mean)
        ll = jnp.sum(jnp.sum(
            -mse * 0.5 / (jnp.exp(f_log_var) + 1e-16) - 0.5 * f_log_var,
            axis=1)) / 20.0
        return -ll

    results["grad no-priors"] = timeit(
        grad_scan(cost_no_priors, select_batch, positions,
                  jax.random.PRNGKey(0)),
        positions, jax.random.PRNGKey(0))

    def cost_f32(params, batch):
        xb, yb = batch
        out = apply_fn(params, xb)
        f_mean, f_log_var = out[:, 0:1], out[:, 1:2]
        mse = jnp.square(yb - f_mean)
        ll = jnp.sum(jnp.sum(
            -mse * 0.5 / (jnp.exp(f_log_var) + 1e-16) - 0.5 * f_log_var,
            axis=1)) / 20.0
        ll += log_variance_prior_log_like(f_log_var) / 100.0
        ll += weight_prior_log_like(params) / 100.0
        return -ll

    results["grad f32"] = timeit(
        grad_scan(cost_f32, select_batch, positions, jax.random.PRNGKey(0)),
        positions, jax.random.PRNGKey(0))

    # forward-only (no autodiff): lower bound of the cost evaluation
    fwd = jax.vmap(sampler.cost_fn)

    @jax.jit
    def fwd_only(positions, key):
        def body(carry, _):
            pos, key = carry
            key, kb = jax.random.split(key)
            batch = jax.vmap(select_batch)(jax.random.split(kb, N_CHAINS))
            cost = fwd(pos, batch)
            return (pos, key), cost[0]
        (_, _), costs = jax.lax.scan(body, (positions, key), None,
                                     length=STEPS)
        return costs
    results["forward only"] = timeit(fwd_only, positions,
                                     jax.random.PRNGKey(0))

    # RNG implementations
    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        try:
            run, key = noise_scan(positions, impl)
            results["noise %s" % impl] = timeit(run, positions, key)
        except Exception as e:  # pragma: no cover
            results["noise %s" % impl] = float("nan")
            print("impl", impl, "failed:", e)

    for k, v in results.items():
        print("%-24s %.3f ms/step" % (k, v))


if __name__ == "__main__":
    main()

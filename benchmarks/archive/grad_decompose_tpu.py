"""Decompose the flagship gradient pass on the chip.

grad_only measured 4.14 ms/step (step_decompose_tpu.py) against a 1.53 ms
intrinsic matmul cost — this isolates where the other ~2.6 ms goes:
the f32->bf16 parameter cast, the likelihood arithmetic, the minibatch
selection, the per-step key splitting, or the scan-carried position update.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.utils.pytree import tree_cast

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


def main():
    sampler, positions, select_batch = build_workload(N_CHAINS)
    cost_fn = sampler.cost_fn
    key = jax.random.PRNGKey(0)

    fixed_batch = jax.vmap(select_batch)(jax.random.split(key, N_CHAINS))
    positions_bf16 = tree_cast(positions, jnp.bfloat16)

    def scan_over(body, init):
        @jax.jit
        def run(carry):
            carry, _ = jax.lax.scan(body, carry, None, length=STEPS)
            return carry
        return run, init

    # 1. fixed batch, bf16 params already: pure fwd+bwd+likelihood
    def body_bf16(carry, _):
        pos = carry
        cost, grads = jax.vmap(jax.value_and_grad(cost_fn))(pos, fixed_batch)
        pos = jax.tree_util.tree_map(
            lambda p, g: p - jnp.bfloat16(1e-9) * g, pos, grads)
        return pos, ()

    # 2. fixed batch, f32 params (in-graph cast, the real path)
    def body_f32(carry, _):
        pos = carry
        cost, grads = jax.vmap(jax.value_and_grad(cost_fn))(pos, fixed_batch)
        pos = jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, pos, grads)
        return pos, ()

    # 3. + per-step batch selection and key splitting
    def body_select(carry, _):
        pos, k = carry
        k, kb = jax.random.split(k)
        batch = jax.vmap(select_batch)(jax.random.split(kb, N_CHAINS))
        cost, grads = jax.vmap(jax.value_and_grad(cost_fn))(pos, batch)
        pos = jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, pos, grads)
        return (pos, k), ()

    # 4. selection alone (feed the batch into a trivial reduction)
    def body_select_only(carry, _):
        acc, k = carry
        k, kb = jax.random.split(k)
        batch = jax.vmap(select_batch)(jax.random.split(kb, N_CHAINS))
        acc = acc + jnp.sum(batch[0][:, 0, 0]) * 1e-9
        return (acc, k), ()

    # 5. key splitting alone
    def body_keys_only(carry, _):
        acc, k = carry
        k, kb = jax.random.split(k)
        keys = jax.random.split(kb, N_CHAINS)
        acc = acc + jnp.float32(jax.random.key_data(keys)[0, 0]) * 1e-18
        return (acc, k), ()

    cases = [
        ("grad bf16-params fixed-batch", body_bf16, positions_bf16),
        ("grad f32-params fixed-batch", body_f32, positions),
        ("grad f32 + select + keys", body_select, (positions, key)),
        ("select + keys only", body_select_only, (jnp.float32(0), key)),
        ("key split only", body_keys_only, (jnp.float32(0), key)),
    ]
    for name, body, init in cases:
        run, init = scan_over(body, init)
        ms = timeit(run, init)
        print("%-32s %.3f ms/step" % (name, ms))


if __name__ == "__main__":
    main()

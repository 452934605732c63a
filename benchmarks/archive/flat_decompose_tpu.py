"""Decompose the packed-flat sampling step (packed_ab measured 6.36 ms).

Isolates: unpack (flat f32 -> bf16 pytree), pack (bf16 grads -> flat),
the flat slim update (pallas in-kernel RNG vs xla + threefry), and the
flat threefry draw, each inside a scan on the chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from pysgmcmc_tpu.ops.slim_update import slim_sghmc_update
from pysgmcmc_tpu.parallel.packed import (
    make_pack_spec,
    pack_mask,
    pack_tree,
    unpack_tree,
)

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
    sampler, positions, _ = build_workload(N_CHAINS)
    template = jax.tree_util.tree_map(lambda l: l[0], positions)
    spec = make_pack_spec(template)
    mask = pack_mask(spec)
    theta = pack_tree(spec, positions)
    v = jnp.zeros_like(theta)
    minv = jnp.ones_like(theta)
    grad_flat = 0.01 * jnp.ones_like(theta)
    grads_bf16 = jax.tree_util.tree_map(
        lambda l: l.astype(jnp.bfloat16), positions)

    @jax.jit
    def unpack_only(theta):
        def body(carry, _):
            th = carry
            tree = unpack_tree(spec, th, jnp.bfloat16)
            # consume every leaf so nothing is elided; tiny feedback
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in
                    jax.tree_util.tree_leaves(tree))
            th = th + s * 1e-20
            return th, ()
        th, _ = jax.lax.scan(body, theta, None, length=STEPS)
        return th

    @jax.jit
    def pack_only(theta):
        def body(carry, _):
            th = carry
            flat = pack_tree(
                spec, grads_bf16, dtype=jnp.bfloat16)
            th = th + flat.astype(jnp.float32) * 1e-20
            return th, ()
        th, _ = jax.lax.scan(body, theta, None, length=STEPS)
        return th

    @jax.jit
    def update_pallas(theta, v):
        def body(carry, t):
            th, vv = carry
            th, vv = slim_sghmc_update(
                th, vv, grad_flat.astype(jnp.bfloat16), minv, mask,
                jnp.float32(0.01), t,
                mdecay=0.05, scale_grad=100.0, prior_scale=1e-6)
            return (th, vv), ()
        carry, _ = jax.lax.scan(
            body, (theta, v), jnp.arange(STEPS, dtype=jnp.int32))
        return carry

    @jax.jit
    def update_xla(theta, v, key):
        def body(carry, _):
            th, vv, k = carry
            k, kn = jax.random.split(k)
            eta = jax.random.normal(kn, th.shape, jnp.float32)
            g = grad_flat + 1e-6 * th
            sigma = jnp.sqrt(jnp.maximum(
                2.0 * (0.001)**2 * 0.05 * minv - (0.001)**4, 1e-16))
            vv = (vv - 0.01**2 * minv * g - 0.05 * vv + sigma * eta) * mask
            th = th + vv
            return (th, vv, k), ()
        carry, _ = jax.lax.scan(body, (theta, v, key), None, length=STEPS)
        return carry

    @jax.jit
    def noise_flat_only(theta, key):
        def body(carry, _):
            th, k = carry
            k, kn = jax.random.split(k)
            eta = jax.random.normal(kn, th.shape, jnp.float32)
            th = th + eta * 1e-20
            return (th, k), ()
        carry, _ = jax.lax.scan(body, (theta, key), None, length=STEPS)
        return carry

    print("%-28s %.3f ms/step" % (
        "unpack flat->bf16 tree", timeit(unpack_only, theta)))
    print("%-28s %.3f ms/step" % (
        "pack bf16 tree->flat", timeit(pack_only, theta)))
    print("%-28s %.3f ms/step" % (
        "flat update pallas (rng)", timeit(update_pallas, theta, v)))
    print("%-28s %.3f ms/step" % (
        "flat update xla+threefry", timeit(
            update_xla, theta, v, jax.random.PRNGKey(0))))
    print("%-28s %.3f ms/step" % (
        "flat threefry noise only", timeit(
            noise_flat_only, theta, jax.random.PRNGKey(1))))


if __name__ == "__main__":
    main()

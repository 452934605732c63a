"""Probe the flash-SGHMC megakernel's core pattern on the chip.

The planned full-step kernel stores per-chain (50,50) weight matrices
side by side on the lane axis ((50, 50*N) interleaved layout) and loops
per-chain dots over dynamic lane slices.  Everything hinges on that loop
issuing MXU dots near XLA's batched-matmul floor (~255us for 8192
(20,50)@(50,50) dots).  This probe measures exactly that pass, plus the
vectorized lane-expand used by the input layer/head.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192
H = 50
B = 20
STEPS = 100


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


def make_loop_dot(block_chains):
    W = H * block_chains

    def kernel(a_ref, w_ref, z_ref):
        def body(c, _):
            a = a_ref[:, pl.ds(c * H, H)]
            w = w_ref[:, pl.ds(c * H, H)]
            z_ref[:, pl.ds(c * H, H)] = jnp.dot(
                a, w, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            return 0
        jax.lax.fori_loop(0, block_chains, body, 0)

    @jax.jit
    def run(a, w):
        def step(carry, _):
            a = carry
            z = pl.pallas_call(
                kernel,
                grid=(N // block_chains,),
                in_specs=[
                    pl.BlockSpec((B, W), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((H, W), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, W), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H * N), jnp.bfloat16),
            )(a, w)
            return z * jnp.bfloat16(1.0), ()
        a, _ = jax.lax.scan(step, a, None, length=STEPS)
        return a
    return run


@jax.jit
def xla_batched(a, w):
    def step(carry, _):
        a = carry
        z = jnp.einsum(
            "nbh,nho->nbo", a, w,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return z, ()
    a, _ = jax.lax.scan(step, a, None, length=STEPS)
    return a


def make_expand(block_chains):
    """Lane-expand (B, C) -> (B, H*C): x[b, c] broadcast over 50 lanes."""
    W = H * block_chains

    def kernel(x_ref, out_ref):
        x = x_ref[:]                                    # (B, C)
        expanded = jnp.repeat(x, H, axis=1)             # (B, H*C)
        out_ref[:] = expanded

    @jax.jit
    def run(x):
        def step(carry, _):
            x = carry
            out = pl.pallas_call(
                kernel,
                grid=(N // block_chains,),
                in_specs=[pl.BlockSpec(
                    (B, block_chains), lambda i: (0, i),
                    memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, W), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H * N), jnp.float32),
            )(x)
            return x + out[:, ::H] * 1e-9, ()
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x
    return run


def main():
    rng = np.random.RandomState(0)
    a_i = jnp.asarray(
        rng.standard_normal((B, H * N)) * 0.1, jnp.bfloat16)
    w_i = jnp.asarray(
        rng.standard_normal((H, H * N)) * 0.1, jnp.bfloat16)
    a_b = jnp.asarray(
        rng.standard_normal((N, B, H)) * 0.1, jnp.bfloat16)
    w_b = jnp.asarray(
        rng.standard_normal((N, H, H)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)

    print("%-34s %.3f ms/pass" % (
        "xla batched matmul (reference)", timeit(xla_batched, a_b, w_b)))
    # block lane width (H * C) must be a multiple of 128 -> C in {64, 128}
    for bc in (64, 128):
        print("%-34s %.3f ms/pass" % (
            "loop-dot kernel C=%d" % bc,
            timeit(make_loop_dot(bc), a_i, w_i)))
    print("%-34s %.3f ms/pass" % (
        "lane-expand kernel C=64", timeit(make_expand(64), x)))


if __name__ == "__main__":
    main()

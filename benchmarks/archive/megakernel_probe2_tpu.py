"""Probe v2: sublane-slot per-chain dots (the v1 lane-slot layout is
rejected by Mosaic: dynamic lane slices must be 128-aligned; sublane
slices need only 8-alignment).

Layout: per-chain (64, 64) weight slots stacked on sublanes
((64*N, 64) arrays); transposed activations (64, 24) per chain.  Measures
the per-chain fori_loop of dot_general contractions that the flash-SGHMC
megakernel is built from, at block sizes C=64/128.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192
S = 64     # per-chain slot (rows and lanes)
B = 24     # padded batch
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


def make_loop(block_chains, dots_per_chain):
    rows = S * block_chains

    def kernel(w_ref, a_ref, out_ref):
        def body(c, _):
            w_c = w_ref[pl.ds(c * S, S), :].astype(jnp.bfloat16)
            a_c = a_ref[pl.ds(c * B, B), :].astype(jnp.bfloat16)
            # z^T = W^T a^T : contract over sublanes of both
            z = jax.lax.dot_general(
                w_c, a_c, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (S, B)
            for _ in range(dots_per_chain - 1):
                z = jax.lax.dot_general(
                    w_c, z.astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # MXU-transpose (S,B)->(B,S) via identity contraction
            out_ref[pl.ds(c * B, B), :] = jax.lax.dot_general(
                z.astype(jnp.bfloat16), jnp.eye(S, dtype=jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (B, S)
            return 0
        jax.lax.fori_loop(0, block_chains, body, 0)

    @jax.jit
    def run(w, a):
        def step(carry, _):
            a = carry
            out = pl.pallas_call(
                kernel,
                grid=(N // block_chains,),
                in_specs=[
                    pl.BlockSpec((rows, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((B * block_chains, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B * block_chains, S),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B * N, S), jnp.float32),
            )(w, a)
            return out * 0.999, ()
        a, _ = jax.lax.scan(step, a, None, length=STEPS)
        return a
    return run


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.standard_normal((S * N, S)) * 0.1, jnp.float32)
    a = jnp.asarray(rng.standard_normal((B * N, S)) * 0.1, jnp.float32)

    for bc in (64, 128):
        for dots in (1, 3):
            try:
                ms = timeit(make_loop(bc, dots), w, a)
                print("%-38s %.3f ms/pass (%.0f ns/dot)" % (
                    "sublane loop C=%d dots=%d" % (bc, dots), ms,
                    ms * 1e6 / (N * (dots + 1))))
            except Exception as e:
                print("C=%d dots=%d FAILED: %s" % (bc, dots, str(e)[:300]))


if __name__ == "__main__":
    main()

"""Probe v4: batched dot_general inside a Pallas kernel.

If Mosaic lowers a batch-dimension dot_general at XLA's batched-matmul
rate (~31 ns/dot) instead of the 155 ns/dot of an explicit per-chain
fori_loop, the flash-SGHMC megakernel is viable.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192
S = 64
B = 24
STEPS = 100
C = 128


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.standard_normal((N, S, S)) * 0.1, jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((N, B, S)) * 0.1, jnp.bfloat16)

    def kernel(w_ref, a_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            a_ref[:], w_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def call(w, a):
        return pl.pallas_call(
            kernel,
            grid=(N // C,),
            in_specs=[
                pl.BlockSpec((C, S, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, B, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, B, S), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, B, S), jnp.bfloat16),
        )(w, a)

    out = jax.jit(call)(w, a)
    out.block_until_ready()
    ref = np.einsum(
        "nbs,nst->nbt",
        np.asarray(a[:4], np.float32), np.asarray(w[:4], np.float32))
    err = np.abs(ref - np.asarray(out[:4], np.float32)).max()
    print("max err (4 chains): %.5f" % err)

    @jax.jit
    def timed(a):
        def step(carry, _):
            a = carry
            return call(w, a), ()
        a, _ = jax.lax.scan(step, a, None, length=STEPS)
        return a

    r = timed(a)
    r.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = timed(a)
        r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print("checksum %.4f" % float(jnp.sum(r.astype(jnp.float32))))
    print("batched in-kernel dot: %.3f ms/pass (%.1f ns/dot)" % (
        best / STEPS * 1e3, best / STEPS / N * 1e9))


if __name__ == "__main__":
    main()

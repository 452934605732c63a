"""Probe v3: validate + time the sublane-slot per-chain dot loop.

v2 reported ~0 ms/pass, which smells like elision or a silent no-op;
this one checks numerics against numpy for one call, prints a checksum
from the timed scan, and times again.
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
C = 64


def make_call():
    rows = S * C

    def kernel(w_ref, a_ref, out_ref):
        def body(c, _):
            w_c = w_ref[pl.ds(c * S, S), :].astype(jnp.bfloat16)
            a_c = a_ref[pl.ds(c * B, B), :].astype(jnp.bfloat16)
            # out_c (B, S) = a_c (B,S) @ w_c (S,S): contract a dim1 x w dim0
            z = jax.lax.dot_general(
                a_c, w_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[pl.ds(c * B, B), :] = z
            return 0
        jax.lax.fori_loop(0, C, body, 0)

    def call(w, a):
        return pl.pallas_call(
            kernel,
            grid=(N // C,),
            in_specs=[
                pl.BlockSpec((rows, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B * C, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B * C, S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * N, S), jnp.float32),
        )(w, a)
    return call


def main():
    rng = np.random.RandomState(0)
    w_np = rng.standard_normal((S * N, S)).astype(np.float32) * 0.1
    a_np = rng.standard_normal((B * N, S)).astype(np.float32) * 0.1
    w = jnp.asarray(w_np)
    a = jnp.asarray(a_np)

    call = make_call()
    out = jax.jit(call)(w, a)
    out.block_until_ready()

    # numpy reference for chains 0 and 777
    for c in (0, 777):
        ref = a_np[c * B:(c + 1) * B].astype(jnp.bfloat16).astype(
            np.float32) @ w_np[c * S:(c + 1) * S].astype(
            jnp.bfloat16).astype(np.float32)
        got = np.asarray(out[c * B:(c + 1) * B])
        err = np.abs(ref - got).max()
        print("chain %d max err %.5f" % (c, err))

    @jax.jit
    def timed(a):
        def step(carry, _):
            a = carry
            out = call(w, a)
            return out * jnp.float32(0.99), ()
        a, _ = jax.lax.scan(step, a, None, length=STEPS)
        return a

    out2 = timed(a)
    out2.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = timed(a)
        r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print("checksum %.6f" % float(jnp.sum(r).block_until_ready()))
    print("loop-dot: %.3f ms/pass (%.1f ns/dot)" % (
        best / STEPS * 1e3, best / STEPS / N * 1e9))


if __name__ == "__main__":
    main()

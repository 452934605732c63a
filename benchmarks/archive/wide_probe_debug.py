"""Debug the wide-roofline component probes: raw walls, K scaling.

The first wide_roofline_tpu.py run printed ~0 for every component probe
— consistent with the fori_loop body being hoisted (loop-invariant) or
the work being elided.  This prints raw walls for K=1 vs K=200 with a
loop-carried formulation to pin down what actually executes.

Run ON THE CHIP:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/archive/wide_probe_debug.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, S = 32, 24, 128
N_BLOCKS = 256


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def dot_probe(k_reps, carried):
    def kernel(a_ref, w_ref, o_ref):
        if carried:
            def step(t, act):
                z = jax.lax.dot_general(
                    act, w_ref[:], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return z.astype(jnp.bfloat16)
            o_ref[:] = jax.lax.fori_loop(
                0, k_reps, step, a_ref[:])
        else:
            def step(t, c):
                o_ref[:] = jax.lax.dot_general(
                    a_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return c
            jax.lax.fori_loop(0, k_reps, step, 0)

    return pl.pallas_call(
        kernel,
        grid=(N_BLOCKS,),
        in_specs=[
            pl.BlockSpec((C, B, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, S, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, B, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS * C, B, S), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    rng = np.random.RandomState(0)
    act = jnp.asarray(
        rng.standard_normal((N_BLOCKS * C, B, S)), jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((N_BLOCKS * C, S, S)), jnp.bfloat16)

    for carried in (False, True):
        for k in (1, 200):
            f = jax.jit(lambda a, ww, _c=carried, _k=k:
                        dot_probe(_k, _c)(a, ww))
            wall, out = timed(f, act, w)
            print("carried=%s K=%3d: wall=%8.3f ms  -> %7.2f ns/instance"
                  % (carried, k, wall * 1e3,
                     wall / (N_BLOCKS * k * C) * 1e9))
            assert np.isfinite(
                np.asarray(out[:4], jnp.float32)).all()


if __name__ == "__main__":
    main()

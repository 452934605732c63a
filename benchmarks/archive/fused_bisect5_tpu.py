"""Bisect round 5: pin the dz3-case failure + probe backward patterns.

Hypothesis so far: (C,1,S)-style broadcasts applied to batched-dot
OUTPUTS crash Mosaic ("limits 3 vs 1"); the same broadcasts on ref-loads
and dots on broadcast-chains are fine.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, S = 64, 24, 64
N = 128


def run_case(name, kernel, operands, out_shapes, scratch=()):
    try:
        got = pl.pallas_call(
            kernel,
            grid=(N // C,),
            in_specs=[
                pl.BlockSpec(
                    (C,) + op.shape[1:],
                    (lambda nd: lambda i: (i,) + (0,) * nd)(op.ndim - 1),
                    memory_space=pltpu.VMEM)
                for op in operands
            ],
            out_specs=tuple(
                pl.BlockSpec(
                    (C,) + os[1:],
                    (lambda nd: lambda i: (i,) + (0,) * nd)(len(os) - 1),
                    memory_space=pltpu.VMEM)
                for os in out_shapes
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct(os, jnp.float32) for os in out_shapes
            ),
            scratch_shapes=list(scratch),
        )(*operands)
        jax.block_until_ready(got[0])
        print("OK    %-46s sum=%.3f" % (name, float(jnp.sum(got[0]))))
    except Exception as e:
        print("FAIL  %-46s %s" % (name, str(e).split(chr(10))[0][:110]))


def main():
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)
    w2d = jnp.asarray(rng.standard_normal((N, S)) * 0.1, jnp.float32)
    w3d = jnp.asarray(rng.standard_normal((N, S, S)) * 0.1, jnp.float32)
    t3 = jnp.asarray(rng.standard_normal((N, B, S)) * 0.1, jnp.float32)

    def k_two_dots_clean(x_ref, w_ref, m_ref, t_ref, gw_ref, da_ref, scr):
        scr[:] = (x_ref[:][:, :, None] * w_ref[:][:, None, :]) \
            * (1.0 - t_ref[:] * t_ref[:])
        dz = scr[:].astype(jnp.bfloat16)
        gw_ref[:] = jax.lax.dot_general(
            t_ref[:].astype(jnp.bfloat16), dz,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        da_ref[:] = jax.lax.dot_general(
            dz, m_ref[:].astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("dz scratch -> dW + dA (clean outputs)", k_two_dots_clean,
             [x2, w2d, w3d, t3], [(N, S, S), (N, B, S)],
             scratch=(pltpu.VMEM((C, B, S), jnp.float32),))

    def k_dot_then_midbcast(t_ref, m_ref, out_ref):
        z = jax.lax.dot_general(
            t_ref[:].astype(jnp.bfloat16), m_ref[:].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (C,B,S)
        w = jnp.sum(z, axis=1)                               # (C,S)
        out_ref[:] = z + w[:, None, :]                       # bcast on dot out

    run_case("dot out + (C,1,S) broadcast (suspect)", k_dot_then_midbcast,
             [t3, w3d], [(N, B, S)])

    def k_lane_store(t_ref, w_ref, out_ref, scr):
        scr[:] = jnp.zeros((C, S, S), jnp.float32)
        hv = jnp.sum(t_ref[:] * x_like(t_ref), axis=1)       # (C,S)
        scr[:, :, 63:64] = hv[:, :, None]
        out_ref[:] = scr[:]

    def x_like(t_ref):
        return t_ref[:] * 0.0 + 1.0

    run_case("(C,S,1) store to scratch lane slice", k_lane_store,
             [t3, w2d], [(N, S, S)],
             scratch=(pltpu.VMEM((C, S, S), jnp.float32),))

    def k_where_lift(x_ref, t_ref, out_ref):
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (C, B, S), 2)
        out_ref[:] = jnp.where(
            lane3 == 63, x_ref[:][:, :, None], 0.0) + t_ref[:] * 1e-6

    run_case("where-lift (C,B)->(C,B,S) col-sparse", k_where_lift,
             [x2, t3], [(N, B, S)])


if __name__ == "__main__":
    main()

"""Compile-probe Mosaic support for the constructs the fused kernel needs.

Each candidate is a tiny pallas kernel compiled (and run) standalone so a
compiler crash identifies the guilty construct instead of a 500-line
kernel.  Run on the chip.
"""

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, S = 64, 24, 64
N = 256


def run_case(name, kernel, out_shape, *operands):
    try:
        got = pl.pallas_call(
            kernel,
            grid=(N // C,),
            in_specs=[
                pl.BlockSpec(
                    (C,) + op.shape[1:],
                    lambda i: (i,) + (0,) * (op.ndim - 1),
                    memory_space=pltpu.VMEM)
                for op in operands
            ],
            out_specs=pl.BlockSpec(
                (C,) + out_shape[1:],
                lambda i: (i,) + (0,) * (len(out_shape) - 1),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*operands)
        jax.block_until_ready(got)
        print("OK    %-34s sum=%.3f" % (name, float(jnp.sum(got))))
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print("FAIL  %-34s %s" % (name, msg))


def main():
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((N, S)), jnp.float32)
    v3 = jnp.asarray(rng.standard_normal((N, B, S)), jnp.float32)
    m3 = jnp.asarray(rng.standard_normal((N, 8, S)), jnp.float32)

    def k_bias_mid(m_ref, v_ref, out_ref):
        # (C,1,S) middle-dim broadcast over B
        out_ref[:] = v_ref[:] + m_ref[:][:, 1:2, :]

    run_case("bias (C,1,S) broadcast", k_bias_mid, (N, B, S), m3, v3)

    def k_outer_none(x_ref, w_ref, out_ref):
        out_ref[:] = x_ref[:][:, :, None] * w_ref[:][:, None, :]

    run_case("outer via None-indexing", k_outer_none, (N, B, S), x2, w2)

    def k_1d_reduce(x_ref, w_ref, out_ref):
        s = jnp.sum(x_ref[:], axis=1)          # (C,)
        out_ref[:] = w_ref[:] * s[:, None]

    run_case("1D (C,) reduce + [:,None]", k_1d_reduce, (N, S), x2, w2)

    def k_keepdims(x_ref, w_ref, out_ref):
        s = jnp.sum(x_ref[:], axis=1, keepdims=True)  # (C,1)
        out_ref[:] = w_ref[:] * s

    run_case("keepdims (C,1) lane-broadcast", k_keepdims, (N, S), x2, w2)

    def k_repeat(x_ref, w_ref, out_ref):
        s = jnp.sum(x_ref[:], axis=1, keepdims=True)  # (C,1)
        out_ref[:] = w_ref[:] * pltpu.repeat(s, S, axis=1)

    run_case("pltpu.repeat (C,1)->(C,S)", k_repeat, (N, S), x2, w2)

    def k_stack(x_ref, w_ref, out_ref):
        w = w_ref[:]
        out_ref[:] = jnp.stack(
            [w, w * 2.0, w * 3.0, w * 4.0, w, w, w, w], axis=1)

    run_case("stack 8x(C,S)->(C,8,S)", k_stack, (N, 8, S), x2, w2)

    def k_lane0_reduce(v_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, B, S), 2)
        out_ref[:] = jnp.sum(
            jnp.where(lane == 0, v_ref[:], 0.0), axis=2)

    run_case("lane-0 masked reduce 3D->2D", k_lane0_reduce, (N, B), v3)

    def k_cost1(x_ref, out_ref):
        out_ref[:] = jnp.sum(x_ref[:], axis=1, keepdims=True)

    run_case("(C,1) output block", k_cost1, (N, 1), x2)

    def k_onescol(v_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, B, S), 2)
        out_ref[:] = jnp.where(lane == 50, 1.0, v_ref[:])

    run_case("ones-lane set on 3D", k_onescol, (N, B, S), v3)

    def k_matvec(v_ref, w_ref, out_ref):
        # batched (C,B,S) x (C,S) -> (C,B)
        out_ref[:] = jax.lax.dot_general(
            v_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("batched matvec 3Dx2D->2D", k_matvec, (N, B), v3, w2)


if __name__ == "__main__":
    main()

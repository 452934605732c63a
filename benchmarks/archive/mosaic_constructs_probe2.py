"""Compile-probe round 2: the fused kernel's remaining novel constructs."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, S = 64, 24, 64
N = 256


def run_case(name, kernel, out_shape, operands):
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
            out_specs=pl.BlockSpec(
                (C,) + out_shape[1:],
                (lambda nd: lambda i: (i,) + (0,) * nd)(len(out_shape) - 1),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*operands)
        jax.block_until_ready(got)
        print("OK    %-36s sum=%.3f" % (name, float(jnp.sum(got))))
    except Exception as e:
        msg = str(e).split("\n")[0][:150]
        print("FAIL  %-36s %s" % (name, msg))


def main():
    rng = np.random.RandomState(0)
    m3 = jnp.asarray(rng.standard_normal((N, 8, S)), jnp.float32)
    v3 = jnp.asarray(rng.standard_normal((N, B, S)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((N, S, S)) * 0.1, jnp.float32)

    def k_midindex(m_ref, out_ref):
        out_ref[:] = m_ref[:][:, 5, :] * 2.0

    run_case("middle-index (C,8,S)->(C,S)", k_midindex, (N, S), [m3])

    def k_dw_dot(a_ref, d_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16), d_ref[:].astype(jnp.bfloat16),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("dW dot (C,B,S)x(C,B,S)->(C,S,S)", k_dw_dot, (N, S, S),
             [v3, v3])

    def k_da_dot(d_ref, w_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            d_ref[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("dA dot (C,B,S)x(C,S,S)->(C,B,S)", k_da_dot, (N, B, S),
             [v3, w3])

    def k_rng3(m_ref, out_ref):
        pltpu.prng_seed(7 + pl.program_id(0))
        bits = pltpu.prng_random_bits((C, 8, S))
        mant = jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9))
        u = pltpu.bitcast(mant | jnp.uint32(0x3F800000), jnp.float32) - 1.0
        out_ref[:] = m_ref[:] + u

    run_case("prng_random_bits 3D (C,8,S)", k_rng3, (N, 8, S), [m3])

    def k_fwd_dot(a_ref, w_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("fwd dot (C,B,S)x(C,S,S)->(C,B,S)", k_fwd_dot, (N, B, S),
             [v3, w3])


if __name__ == "__main__":
    main()

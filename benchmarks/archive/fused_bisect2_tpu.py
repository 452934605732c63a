"""Sub-bisect the fused forward pass + probe the fix candidates."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, S = 64, 24, 64
N = 128


def run_case(name, kernel, operands, out_shape):
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
        print("OK    %-40s sum=%.3f" % (name, float(jnp.sum(got))))
    except Exception as e:
        print("FAIL  %-40s %s" % (name, str(e).split(chr(10))[0][:120]))


def main():
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)
    xin = jnp.asarray(
        np.stack([rng.standard_normal((N, B)),
                  np.ones((N, B))], axis=2), jnp.float32)  # (N, B, 2)
    vec = jnp.asarray(rng.standard_normal((N, 8, S)) * 0.1, jnp.float32)
    w3d = jnp.asarray(rng.standard_normal((N, S, S)) * 0.1, jnp.float32)

    def k_z1_chain(x_ref, v_ref, out_ref):
        v = v_ref[:]
        z1 = x_ref[:][:, :, None] * v[:, 0, :][:, None, :] + v[:, 1:2, :]
        out_ref[:] = jnp.sum(jnp.tanh(z1), axis=2)

    run_case("z1 outer+bias+tanh+reduce", k_z1_chain, [x2, vec], (N, B))

    def k_z1_dot(xin_ref, v_ref, out_ref):
        z1 = jax.lax.dot_general(
            xin_ref[:].astype(jnp.bfloat16),
            v_ref[:][:, 0:2, :].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:] = jnp.sum(jnp.tanh(z1), axis=2)

    run_case("z1 via xin(k=2) batched dot", k_z1_dot, [xin, vec], (N, B))

    def k_head(a_ref, v_ref, out_ref):
        a = a_ref[:]
        v = v_ref[:]
        w4 = v[:, 4, :]
        b4 = v[:, 5, :][:, 0:1]
        out_ref[:] = jnp.sum(a * w4[:, None, :], axis=2) + b4

    run_case("head lane-reduce + (C,1) add", k_head, [w3d[:, :B, :], vec],
             (N, B))

    def k_fwd_fixed(xin_ref, v_ref, w2_ref, w3_ref, out_ref):
        bf16 = jnp.bfloat16
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (C, B, S), 2)
        z1 = jax.lax.dot_general(
            xin_ref[:].astype(bf16), v_ref[:][:, 0:2, :].astype(bf16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        a1 = jnp.where(lane3 == 50, 1.0, jnp.tanh(z1)).astype(bf16)
        z2 = jax.lax.dot_general(
            a1, w2_ref[:].astype(bf16), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        a2 = jnp.where(lane3 == 50, 1.0, jnp.tanh(z2)).astype(bf16)
        z3 = jax.lax.dot_general(
            a2, w3_ref[:].astype(bf16), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        a3 = jnp.tanh(z3).astype(jnp.float32)
        w4 = v_ref[:][:, 4, :]
        b4 = v_ref[:][:, 5, :][:, 0:1]
        out_ref[:] = jnp.sum(a3 * w4[:, None, :], axis=2) + b4

    run_case("full fwd: xin-dot + ones-lane biases", k_fwd_fixed,
             [xin, vec, w3d, w3d], (N, B))


if __name__ == "__main__":
    main()

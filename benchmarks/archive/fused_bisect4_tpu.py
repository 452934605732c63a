"""Bisect round 4: does a broadcast-outer feeding a batched dot crash,
and does materializing it through VMEM scratch fix it?"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, S = 64, 24, 64
N = 128


def run_case(name, kernel, operands, out_shape, scratch=()):
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
            scratch_shapes=list(scratch),
        )(*operands)
        jax.block_until_ready(got)
        print("OK    %-42s sum=%.3f" % (name, float(jnp.sum(got))))
    except Exception as e:
        print("FAIL  %-42s %s" % (name, str(e).split(chr(10))[0][:110]))


def main():
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)
    w2d = jnp.asarray(rng.standard_normal((N, S)) * 0.1, jnp.float32)
    w3d = jnp.asarray(rng.standard_normal((N, S, S)) * 0.1, jnp.float32)
    t3 = jnp.asarray(rng.standard_normal((N, B, S)) * 0.1, jnp.float32)

    def k_outer_dot(x_ref, w_ref, m_ref, out_ref):
        z = x_ref[:][:, :, None] * w_ref[:][:, None, :]      # (C,B,S)
        out_ref[:] = jax.lax.dot_general(
            z.astype(jnp.bfloat16), m_ref[:].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("outer -> dot (fused)", k_outer_dot, [x2, w2d, w3d],
             (N, B, S))

    def k_outer_scratch_dot(x_ref, w_ref, m_ref, out_ref, scr):
        scr[:] = x_ref[:][:, :, None] * w_ref[:][:, None, :]
        out_ref[:] = jax.lax.dot_general(
            scr[:].astype(jnp.bfloat16), m_ref[:].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("outer -> scratch -> dot", k_outer_scratch_dot,
             [x2, w2d, w3d], (N, B, S),
             scratch=(pltpu.VMEM((C, B, S), jnp.float32),))

    def k_dz3_style(x_ref, w_ref, m_ref, t_ref, out_ref, scr):
        scr[:] = (x_ref[:][:, :, None] * w_ref[:][:, None, :]) \
            * (1.0 - t_ref[:] * t_ref[:])
        dz = scr[:].astype(jnp.bfloat16)
        gw = jax.lax.dot_general(
            t_ref[:].astype(jnp.bfloat16), dz,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (C,S,S)
        da = jax.lax.dot_general(
            dz, m_ref[:].astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (C,B,S)
        out_ref[:] = da + jnp.sum(gw, axis=1)[:, None, :] * 0.0 \
            + jnp.sum(gw, axis=2)[:, None, :] * 1e-3

    run_case("dz3-style scratch -> dW+dA dots", k_dz3_style,
             [x2, w2d, w3d, t3], (N, B, S),
             scratch=(pltpu.VMEM((C, B, S), jnp.float32),))

    def k_tanh_dot(x_ref, w_ref, m_ref, out_ref):
        # broadcast-chain through tanh (no scratch) -> dot
        z = jnp.tanh(x_ref[:][:, :, None] * w_ref[:][:, None, :])
        out_ref[:] = jax.lax.dot_general(
            z.astype(jnp.bfloat16), m_ref[:].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_case("outer -> tanh -> dot (fused)", k_tanh_dot, [x2, w2d, w3d],
             (N, B, S))


if __name__ == "__main__":
    main()

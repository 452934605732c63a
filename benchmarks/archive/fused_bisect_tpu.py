"""Bisect the fused-step kernel crash by compiling staged subsets.

Stage 1: spec machinery only (scalar prefetch + aliases + all operands)
Stage 2: + forward
Stage 3: + likelihood/cost
Stage 4: + backward
Stage 5: + update (the full kernel)
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pysgmcmc_tpu.ops.fused_step as fs

N = 128
C = 64


def build(stage):
    base_kernel = fs._make_kernel(20.0, 100.0, False, C)

    def kernel(int_ref, float_ref, tw2, tw3, tvec, vw2, vw3, vvec,
               mw2, mw3, mvec, x_ref, y_ref,
               ow2, ow3, ovec, pw2, pw3, pvec, cost_ref):
        if stage >= 5:
            return base_kernel(
                int_ref, float_ref, tw2, tw3, tvec, vw2, vw3, vvec,
                mw2, mw3, mvec, x_ref, y_ref,
                ow2, ow3, ovec, pw2, pw3, pvec, cost_ref)

        eps = float_ref[0]
        pltpu.prng_seed(int_ref[0] + pl.program_id(0))
        bf16 = jnp.bfloat16
        vec = tvec[:]
        x = x_ref[:]
        y = y_ref[:]

        if stage == 1:
            ow2[:] = tw2[:] + eps
            ow3[:] = tw3[:] + eps
            ovec[:] = vec + eps
            pw2[:] = (vw2[:].astype(jnp.float32) + eps).astype(pw2.dtype)
            pw3[:] = (vw3[:].astype(jnp.float32) + eps).astype(pw3.dtype)
            pvec[:] = (vvec[:].astype(jnp.float32) + eps).astype(pvec.dtype)
            cost_ref[:] = jnp.sum(x + y, axis=1, keepdims=True)
            return

        # forward
        w1 = vec[:, fs.ROW_W1, :]
        w4 = vec[:, fs.ROW_W4, :]
        scal = vec[:, fs.ROW_SCAL, :]
        b4 = scal[:, fs.LANE_B4:fs.LANE_B4 + 1]
        lvb = scal[:, fs.LANE_LVB:fs.LANE_LVB + 1]
        z1 = x[:, :, None] * w1[:, None, :] + vec[:, 1:2, :]
        a1 = jnp.tanh(z1).astype(bf16)
        w2_bf = tw2[:].astype(bf16)
        w3_bf = tw3[:].astype(bf16)
        z2 = jax.lax.dot_general(
            a1, w2_bf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        a2 = jnp.tanh(z2 + vec[:, 2:3, :]).astype(bf16)
        z3 = jax.lax.dot_general(
            a2, w3_bf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        a3 = jnp.tanh(z3 + vec[:, 3:4, :]).astype(bf16)
        a3f = a3.astype(jnp.float32)
        f_mean = jnp.sum(a3f * w4[:, None, :], axis=2) + b4

        if stage == 2:
            ow2[:] = tw2[:]
            ow3[:] = tw3[:]
            ovec[:] = vec
            pw2[:] = vw2[:]
            pw3[:] = vw3[:]
            pvec[:] = vvec[:]
            cost_ref[:] = jnp.sum(f_mean, axis=1, keepdims=True)
            return

        brow = jax.lax.broadcasted_iota(jnp.int32, (C, fs.B_PAD), 1)
        bmask = (brow < 20).astype(jnp.float32)
        e_lv = jnp.exp(lvb)
        var_inv = 1.0 / (e_lv + 1e-16)
        diff = (f_mean - y) * bmask
        mse = diff * diff
        ll = jnp.sum(-mse * (0.5 * var_inv) - 0.5 * lvb * bmask,
                     axis=1, keepdims=True) * 0.05
        cost_ref[:] = -(ll)
        d_mean = diff * var_inv * 0.05
        d_lvb = -jnp.sum(
            mse * (0.5 * e_lv) * jnp.square(var_inv) - 0.5 * bmask,
            axis=1, keepdims=True) * 0.05
        g_b4 = jnp.sum(d_mean, axis=1, keepdims=True)

        if stage == 3:
            ow2[:] = tw2[:]
            ow3[:] = tw3[:]
            ovec[:] = vec + g_b4[:, :, None] * 0.0 + d_lvb[:, :, None] * 0.0
            pw2[:] = vw2[:]
            pw3[:] = vw3[:]
            pvec[:] = vvec[:]
            return

        g_w4 = jnp.sum(a3f * d_mean[:, :, None], axis=1)
        dz3 = d_mean[:, :, None] * w4[:, None, :] * (1.0 - a3f * a3f)
        g_b3 = jnp.sum(dz3, axis=1)
        dz3_bf = dz3.astype(bf16)
        g_w3 = jax.lax.dot_general(
            a2, dz3_bf, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        da2 = jax.lax.dot_general(
            dz3_bf, w3_bf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        a2f = a2.astype(jnp.float32)
        dz2 = da2 * (1.0 - a2f * a2f)
        g_b2 = jnp.sum(dz2, axis=1)
        dz2_bf = dz2.astype(bf16)
        g_w2 = jax.lax.dot_general(
            a1, dz2_bf, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        da1 = jax.lax.dot_general(
            dz2_bf, w2_bf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        a1f = a1.astype(jnp.float32)
        dz1 = da1 * (1.0 - a1f * a1f)
        g_b1 = jnp.sum(dz1, axis=1)
        g_w1 = jnp.sum(x[:, :, None] * dz1, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, fs.S), 1)
        g_scal = jnp.where(
            lane == fs.LANE_B4, g_b4,
            jnp.where(lane == fs.LANE_LVB, d_lvb, 0.0))
        zr = jnp.zeros((C, fs.S), jnp.float32)
        g_vec = jnp.stack(
            [g_w1, g_b1, g_b2, g_b3, g_w4, g_scal, zr, zr], axis=1)

        # stage 4: write grads as outputs, no update
        ow2[:] = tw2[:] + eps * g_w2
        ow3[:] = tw3[:] + eps * g_w3
        ovec[:] = vec + eps * g_vec
        pw2[:] = vw2[:]
        pw3[:] = vw3[:]
        pvec[:] = vvec[:]

    return kernel


def main():
    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5]
    rng = np.random.RandomState(0)

    def mk(shape, dtype=jnp.float32, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    theta = (mk((N, fs.S, fs.S)), mk((N, fs.S, fs.S)),
             mk((N, fs.VEC_ROWS, fs.S)))
    v = tuple(a.astype(jnp.bfloat16) for a in theta)
    minv = tuple(jnp.abs(a).astype(jnp.bfloat16) + 1 for a in theta)
    x_sel = mk((N, fs.B_PAD), scale=1.0)
    y_sel = mk((N, fs.B_PAD), scale=1.0)

    int_scalars = jnp.asarray([7], jnp.int32)
    float_scalars = jnp.asarray([0.01, 0.001, 0.05, 1e-6], jnp.float32)

    def mat_spec():
        return pl.BlockSpec((C, fs.S, fs.S), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def vec_spec():
        return pl.BlockSpec((C, fs.VEC_ROWS, fs.S), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def data_spec():
        return pl.BlockSpec((C, fs.B_PAD), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def cost_spec():
        return pl.BlockSpec((C, 1), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    state_specs = [mat_spec(), mat_spec(), vec_spec()]
    in_specs = state_specs * 3 + [data_spec(), data_spec()]
    out_shape = (
        tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta)
        + tuple(jax.ShapeDtypeStruct(t.shape, jnp.bfloat16) for t in theta)
        + (jax.ShapeDtypeStruct((N, 1), jnp.float32),)
    )
    out_specs = tuple(state_specs) + tuple(state_specs) + (cost_spec(),)
    aliases = {i + 2: i for i in range(3)}
    aliases.update({i + 5: i + 3 for i in range(3)})

    for stage in stages:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(N // C,),
            in_specs=in_specs, out_specs=out_specs)
        try:
            outs = pl.pallas_call(
                build(stage), grid_spec=grid_spec, out_shape=out_shape,
                input_output_aliases=aliases,
            )(int_scalars, float_scalars,
              *theta, *v, *minv, x_sel, y_sel)
            jax.block_until_ready(outs[0])
            print("OK    stage %d  cost sum=%.3f" % (
                stage, float(jnp.sum(outs[6]))))
        except Exception as e:
            print("FAIL  stage %d  %s" % (stage, str(e).split(chr(10))[0][:140]))


if __name__ == "__main__":
    main()

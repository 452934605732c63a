"""Bisect round 3: which machinery factor breaks the (passing) forward.

v4 = exact stage-2 (expected FAIL); v1 drops aliases; v2 drops scalar
prefetch; v3 keeps aliases but never self-copies an aliased input.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, S, R = 64, 24, 64, 8
N = 128


def forward(tw2, tw3, tvec, x_ref):
    bf16 = jnp.bfloat16
    vec = tvec[:]
    x = x_ref[:]
    w1 = vec[:, 0, :]
    w4 = vec[:, 4, :]
    b4 = vec[:, 5, :][:, 0:1]
    z1 = x[:, :, None] * w1[:, None, :] + vec[:, 1:2, :]
    a1 = jnp.tanh(z1).astype(bf16)
    z2 = jax.lax.dot_general(
        a1, tw2[:].astype(bf16), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    a2 = jnp.tanh(z2 + vec[:, 2:3, :]).astype(bf16)
    z3 = jax.lax.dot_general(
        a2, tw3[:].astype(bf16), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    a3 = jnp.tanh(z3 + vec[:, 3:4, :]).astype(jnp.float32)
    return jnp.sum(a3 * w4[:, None, :], axis=2) + b4


def main():
    rng = np.random.RandomState(0)
    theta = (jnp.asarray(rng.standard_normal((N, S, S)) * 0.1, jnp.float32),
             jnp.asarray(rng.standard_normal((N, S, S)) * 0.1, jnp.float32),
             jnp.asarray(rng.standard_normal((N, R, S)) * 0.1, jnp.float32))
    v = tuple(a.astype(jnp.bfloat16) for a in theta)
    x2 = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)
    int_s = jnp.asarray([7], jnp.int32)
    float_s = jnp.asarray([0.01], jnp.float32)

    def mat():
        return pl.BlockSpec((C, S, S), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def vsp():
        return pl.BlockSpec((C, R, S), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def dat():
        return pl.BlockSpec((C, B), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def cst():
        return pl.BlockSpec((C, 1), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    state = [mat(), mat(), vsp()]
    in_specs = state * 2 + [dat(), dat()]
    out_shape = (
        tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta)
        + tuple(jax.ShapeDtypeStruct(t.shape, jnp.bfloat16) for t in theta)
        + (jax.ShapeDtypeStruct((N, 1), jnp.float32),))
    out_specs = tuple(state) + tuple(state) + (cst(),)

    def run(name, with_scalars, with_aliases, self_copy):
        def kernel(*refs):
            if with_scalars:
                int_ref, float_ref = refs[0], refs[1]
                refs = refs[2:]
                eps = float_ref[0]
            else:
                eps = jnp.float32(0.01)
            (tw2, tw3, tvec, vw2, vw3, vvec, x_ref, y_ref,
             ow2, ow3, ovec, pw2, pw3, pvec, cost_ref) = refs
            f_mean = forward(tw2, tw3, tvec, x_ref)
            if self_copy:
                ow2[:] = tw2[:]
                ow3[:] = tw3[:]
                ovec[:] = tvec[:]
                pw2[:] = vw2[:]
                pw3[:] = vw3[:]
                pvec[:] = vvec[:]
            else:
                ow2[:] = tw2[:] * (1.0 + eps)
                ow3[:] = tw3[:] * (1.0 + eps)
                ovec[:] = tvec[:] * (1.0 + eps)
                pw2[:] = (vw2[:].astype(jnp.float32) * (1.0 + eps)
                          ).astype(pw2.dtype)
                pw3[:] = (vw3[:].astype(jnp.float32) * (1.0 + eps)
                          ).astype(pw3.dtype)
                pvec[:] = (vvec[:].astype(jnp.float32) * (1.0 + eps)
                           ).astype(pvec.dtype)
            cost_ref[:] = jnp.sum(f_mean, axis=1, keepdims=True)

        aliases = {}
        if with_aliases:
            off = 2 if with_scalars else 0
            aliases = {i + off: i for i in range(3)}
            aliases.update({i + 3 + off: i + 3 for i in range(3)})
        try:
            if with_scalars:
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2, grid=(N // C,),
                    in_specs=in_specs, out_specs=out_specs)
                outs = pl.pallas_call(
                    kernel, grid_spec=grid_spec, out_shape=out_shape,
                    input_output_aliases=aliases,
                )(int_s, float_s, *theta, *v, x2, y2)
            else:
                outs = pl.pallas_call(
                    kernel, grid=(N // C,), in_specs=in_specs,
                    out_specs=out_specs, out_shape=out_shape,
                    input_output_aliases=aliases,
                )(*theta, *v, x2, y2)
            jax.block_until_ready(outs[6])
            print("OK    %-44s cost=%.3f" % (name, float(jnp.sum(outs[6]))))
        except Exception as e:
            print("FAIL  %-44s %s" % (name, str(e).split(chr(10))[0][:110]))

    which = sys.argv[1:] or ["v1", "v2", "v3", "v4"]
    if "v1" in which:
        run("no aliases (scalars+selfcopy)", True, False, True)
    if "v2" in which:
        run("no scalar prefetch (aliases+selfcopy)", False, True, True)
    if "v3" in which:
        run("computed outputs (scalars+aliases)", True, True, False)
    if "v4" in which:
        run("exact stage-2 (control)", True, True, True)


if __name__ == "__main__":
    main()

"""Where the wide-slot (H=100, S=128) multi-step milliseconds go.

The flagship (H=50, S=64) roofline (docs/performance.md "Where the 3.19
ms goes") attributed ~83% to MXU batched-dot instance overhead on dots
that use a FRACTION of the 128x128 systolic array.  At S=128 every
matrix dot spans the full array, so that accounting cannot transfer:
this probe measures each component of the H=100 multi-step kernel under
kernel conditions (VMEM-resident operands, fori_loop-repeated, one
pallas_call per probe) and reconciles the sum against the measured
whole-kernel step time.

Components per 32-chain block-step (see ops/fused_step._fwd_bwd at
n_extra=1, s=128):

- 4x "class A" dots, contract 128: z2, z3 forward + da2, da1 backward —
  (C, 24, 128) x (C, 128, 128) batched dot_general.
- 2x "class B" dots, contract 24: the weight-gradient accumulations
  g_w2, g_w3 — (C, 24, 128)^T x (C, 24, 128) -> (C, 128, 128).
- noise: one (C, 128, 256) Box-Muller draw + one (C, 8, 128) vec draw.
- elementwise: tanh fwd/bwd on (C, 24, 128), SGHMC update on
  2x (C, 128, 128) + (C, 136, 128) slabs incl. the bf16<->f32 casts.

Run ON THE CHIP:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/wide_roofline_tpu.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

C, B, S = 32, 24, 128
K = 200          # loop reps per launch (mirrors the multi-step kernel)
N_BLOCKS = 256   # 8192 chains / 32


def _timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def probe_pallas(body, operands, out_like):
    """One grid-N_BLOCKS pallas_call; each block runs ``body`` K times
    over its VMEM-resident operands.  Returns seconds per block-step."""
    specs = [
        pl.BlockSpec(
            (C,) + op.shape[1:],
            lambda i, *_: (i,) + (0,) * (op.ndim - 1),
            memory_space=pltpu.VMEM)
        for op in operands
    ]
    out_spec = pl.BlockSpec(
        (C,) + out_like.shape[1:],
        lambda i, *_: (i,) + (0,) * (out_like.ndim - 1),
        memory_space=pltpu.VMEM)

    def kernel(*refs):
        in_refs, out_ref = refs[:-1], refs[-1]
        pltpu.prng_seed(0, pl.program_id(0))

        def step(t, carry):
            out_ref[:] = body(t, [r[:] for r in in_refs], out_ref[:])
            return carry

        jax.lax.fori_loop(0, K, step, 0)

    call = pl.pallas_call(
        kernel,
        grid=(N_BLOCKS,),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (N_BLOCKS * C,) + out_like.shape[1:], out_like.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    big_ops = [
        jnp.tile(op, (N_BLOCKS,) + (1,) * (op.ndim - 1)) for op in operands]
    f = jax.jit(lambda *o: call(*o))
    wall = _timed(f, *big_ops)
    return wall / (N_BLOCKS * K)


def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, ((contract[0], contract[1]), batch),
        preferred_element_type=jnp.float32)


def main():
    rng = np.random.RandomState(0)
    act = jnp.asarray(rng.standard_normal((C, B, S)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, S, S)), jnp.bfloat16)
    slab = jnp.asarray(rng.standard_normal((C, S, S)), jnp.float32)

    # class A: contract-128, (C,24,128) out
    t_a = probe_pallas(
        lambda t, ops, out: _bdot(
            ops[0], ops[1], (((2,), (1,)))).astype(jnp.bfloat16),
        [act, w], act)
    # class B: contract-24, (C,128,128) out
    t_b = probe_pallas(
        lambda t, ops, out: _bdot(ops[0], ops[1], (((1,), (1,)))),
        [act, act], slab)

    # noise: the wide _block_etas volume (one (C,128,256) + one (C,8,128))
    from pysgmcmc_tpu.ops.fused_step import _normal_3d

    def noise_body(t, ops, out):
        eta = _normal_3d((C, S, 2 * S))
        eta_vec = _normal_3d((C, 8, S))
        return (out + eta[:, :, 0:S] + eta[:, :, S:2 * S]
                + jnp.pad(eta_vec, ((0, 0), (0, S - 8), (0, 0))))

    t_noise = probe_pallas(noise_body, [slab], slab)

    # elementwise: tanh fwd/bwd on (C,24,128) + SGHMC update math on the
    # three wide state areas (2 matrix slabs + big's vec rows), incl.
    # bf16 casts — the non-dot VPU work of one step
    actf = act.astype(jnp.float32)

    def ew_body(t, ops, out):
        s_ = jnp.tanh(ops[0].astype(jnp.float32))
        g = (1.0 - s_ * s_) * s_
        upd = out
        for _ in range(3):  # w2 slab, w3 slab, vec rows (~area of 2.1 slabs)
            sigma = jnp.sqrt(jnp.maximum(
                2.0 * 1e-4 * 0.05 * upd - 1e-8, 1e-16))
            upd = upd - 1e-4 * upd - 0.05 * upd + sigma * upd
            upd = jnp.where(upd > 0, upd, 0.0)
        return upd + jnp.pad(
            jnp.sum(g, axis=1, keepdims=True), ((0, 0), (0, S - 1), (0, 0)))

    t_ew = probe_pallas(ew_body, [act], slab)

    # the measured whole kernel at H=100 (slot S=128), same protocol as
    # benchmarks/multistep_tpu.py wide rows
    from bench import build_workload
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused
    from pysgmcmc_tpu.samplers.base import sample_chain

    n_chains = N_BLOCKS * C
    sampler, positions, select_batch, (x, y) = build_workload(
        n_chains, network="dense", units=(100, 100, 100), return_data=True)
    sampler.burn_in_steps = 100

    @jax.jit
    def warm(positions, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            st = sampler.init(p, k1)
            st, _ = sample_chain(
                sampler, st, k2, 1, batch_fn=select_batch,
                keep_every=sampler.burn_in_steps + 10, collect_costs=False)
            return st
        return jax.vmap(one)(positions, jax.random.split(key, n_chains))

    states = warm(positions, jax.random.PRNGKey(0))

    @jax.jit
    def f(states, key):
        st, _, costs = sample_chain_fused(
            sampler, states, key, 1, x, y, batch_size=20,
            keep_every=K, block_chains=C, state_dtype=jnp.bfloat16,
            collect_positions=False, multistep=True)
        return st, costs

    out = f(states, jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = f(states, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out[1])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out[1])).all()
    total_block_step = best / (K * N_BLOCKS)
    ms_step = best / K * 1e3

    us = 1e6
    acc = 4 * t_a + 2 * t_b + t_noise + t_ew
    print("H=100 multi-step kernel: %.3f ms/step (%.2fM steps/s)"
          % (ms_step, n_chains / ms_step / 1e3))
    print("per 32-chain block-step budget (us):")
    print("  4x class-A dots (contract 128): %7.2f  (%.2f each)"
          % (4 * t_a * us, t_a * us))
    print("  2x class-B dots (contract 24):  %7.2f  (%.2f each)"
          % (2 * t_b * us, t_b * us))
    print("  noise (Box-Muller, 41k norms):  %7.2f" % (t_noise * us))
    print("  elementwise/update/casts:       %7.2f" % (t_ew * us))
    print("  ------------------------------------------")
    print("  accounted:                      %7.2f" % (acc * us))
    print("  measured whole kernel:          %7.2f" % (
        total_block_step * us))
    print("  unaccounted (scheduling, window sel, cost row): %7.2f"
          % ((total_block_step - acc) * us))


if __name__ == "__main__":
    main()

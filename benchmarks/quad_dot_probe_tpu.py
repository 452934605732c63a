"""Probe: does batched-dot instance overhead amortize with depth?

The multi-step flash kernels are dot-instance-overhead bound (~83% of
the block-step; docs/performance.md roofline).  ``pair_dots`` packs 2
chains block-diagonally so every dot contracts the full 128-lane MXU
depth at half the instance count.  The next rung — 4 chains, 256-lane
operands — only wins if a 256-deep contraction is issued as ONE
instance (overhead amortizes) rather than two 128-deep passes (overhead
scales back up).  This measures the primitive directly before any
kernel work: the same 8192 chain-equivalents of layer-2 work
((24,64)x(64,64) per chain) packed block-diagonally at depths
64/128/256/512, batched dot_general inside a Pallas kernel, fixed
128 chain-equivalents per grid block.

Run ON THE CHIP (no JAX_PLATFORMS override):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python benchmarks/quad_dot_probe_tpu.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192          # chain equivalents
S = 64            # per-chain slot width
B = 24            # batch rows per chain
STEPS = 100
CHAINS_PER_BLOCK = 128


def measure(n_pack):
    """ns per chain-equivalent at ``n_pack`` chains per block-diag dot."""
    depth = n_pack * S
    n_inst = N // n_pack                   # total dot instances
    c_blk = CHAINS_PER_BLOCK // n_pack     # instances per grid block

    rng = np.random.RandomState(0)
    w = jnp.asarray(
        rng.standard_normal((n_inst, depth, depth)) * 0.1, jnp.bfloat16)
    a = jnp.asarray(
        rng.standard_normal((n_inst, B, depth)) * 0.1, jnp.bfloat16)

    def kernel(w_ref, a_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            a_ref[:], w_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def call(w, a):
        return pl.pallas_call(
            kernel,
            grid=(n_inst // c_blk,),
            in_specs=[
                pl.BlockSpec((c_blk, depth, depth), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_blk, B, depth), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c_blk, B, depth), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_inst, B, depth), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w, a)

    out = jax.jit(call)(w, a)
    out.block_until_ready()
    ref = np.einsum(
        "nbs,nst->nbt",
        np.asarray(a[:2], np.float32), np.asarray(w[:2], np.float32))
    err = np.abs(ref - np.asarray(out[:2], np.float32)).max()

    # w must be an ARGUMENT, not a closure: closed-over it becomes a
    # program constant (up to ~1 GB at depth 512) and the remote
    # compile request blows the HTTP body limit (413).
    @jax.jit
    def timed(w, a):
        def step(carry, _):
            return call(w, carry), ()
        a, _ = jax.lax.scan(step, a, None, length=STEPS)
        return a

    timed_w = functools.partial(timed, w)
    r = timed_w(a)
    r.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = timed_w(a)
        r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    checksum = float(jnp.sum(r.astype(jnp.float32)))
    ns_per_inst = best / STEPS / n_inst * 1e9
    ns_per_chain = best / STEPS / N * 1e9
    print(
        "pack=%d depth=%4d: %7.3f ms/pass  %6.1f ns/instance  "
        "%5.1f ns/chain-equiv  (err %.4f, checksum %.3f)" % (
            n_pack, depth, best / STEPS * 1e3, ns_per_inst, ns_per_chain,
            err, checksum),
        flush=True,
    )
    return ns_per_chain


def main():
    print("devices:", jax.devices(), flush=True)
    results = {}
    for n_pack in (1, 2, 4, 8):
        try:
            results[n_pack] = measure(n_pack)
        except Exception as exc:  # compile aborts are data too
            print("pack=%d FAILED: %s" % (n_pack, str(exc)[:500]),
                  flush=True)
    if 2 in results:
        for n in (4, 8):
            if n in results:
                print("pack=%d vs pack=2: %.2fx per chain-equiv" % (
                    n, results[2] / results[n]), flush=True)


if __name__ == "__main__":
    main()

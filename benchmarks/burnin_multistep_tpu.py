"""Round-3 on-chip measurement: multi-step VMEM-resident BURN-IN kernel.

The adaptive phase was the last un-amortized segment: the lanes burn-in
kernel (6.61 ms/step, benchmarks/burnin_fused_tpu.py) still launches
per step and round-trips theta/v/tau/g/v_hat through HBM every step.
`parallel/packed.burnin_chain_fused` loops k steps inside ONE kernel
launch with all five state slabs resident in VMEM
(ops/fused_step.fused_bnn_multistep_burnin) — this script measures it on
the flagship 8192-chain 3x50 BNN workload against the lanes kernel, and
sanity-checks the adaptation (tau grows, minv positive/finite, handoff
posterior finite).

Run ON THE CHIP:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/burnin_multistep_tpu.py
"""

import faulthandler
import json
import sys
import time

faulthandler.dump_traceback_later(1200, repeat=True, exit=False)

import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_workload  # noqa: E402
from pysgmcmc_tpu.parallel.packed import (  # noqa: E402
    burnin_chain_fused,
    burnin_chain_lanes,
)

N = 8192
STEPS = 200
BLOCK = 32
INTERPRET = False
BACKEND = "pallas"

# CPU smoke mode: tiny scale + interpret/xla kernels validate the whole
# script before chip time is spent on it.
if os.environ.get("PYSGMCMC_BENCH_SMOKE"):
    N, STEPS, BLOCK, INTERPRET, BACKEND = 4, 20, 4, True, "xla"


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    sampler, positions, select_batch, (x, y) = build_workload(
        N, network="dense", return_data=True)

    states0 = jax.jit(jax.vmap(sampler.init))(
        positions, jax.random.split(jax.random.PRNGKey(0), N))
    jax.block_until_ready(states0)
    results = {}

    # --- lanes burn-in kernel (per-step launch; round-3 baseline) -------
    lanes = jax.jit(lambda s, k: burnin_chain_lanes(
        sampler, s, k, STEPS, batch_fn=select_batch,
        compute_dtype=jnp.bfloat16, backend=BACKEND,
        state_dtype=jnp.float32))
    out_l, dt = timeit(lanes, states0, jax.random.PRNGKey(1))
    results["burnin_lanes_ms_per_step"] = dt / STEPS * 1e3
    print("lanes   burn-in: %.2f ms/step" % (dt / STEPS * 1e3), flush=True)

    # --- multi-step fused burn-in (ONE launch, VMEM-resident) -----------
    for tag, sdt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fused = jax.jit(lambda s, k, _sdt=sdt: burnin_chain_fused(
            sampler, s, k, STEPS, x, y, batch_size=20, block_chains=BLOCK,
            state_dtype=_sdt, interpret=INTERPRET))
        out_f, dt = timeit(fused, states0, jax.random.PRNGKey(2))
        results["burnin_multistep_%s_ms_per_step" % tag] = (
            dt / STEPS * 1e3)
        print("fused-%s burn-in: %.2f ms/step" % (tag, dt / STEPS * 1e3),
              flush=True)

    # adaptation sanity on the last fused output
    tau = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out_f.stats.tau)])
    minv = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out_f.stats.minv)])
    assert np.isfinite(tau).all() and (tau > 1.0).all()
    assert np.isfinite(minv).all() and (minv > 0).all()
    # the two kernel paths adapt toward the same mass matrix
    minv_l = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out_l.stats.minv)])
    corr = float(np.corrcoef(np.log(minv), np.log(minv_l))[0, 1])
    results["log_minv_corr_fused_vs_lanes"] = corr
    print("log-minv correlation fused vs lanes: %.4f" % corr, flush=True)

    if not os.environ.get("PYSGMCMC_BENCH_SMOKE"):
        with open("/root/repo/benchmarks/results_burnin_multistep.json",
                  "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""ESS/sec on the sinc BNN posterior — the BASELINE.md tracked metric.

No reference number exists (the reference cannot parallelize BNN chains);
this establishes ours.  Protocol: train ``n_chains`` parallel SGHMC chains
on the reference BNN workload (sinc, batch 20, scale_grad=N), collect
thinned weight snapshots per chain, compute multi-chain ESS of the network
function values at probe inputs (weight-space ESS is ill-defined across
chains because hidden units permute; function-space ESS is the meaningful
posterior-mixing measure), and divide by sampling wall time.

Usage: python benchmarks/bnn_ess_per_sec.py [-o out.json]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
from pysgmcmc_tpu.diagnostics.objective_functions import sinc
from pysgmcmc_tpu.diagnostics.sampler_diagnostics import effective_sample_size
from pysgmcmc_tpu.models.architectures import default_network
from pysgmcmc_tpu.models.bayesian_neural_network import (
    log_variance_prior_log_like,
    weight_prior_log_like,
)
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--n-chains", type=int, default=64)
    parser.add_argument("--samples-per-chain", type=int, default=200)
    parser.add_argument("--keep-every", type=int, default=20)
    parser.add_argument("--burn-in", type=int, default=1000)
    parser.add_argument("--step-impl", choices=("pytree", "fused"),
                        default="pytree")
    args = parser.parse_args()

    n_data, batch_size = 100, 20
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0.0, 1.0, (n_data, 1)), jnp.float32)
    y = jnp.asarray(np.asarray(sinc(np.asarray(x))), jnp.float32)
    probes = jnp.linspace(0.0, 1.0, 8).reshape(8, 1)

    if args.step_impl == "fused":
        from pysgmcmc_tpu.models.architectures import dense_network

        init_fn, apply_fn = dense_network(1)
    else:
        init_fn, apply_fn = default_network(1)
    fold_prior = args.step_impl == "fused"

    def cost_fn(params, batch):
        xb, yb = batch
        out = apply_fn(params, xb)
        f_mean, f_log_var = out[:, 0:1], out[:, 1:2]
        mse = jnp.square(yb - f_mean)
        ll = jnp.sum(
            jnp.sum(-mse * 0.5 / (jnp.exp(f_log_var) + 1e-16) - 0.5 * f_log_var,
                    axis=1)
        ) / batch_size
        ll += log_variance_prior_log_like(f_log_var) / n_data
        if not fold_prior:
            ll += weight_prior_log_like(params) / n_data
        return -ll

    n_params = sum(
        leaf.size
        for leaf in jax.tree_util.tree_leaves(init_fn(jax.random.PRNGKey(0)))
    )
    sampler = SGHMCSampler(
        cost_fn, stepsize_schedule=float(np.sqrt(1e-4)),
        burn_in_steps=args.burn_in, scale_grad=float(n_data),
        gaussian_prior_scale=(
            1.0 / (n_params * n_data) if fold_prior else 0.0),
    )
    select_batch = make_batch_fn(x, y, batch_size)

    def one_chain(chain_key):
        k_net, k_init, k_burn, k_sample = jax.random.split(chain_key, 4)
        state = sampler.init(init_fn(k_net), k_init)
        if args.burn_in > 0:
            state, _ = sample_chain(
                sampler, state, k_burn, 1, batch_fn=select_batch,
                keep_every=args.burn_in, collect_costs=False,
            )
        state, samples, _ = sample_chain(
            sampler, state, k_sample, args.samples_per_chain,
            batch_fn=select_batch, keep_every=args.keep_every,
        )
        # function-space trace: predictions at probe inputs per snapshot
        f = jax.vmap(lambda p: apply_fn(p, probes)[:, 0])(samples)
        return f  # (samples_per_chain, n_probes)

    if args.step_impl == "fused":
        from pysgmcmc_tpu.parallel.packed import sample_chain_fused

        @jax.jit
        def run(chain_keys):
            def burn_one(ck):
                k_net, k_init, k_burn, _ = jax.random.split(ck, 4)
                state = sampler.init(init_fn(k_net), k_init)
                if args.burn_in > 0:
                    state, _ = sample_chain(
                        sampler, state, k_burn, 1, batch_fn=select_batch,
                        keep_every=args.burn_in, collect_costs=False,
                        phase="burn_in",
                    )
                return state

            states = jax.vmap(burn_one)(chain_keys)
            # 128-chain blocks amortize the per-instance skeleton
            # (benchmarks/results_block_ab.json)
            block = next((b for b in (128, 32)
                          if args.n_chains % b == 0), args.n_chains)
            # multi-step kernel: each keep_every-step thinning segment is
            # ONE VMEM-resident launch (the round-3+ fast path; the
            # round-2 artifact was measured per-step)
            _, samples, _ = sample_chain_fused(
                sampler, states, jax.random.PRNGKey(7),
                args.samples_per_chain, x, y, batch_size=batch_size,
                keep_every=args.keep_every, block_chains=block,
                state_dtype=jnp.bfloat16, multistep=True,
            )
            # function-space trace per chain and snapshot
            return jax.vmap(jax.vmap(lambda p: apply_fn(p, probes)[:, 0]))(
                samples)
    else:
        run = jax.jit(jax.vmap(one_chain))
    chain_keys = jax.random.split(jax.random.PRNGKey(1), args.n_chains)

    traces = run(chain_keys)
    jax.block_until_ready(traces)  # compile + warm run

    t0 = time.perf_counter()
    traces = run(jax.random.split(jax.random.PRNGKey(2), args.n_chains))
    jax.block_until_ready(traces)
    wall = time.perf_counter() - t0

    ess = np.asarray(effective_sample_size(traces))  # per probe
    result = {
        "metric": "ESS/sec on sinc BNN posterior (function-space, 8 probes)",
        "n_chains": args.n_chains,
        "samples_per_chain": args.samples_per_chain,
        "keep_every": args.keep_every,
        "burn_in": args.burn_in,
        "mean_ess": float(ess.mean()),
        "min_ess": float(ess.min()),
        "sampling_wall_seconds": wall,
        "ess_per_sec": float(ess.mean() / wall),
        "reference": "none published (reference trains one chain at a time)",
        "driver": (
            "parallel.packed.sample_chain_fused(multistep=True)"
            if args.step_impl == "fused"
            else "samplers.base.sample_chain (vmapped pytree)"),
    }
    if args.step_impl == "fused":
        # provenance: the generator the default resolved to at measure
        # time — pinned against the shipped default by
        # tests/test_benchmark_results.py so this artifact can't go
        # stale when the default changes
        from pysgmcmc_tpu.parallel.packed import resolve_noise_impl

        result["noise_impl"] = resolve_noise_impl("auto")
    print(json.dumps({k: result[k] for k in
                      ("metric", "mean_ess", "sampling_wall_seconds",
                       "ess_per_sec")}))
    if args.output:
        with open(args.output, "w") as handle:
            json.dump(result, handle, indent=2)


if __name__ == "__main__":
    main()

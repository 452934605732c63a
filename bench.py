"""Headline benchmark: vmapped SGHMC chains on the 3-layer BNN.

Workload (BASELINE.md north star): 8192 independent SGHMC chains, each
sampling the posterior of the reference's 3x50-tanh heteroscedastic BNN on
sinc data (batch 20), advancing in lockstep inside one jitted
``vmap(scan)`` program on a single chip.  The chains first run their full
3000-step self-tuning burn-in, then the *steady-state sampling phase* is
timed — the phase that dominates real workloads (the reference default is
50k sampling iterations after 1-3k burn-in,
``/root/reference/pysgmcmc/models/bayesian_neural_network.py:148-156``)
and the one the static phase-split specializes (frozen mass matrix, no
adaptation-statistics traffic; see ``samplers/_adaptive.py``).

Metric: aggregated sampler update-steps per second per chip
(chains x scan-steps / wall time).  Target: > 1e6 steps/sec/chip.

The reference has no throughput numbers (it performs one host<->device
round trip per step per chain); ``vs_baseline`` is therefore reported
against the 1M steps/sec/chip north-star target.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
from pysgmcmc_tpu.diagnostics.objective_functions import sinc
from pysgmcmc_tpu.models.architectures import default_network
from pysgmcmc_tpu.models.bayesian_neural_network import (
    log_variance_prior_log_like,
    weight_prior_log_like,
)
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


def build_workload(
    n_chains, dtype=jnp.float32, compute_dtype=jnp.bfloat16,
    n_data=100, batch_size=20, fold_weight_prior=True, noise_bits=None,
    network="default", return_data=False, units=(50, 50, 50),
):
    """The north-star posterior: 3x50 heteroscedastic BNN on sinc data.

    Measured configuration choices (benchmarks/sampling_ab_tpu.py — full-step
    A/B on the chip, which overruled two component-probe predictions):

    - ``compute_dtype=bfloat16``: bf16 matmuls win ~1 ms/step end to end
      (5.89 vs 6.87 ms) even though an isolated gradient probe said
      otherwise.
    - threefry everywhere: every use of the XLA RngBitGenerator inside the
      full vmapped scan (rbg keys, or threefry keys with rbg draw bits)
      measured 40% *slower* end to end, despite a 2.1x win in an isolated
      noise probe — RngBitGenerator composes badly with this program.
    - ``fold_weight_prior=True``: the L2 weight prior's gradient is folded
      analytically into the sampler update (``gaussian_prior_scale``) —
      identical dynamics, less autodiff traffic (~0.4 ms/step).  The
      reported per-step cost omits the (tiny, slowly-varying) weight-prior
      term.
    """
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0.0, 1.0, (n_data, 1)), dtype)
    y = jnp.asarray(np.asarray(sinc(np.asarray(x))), dtype)

    if network == "dense":
        # the same architecture with TPU-lane-friendly parameter shapes
        # (identical math and init draws; see models/architectures.py)
        from pysgmcmc_tpu.models.architectures import dense_network

        init_fn, apply_fn = dense_network(1, units=units, dtype=dtype)
    else:
        init_fn, apply_fn = default_network(1, units=units, dtype=dtype)
    params0 = init_fn(jax.random.PRNGKey(0))
    n_params = sum(
        leaf.size for leaf in jax.tree_util.tree_leaves(params0)
    )

    def cost_fn(params, batch):
        xb, yb = batch
        if compute_dtype is not None:
            params_c = jax.tree_util.tree_map(
                lambda leaf: leaf.astype(compute_dtype), params
            )
            out = apply_fn(params_c, xb.astype(compute_dtype)).astype(dtype)
        else:
            out = apply_fn(params, xb)
        f_mean, f_log_var = out[:, 0:1], out[:, 1:2]
        f_var_inv = 1.0 / (jnp.exp(f_log_var) + 1e-16)
        mse = jnp.square(yb - f_mean)
        ll = jnp.sum(jnp.sum(-mse * 0.5 * f_var_inv - 0.5 * f_log_var, axis=1))
        ll = ll / batch_size
        ll += log_variance_prior_log_like(f_log_var) / n_data
        if not fold_weight_prior:
            ll += weight_prior_log_like(params) / n_data
        return -ll

    # cost = -ll; the omitted prior term is wdecay/2 ||theta||^2 / (P N),
    # so its cost gradient is theta * wdecay / (P N) with wdecay = 1.
    prior_scale = 1.0 / (n_params * n_data) if fold_weight_prior else 0.0

    sampler = SGHMCSampler(
        cost_fn,
        stepsize_schedule=float(np.sqrt(1e-4)),
        burn_in_steps=3000,
        scale_grad=float(n_data),
        dtype=dtype,
        gaussian_prior_scale=prior_scale,
        noise_bits=noise_bits,
    )
    select_batch = make_batch_fn(x, y, batch_size)
    # Build the stacked positions host-side in one pass (eager broadcast +
    # jitter ops through the device tunnel are pathologically slow).
    host_rng = np.random.RandomState(1)
    positions = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(
            np.asarray(leaf)[None]
            + 0.01 * host_rng.standard_normal((n_chains,) + leaf.shape),
            dtype,
        ),
        params0,
    )
    if return_data:
        return sampler, positions, select_batch, (x, y)
    return sampler, positions, select_batch


def main():
    n_chains = 8192
    burn_in_steps = 3000
    scan_steps = 200
    repeats = 3

    # The headline path (A/B-measured in benchmarks/packed_ab_tpu.py):
    # dense (lane-friendly) parameterization of the same 3x50 network,
    # burn-in on the pytree path, steady-state sampling on flash-SGHMC —
    # the whole step (forward, likelihood, backward, noise, update) as
    # ONE Pallas kernel (ops/fused_step.py), bf16 momentum/mass state.
    # Quality gate on this exact path: sinc predictive MSE 0.00018.
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused

    sampler, positions, select_batch, (x_data, y_data) = build_workload(
        n_chains, network="dense", return_data=True)

    @jax.jit
    def init_and_burn(positions, key):
        def one_chain(position, chain_key):
            k_init, k_burn = jax.random.split(chain_key)
            state = sampler.init(position, k_init)
            state, _ = sample_chain(
                sampler, state, k_burn, 1,
                batch_fn=select_batch,
                keep_every=burn_in_steps,
                collect_costs=False,
                phase="burn_in",
            )
            return state

        return jax.vmap(one_chain)(positions, jax.random.split(key, n_chains))

    @jax.jit
    def sampling_scan(states, key):
        # multistep: all scan_steps advance INSIDE one kernel launch with
        # the block state resident in VMEM and in-kernel window selection
        # (measured 3.19 vs 3.62 ms/step for the per-step launch variant)
        states, _, costs = sample_chain_fused(
            sampler, states, key, 1, x_data, y_data,
            batch_size=20,
            keep_every=scan_steps,
            # 128-chain blocks amortize the per-instance skeleton:
            # 1.843 vs 1.957 ms/step at block 32
            # (benchmarks/results_block_ab.json)
            block_chains=128,
            state_dtype=jnp.bfloat16,
            collect_positions=False,
            multistep=True,
        )
        return states, costs

    def key(i):
        return jax.random.PRNGKey(i)

    # Full self-tuning burn-in (one compiled scan), then time steady state.
    states = init_and_burn(positions, key(2))
    jax.block_until_ready(states)

    # Warmup / compile of the sampling-phase program.
    states, costs = sampling_scan(states, key(3))
    jax.block_until_ready(states)

    elapsed = []
    for i in range(repeats):
        t0 = time.perf_counter()
        states, costs = sampling_scan(states, key(4 + i))
        jax.block_until_ready(states)
        elapsed.append(time.perf_counter() - t0)

    best = min(elapsed)
    steps_per_sec = n_chains * scan_steps / best

    assert bool(np.isfinite(np.asarray(costs)).all()), "non-finite costs"

    print(
        json.dumps(
            {
                "metric": "SGHMC sampling-phase update-steps/sec/chip "
                          "(8192-chain 3x50 BNN, flash-SGHMC multi-step "
                          "Pallas kernel: 200 steps/launch VMEM-resident, "
                          "in-kernel batch selection + MXU-CLT Hadamard "
                          "noise (Irwin-Hall n=64/128, the noise_impl='auto' "
                          "default since r4; box_muller available), "
                          "bf16 matmul + bf16 momentum/mass state, after "
                          "full 3000-step burn-in)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec/chip",
                "vs_baseline": round(steps_per_sec / 1_000_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

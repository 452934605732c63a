"""Reference-headline benchmark: ESS-vs-stepsize sweeps, on TPU.

Reproduces the measurement protocol behind the reference's only published
numbers (``/root/repo/BASELINE.md``): Relativistic SGHMC, 20 chains x 10^4
kept samples per chain, keep_every=10, per-variable ESS, swept over
stepsizes.  The reference ran every (stepsize, chain) pair sequentially in
a fresh TF graph; here the ENTIRE sweep — all stepsizes x all chains —
executes as one jitted program: stepsizes ride in the traced schedule
state (``TracedStepsizeSchedule``), chains vmap, and ESS is computed on
device over the (n_eps, n_chains, n_samples, dim) history.

``--sampler`` extends the protocol beyond the reference to the framework's
extra samplers (SGNHT, PSGLD — mixing-quality numbers to pair with their
throughput numbers); their stepsize ranges are sampler-appropriate
(thermostat/preconditioned dynamics tolerate different scales than the
relativistic momentum).

Usage: python benchmarks/ess_sweep_tpu.py [banana|gmm1|gmm2|gmm3]
           [--sampler RelativisticSGHMC|SGNHT|PSGLD] [-o out.json]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.objective_functions import (
    banana_log_likelihood,
    gmm1_log_likelihood,
    gmm2_log_likelihood,
    gmm3_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.diagnostics.sampler_diagnostics import effective_sample_size
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.psgld import PSGLDSampler
from pysgmcmc_tpu.samplers.relativistic_sghmc import RelativisticSGHMCSampler
from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler
from pysgmcmc_tpu.stepsize_schedules import TracedStepsizeSchedule

BENCHMARKS = {
    # (log_likelihood, dim, stepsize range) — ranges follow BASELINE.md.
    "banana": (banana_log_likelihood, 2, (0.01, 4.01)),
    "gmm1": (gmm1_log_likelihood, 1, (0.01, 8.01)),
    "gmm2": (gmm2_log_likelihood, 1, (0.01, 8.01)),
    "gmm3": (gmm3_log_likelihood, 1, (0.01, 8.01)),
}

# sampler -> (ctor, stepsize range override or None).  The BASELINE.md
# ranges are calibrated for the relativistic momentum (bounded velocity —
# stable to eps ~4-8); SGNHT's thermostat and pSGLD's preconditioner call
# for their own scales.
SAMPLERS = {
    "RelativisticSGHMC": (RelativisticSGHMCSampler, None),
    # SGNHT on the banana diverges above eps ~0.2 (measured: every chain
    # non-finite from 0.21 on) — sweep the stable region at fine resolution.
    "SGNHT": (SGNHTSampler, (0.0025, 0.2025)),
    "PSGLD": (PSGLDSampler, (0.002, 0.202)),
}


def sweep(benchmark, n_chains=20, samples_per_chain=10_000, keep_every=10,
          stepsize_step=0.05, seed=0, driver="lanes",
          sampler_name="RelativisticSGHMC"):
    """Run the sweep.

    ``driver="lanes"``: the whole (stepsize x chain) grid runs as ONE
    flat chains-on-lanes kernel program (``parallel/packed.
    sample_chain_lanes``) — every chain advances at its own stepsize via
    the per-chain eps row, on the same fused Pallas update kernels the
    BNN fast path ships (falls back to the identical-math jnp backend on
    CPU).  ``driver="pytree"`` is the round-1 vmapped pytree program.
    """
    log_like, dim, (eps_min, eps_max) = BENCHMARKS[benchmark]
    ctor, range_override = SAMPLERS[sampler_name]
    if range_override is not None:
        eps_min, eps_max = range_override
        # keep ~the same number of sweep points over the narrower range
        stepsize_step = stepsize_step * (eps_max - eps_min) / 4.0
    cost_fn = to_negative_log_likelihood(log_like)
    stepsizes = np.arange(eps_min, eps_max, stepsize_step, dtype=np.float32)
    n_eps = len(stepsizes)

    sampler = ctor(cost_fn, stepsize_schedule=TracedStepsizeSchedule(0.001))

    key = jax.random.PRNGKey(seed)
    key_pos, key_run = jax.random.split(key)

    if driver == "lanes":
        from pysgmcmc_tpu.parallel.packed import sample_chain_lanes

        n_real = n_eps * n_chains
        n_total = ((n_real + 127) // 128) * 128  # kernel lane alignment
        positions0 = jax.random.normal(key_pos, (n_total, dim))
        eps_flat = np.full(n_total, eps_min, np.float32)
        eps_flat[:n_real] = np.repeat(stepsizes, n_chains)

        states = jax.jit(jax.vmap(sampler.init))(
            positions0, jax.random.split(key_pos, n_total))
        states = states._replace(schedule_state=jnp.asarray(eps_flat))

        backend = "xla" if jax.default_backend() == "cpu" else "pallas"
        run = jax.jit(lambda s, k: sample_chain_lanes(
            sampler, s, k, samples_per_chain, keep_every=keep_every,
            compute_dtype=None, state_dtype=jnp.float32,
            backend=backend)[1])

        t0 = time.perf_counter()
        flat = run(states, key_run)
        jax.block_until_ready(flat)
        compile_and_run = time.perf_counter() - t0
        # (n_total, n_samples, dim) -> (n_eps, n_chains, n_samples, dim)
        chains = np.asarray(flat)[:n_real].reshape(
            n_eps, n_chains, samples_per_chain, dim)
        chains = jnp.asarray(chains)
    else:
        def one_chain(eps, position, chain_key):
            key_init, key_run2 = jax.random.split(chain_key)
            state = sampler.init(position, key_init)
            state = state._replace(schedule_state=eps)
            _, positions, _ = sample_chain(
                sampler, state, key_run2, samples_per_chain,
                keep_every=keep_every
            )
            return positions

        # grid: (n_eps, n_chains)
        positions0 = jax.random.normal(key_pos, (n_eps, n_chains, dim))
        chain_keys = jax.random.split(key_run, n_eps * n_chains).reshape(
            n_eps, n_chains, -1
        )
        eps_grid = jnp.asarray(stepsizes)[:, None].repeat(n_chains, axis=1)

        run = jax.jit(jax.vmap(jax.vmap(one_chain)))

        t0 = time.perf_counter()
        chains = run(eps_grid, positions0, chain_keys)
        jax.block_until_ready(chains)
        compile_and_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    # ESS per stepsize (vmapped over the sweep axis), mean over dims
    ess = jax.jit(jax.vmap(effective_sample_size))(chains)
    ess = np.atleast_2d(np.asarray(ess).reshape(n_eps, -1))
    ess_time = time.perf_counter() - t0

    # Diverged stepsizes (non-finite chains) come back as NaN from the
    # estimator; report them as null and exclude them from "best".
    mean_ess = ess.mean(axis=1)
    finite = np.isfinite(mean_ess)
    if not finite.any():
        raise RuntimeError(
            f"every stepsize in [{eps_min}, {eps_max}) diverged for "
            f"{sampler_name} on {benchmark}; narrow the range")
    best_idx = int(np.nanargmax(np.where(finite, mean_ess, -np.inf)))

    total_steps = n_eps * n_chains * samples_per_chain * keep_every
    return {
        "benchmark": benchmark,
        "driver": (
            "sample_chain_lanes (chains-on-lanes fused kernels, per-chain "
            "eps row)" if driver == "lanes"
            else "vmapped pytree sample_chain"),
        "protocol": {
            "sampler": sampler_name,
            "n_chains": n_chains,
            "samples_per_chain": samples_per_chain,
            "keep_every": keep_every,
        },
        "stepsizes": stepsizes.tolist(),
        "mean_ess": [float(v) if np.isfinite(v) else None for v in mean_ess],
        "n_diverged_stepsizes": int((~finite).sum()),
        "best": {
            "stepsize": float(stepsizes[best_idx]),
            "mean_ess": float(mean_ess[best_idx]),
        },
        "wall_seconds_total": compile_and_run + ess_time,
        "total_sampler_steps": total_steps,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("benchmark", nargs="?", default="banana",
                        choices=sorted(BENCHMARKS))
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--n-chains", type=int, default=20)
    parser.add_argument("--samples-per-chain", type=int, default=10_000)
    parser.add_argument("--keep-every", type=int, default=10)
    parser.add_argument("--stepsize-increment", type=float, default=0.05)
    parser.add_argument("--driver", choices=("lanes", "pytree"),
                        default="lanes")
    parser.add_argument("--sampler", choices=sorted(SAMPLERS),
                        default="RelativisticSGHMC")
    args = parser.parse_args()

    result = sweep(
        args.benchmark,
        n_chains=args.n_chains,
        samples_per_chain=args.samples_per_chain,
        keep_every=args.keep_every,
        stepsize_step=args.stepsize_increment,
        driver=args.driver,
        sampler_name=args.sampler,
    )
    print(json.dumps(
        {k: result[k] for k in
         ("benchmark", "best", "wall_seconds_total", "total_sampler_steps")}
    ))
    if args.output:
        with open(args.output, "w") as handle:
            json.dump(result, handle, indent=2)


if __name__ == "__main__":
    main()

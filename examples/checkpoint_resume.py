"""Checkpoint / bit-exact resume of a sampling run.

Demonstrates the capability the reference lacks entirely: save the full
sampler state (position, momentum, burn-in statistics, step counter) plus
the PRNG key mid-run, restore, and continue the *exact* trajectory.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.objective_functions import (
    banana_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers import SGHMCSampler, sample_chain
from pysgmcmc_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def main():
    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    sampler = SGHMCSampler(cost_fn, stepsize_schedule=0.05, burn_in_steps=100)

    # Run 500 steps, checkpoint.
    state = sampler.init(jnp.zeros(2))
    key = jax.random.PRNGKey(0)
    key, run_key = jax.random.split(key)
    state, samples_a, _ = sample_chain(sampler, state, run_key, 500)

    ckpt_dir = tempfile.mkdtemp(prefix="sgmcmc_ckpt_")
    save_checkpoint(ckpt_dir, {"state": state, "key": key})
    print("checkpointed at step", int(state.step), "->", ckpt_dir)

    # Continue directly...
    key_cont, run_key2 = jax.random.split(key)
    _, samples_direct, _ = sample_chain(sampler, state, run_key2, 500)

    # ...and continue from the restored checkpoint.
    restored = restore_checkpoint(ckpt_dir, like={"state": state, "key": key})
    key_rest, run_key3 = jax.random.split(restored["key"])
    _, samples_resumed, _ = sample_chain(
        sampler, restored["state"], run_key3, 500
    )

    identical = np.array_equal(
        np.asarray(samples_direct), np.asarray(samples_resumed)
    )
    print("resumed trajectory bit-identical to uninterrupted run:", identical)
    assert identical


if __name__ == "__main__":
    main()

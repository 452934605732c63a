"""Parity tests: fused Pallas SGHMC path vs the pytree XLA path.

On CPU the kernel runs in Pallas interpret mode; the same code compiles via
Mosaic on TPU (exercised by bench.py).
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.ops.fused_update import fused_sghmc_update, pad_dim
from pysgmcmc_tpu.samplers.fused import FusedSGHMC
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


def test_pad_dim():
    assert pad_dim(1) == 128
    assert pad_dim(128) == 128
    assert pad_dim(129) == 256
    assert pad_dim(5252) == 5376


def _quadratic_cost(params):
    return 0.5 * jnp.sum(params["a"] ** 2) + jnp.sum(params["b"] ** 2)


def test_fused_step_matches_xla_path():
    """With identical injected noise, fused math == pytree sampler math."""
    template = {"a": jnp.zeros((3,)), "b": jnp.zeros((2,))}
    n_chains, dim = 4, 5
    dim_p = pad_dim(dim)

    key = jax.random.PRNGKey(0)
    positions = {
        "a": jax.random.normal(key, (n_chains, 3)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (n_chains, 2)),
    }

    # XLA reference path: vmapped pytree sampler with captured noise.
    sampler = SGHMCSampler(
        _quadratic_cost, stepsize_schedule=0.01, burn_in_steps=2, mdecay=0.05,
        scale_grad=3.0,
    )
    fused = FusedSGHMC(
        _quadratic_cost, template, stepsize=0.01, burn_in_steps=2,
        mdecay=0.05, scale_grad=3.0, interpret=True,
    )
    state_f = fused.init(positions)

    states_x = jax.vmap(sampler.init)(positions)

    noise_key = jax.random.PRNGKey(42)
    for step_idx in range(4):  # crosses the burn-in boundary at step 2
        noise_key, sub = jax.random.split(noise_key)
        noise_flat = jax.random.normal(sub, (n_chains, dim_p))

        # drive the fused kernel with the explicit noise
        costs, grads = fused._grads(state_f.theta, None)
        burning_in = state_f.step < fused.burn_in_steps
        outs = fused_sghmc_update(
            state_f.theta, state_f.momentum, state_f.tau, state_f.g,
            state_f.v_hat, state_f.minv, grads,
            0.01, burning_in, 0,
            mdecay=0.05, scale_grad=3.0, noise=noise_flat, interpret=True,
        )
        from pysgmcmc_tpu.samplers.fused import FusedSGHMCState

        state_f = FusedSGHMCState(*outs, step=state_f.step + 1)

        # drive the pytree sampler with the same noise injected via the
        # step's noise= parameter (no module-global mutation)
        chain_noise = {
            "a": noise_flat[:, :3],
            "b": noise_flat[:, 3:5],
        }
        states_x, _ = jax.vmap(
            lambda s, eta: sampler.step(s, jax.random.PRNGKey(0), noise=eta)
        )(states_x, chain_noise)

        # compare positions
        theta_x = jnp.concatenate(
            [states_x.position["a"], states_x.position["b"]], axis=1
        )
        np.testing.assert_allclose(
            np.asarray(state_f.theta[:, :dim]), np.asarray(theta_x),
            rtol=1e-6, atol=1e-7,
        )


@pytest.mark.slow
def test_fused_run_converges_to_mode():
    """Structural check of the full fused run loop in interpret mode.

    The CPU Pallas interpreter stubs the TPU PRNG with zero bits, so the
    noise term vanishes and SGHMC degenerates to momentum descent: chains
    must converge to the quadratic's mode at 0.  (Statistical tests of the
    in-kernel RNG run on real TPU hardware via bench.py and the TPU drive
    in the verify skill.)
    """
    template = {"x": jnp.zeros((2,))}
    cost_fn = lambda p: 0.5 * jnp.sum(p["x"] ** 2)
    fused = FusedSGHMC(
        cost_fn, template, stepsize=0.05, burn_in_steps=200, interpret=True,
    )
    n_chains = 16
    positions = {"x": jnp.full((n_chains, 2), 3.0)}
    state = fused.init(positions)
    state, costs = fused.run(state, jax.random.PRNGKey(0), 600)
    draws = np.asarray(state.theta[:, :2])
    assert np.abs(draws).max() < 0.1  # all chains at the mode
    assert np.isfinite(np.asarray(costs)).all()


def test_fused_flatten_roundtrip():
    template = {"w": jnp.zeros((3, 2)), "b": jnp.zeros((2,))}
    fused = FusedSGHMC(lambda p: 0.0, template, interpret=True)
    stacked = {
        "w": jnp.arange(24.0).reshape(4, 3, 2),
        "b": jnp.arange(8.0).reshape(4, 2),
    }
    flat = fused.flatten_positions(stacked)
    assert flat.shape == (4, 128)
    back = fused.unflatten_positions(flat)
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(stacked["w"]))
    np.testing.assert_array_equal(np.asarray(back["b"]), np.asarray(stacked["b"]))


@pytest.mark.slow
def test_fused_run_shared_batches():
    """per_chain_batches=False broadcasts one minibatch to all chains."""
    import numpy as np

    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    template = {"w": jnp.zeros((2,))}

    def cost_fn(p, batch):
        xb, yb = batch
        return jnp.sum((yb[:, 0] - xb @ p["w"]) ** 2)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(30, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(30,)).astype(np.float32))
    fused = FusedSGHMC(
        cost_fn, template, stepsize=1e-3, burn_in_steps=5, interpret=True,
    )
    state = fused.init({"w": jnp.zeros((4, 2))})
    state, costs = fused.run(
        state, jax.random.PRNGKey(0), 10,
        batch_fn=make_batch_fn(x, y, 5), per_chain_batches=False,
    )
    assert np.isfinite(np.asarray(costs)).all()

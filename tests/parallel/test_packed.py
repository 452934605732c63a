"""Packed flat sampling-phase path: layout round-trips and math parity.

The packed path (``parallel/packed.py`` + ``ops/slim_update.py``) must be
bitwise-identical to the pytree sampler given identical noise, and
statistically identical given its own noise stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.ops.slim_update import slim_sghmc_update
from pysgmcmc_tpu.parallel.packed import (
    make_pack_spec,
    pack_mask,
    pack_tree,
    sample_chain_packed,
    unpack_tree,
)
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
from pysgmcmc_tpu.utils.pytree import normal_like_tree


def _template():
    return {
        "W1": jnp.zeros((1, 50)), "b1": jnp.zeros(50),
        "W2": jnp.zeros((50, 50)), "b2": jnp.zeros(50),
        "W4": jnp.zeros((50, 2)), "b4": jnp.zeros(2),
    }


def test_pack_spec_layout():
    spec = make_pack_spec(_template())
    # every slot 128-aligned, width covers the padded sum
    assert all(off % 128 == 0 for off in spec.offsets)
    assert spec.width % 128 == 0
    assert spec.width == 128 + 128 + 2560 + 128 + 128 + 128


def test_pack_unpack_roundtrip():
    spec = make_pack_spec(_template())
    rng = np.random.RandomState(0)
    stacked = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal((4,) + l.shape),
                              jnp.float32),
        _template(),
    )
    flat = pack_tree(spec, stacked)
    assert flat.shape == (4, spec.width)
    out = unpack_tree(spec, flat)
    for a, b in zip(jax.tree_util.tree_leaves(stacked),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # slot padding is zero
    mask = np.asarray(pack_mask(spec))[0]
    assert np.all(np.asarray(flat)[:, mask == 0] == 0)


def test_slim_update_matches_pytree_step_bitwise():
    """Given identical noise, the flat kernel math == SGHMCSampler.step."""
    # small leaves: the parity is shape-independent and interpret-mode
    # pallas cost scales with elements (fast CI lane)
    template = {
        "W1": jnp.zeros((1, 12)), "b1": jnp.zeros(12),
        "W2": jnp.zeros((12, 12)), "b2": jnp.zeros(12),
    }
    spec = make_pack_spec(template)
    rng = np.random.RandomState(1)
    n = 3

    def rand_tree(scale=1.0):
        return jax.tree_util.tree_map(
            lambda l: jnp.asarray(
                scale * rng.standard_normal((n,) + l.shape), jnp.float32),
            template,
        )

    positions = rand_tree()
    sampler = SGHMCSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.05, burn_in_steps=2, scale_grad=10.0,
        gaussian_prior_scale=0.125,
    )
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n)
    )
    # run burn-in so minv is adapted and frozen
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=2, collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position
    )

    # pytree reference step with injected noise
    ref_state, _ = jax.vmap(
        lambda s, e: sampler.step(
            s, jax.random.PRNGKey(0), jnp.zeros(()), noise=e,
            phase="sampling")
    )(states, eta)

    # flat kernel step with the same noise packed
    theta = pack_tree(spec, states.position)
    v = pack_tree(spec, states.momentum)
    minv = pack_tree(spec, states.stats.minv)
    mask = pack_mask(spec)
    eta_flat = pack_tree(spec, eta)
    theta2, v2 = slim_sghmc_update(
        theta, v,
        pack_tree(spec, jax.vmap(jax.grad(sampler.cost_fn))(
            states.position, jnp.zeros((n,)))),
        minv, mask, eps=0.05, seed=0,
        mdecay=sampler.mdecay, scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        noise=eta_flat, interpret=True,
    )
    got_pos = unpack_tree(spec, theta2)
    got_mom = unpack_tree(spec, v2)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.position),
                    jax.tree_util.tree_leaves(got_pos)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.momentum),
                    jax.tree_util.tree_leaves(got_mom)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


def _gaussian_sampler(**kwargs):
    # standard normal target: cost = 0.5 ||x||^2 (ignores the batch)
    defaults = dict(stepsize_schedule=0.1, burn_in_steps=100, mdecay=0.05)
    defaults.update(kwargs)
    return SGHMCSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        **defaults,
    )


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["xla"])
def test_packed_chain_samples_gaussian(backend):
    """The packed driver's draws match the target's first two moments.

    (The pallas backend's in-kernel PRNG needs real TPU hardware; its
    math parity is pinned bitwise above, and the xla backend shares all
    the layout plumbing.)
    """
    sampler = _gaussian_sampler()
    n = 16
    template = {"x": jnp.zeros(4), "y": jnp.zeros((2, 3))}
    positions = jax.tree_util.tree_map(
        lambda l: 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), (n,) + l.shape), template)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(4), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=100, collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(5), n))

    run = jax.jit(lambda s, k: sample_chain_packed(
        sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
        keep_every=5, compute_dtype=None, backend=backend))
    states, positions, costs = run(states, jax.random.PRNGKey(6))
    draws = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(positions)
    ])
    assert np.isfinite(draws).all()
    assert abs(draws.mean()) < 0.1
    assert abs(draws.std() - 1.0) < 0.15
    assert costs.shape == (n, 400)


def test_packed_updates_state_bookkeeping():
    sampler = _gaussian_sampler(burn_in_steps=0)
    n = 4
    template = {"x": jnp.zeros(3)}
    positions = jax.tree_util.tree_map(
        lambda l: jnp.ones((n,) + l.shape), template)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    new_states, pos, costs = jax.jit(
        lambda s, k: sample_chain_packed(
            sampler, s, k, 3, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=2, compute_dtype=None, backend="xla")
    )(states, jax.random.PRNGKey(1))
    assert int(new_states.step[0]) == 6
    assert costs.shape == (n, 3)
    assert pos["x"].shape == (n, 3, 3)
    # final collected position == final state position
    np.testing.assert_array_equal(
        np.asarray(pos["x"][:, -1]), np.asarray(new_states.position["x"]))


@pytest.mark.slow
def test_stacked_update_tree_matches_pytree_step_bitwise():
    """The leafwise kernel (native layout) == SGHMCSampler.step, same noise."""
    from pysgmcmc_tpu.ops.slim_update import slim_sghmc_update_tree

    template = _template()
    rng = np.random.RandomState(2)
    n = 4
    positions = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal((n,) + l.shape),
                              jnp.float32), template)
    sampler = SGHMCSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.05, burn_in_steps=2, scale_grad=10.0,
        gaussian_prior_scale=0.25,
    )
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=2, collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)
    ref_state, _ = jax.vmap(
        lambda s, e: sampler.step(
            s, jax.random.PRNGKey(0), jnp.zeros(()), noise=e,
            phase="sampling")
    )(states, eta)

    grads = jax.vmap(jax.grad(sampler.cost_fn))(
        states.position, jnp.zeros((n,)))
    outs = slim_sghmc_update_tree(
        states.position, states.momentum, grads, states.stats.minv,
        eps=0.05, seed=0,
        mdecay=sampler.mdecay, scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        noise=eta, emit_bf16=True, interpret=True,
    )
    theta2, v2, theta_bf16 = outs
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.position),
                    jax.tree_util.tree_leaves(theta2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.momentum),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(theta2),
                    jax.tree_util.tree_leaves(theta_bf16)):
        assert b.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(a).astype(jnp.bfloat16), np.asarray(b))


@pytest.mark.slow
@pytest.mark.parametrize("bf16_params", [False, True])
def test_stacked_chain_samples_gaussian(bf16_params):
    """The stacked driver (xla backend) matches the target's moments."""
    from pysgmcmc_tpu.parallel.packed import sample_chain_stacked

    sampler = _gaussian_sampler()
    n = 16
    template = {"x": jnp.zeros(4), "y": jnp.zeros((2, 3))}
    positions = jax.tree_util.tree_map(
        lambda l: 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), (n,) + l.shape), template)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(4), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=100, collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(5), n))

    run = jax.jit(lambda s, k: sample_chain_stacked(
        sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
        keep_every=5, backend="xla", bf16_params=bf16_params))
    states, positions, costs = run(states, jax.random.PRNGKey(6))
    draws = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(positions)
    ])
    assert np.isfinite(draws).all()
    assert abs(draws.mean()) < 0.1
    # bf16 gradients perturb each draw by O(2^-8) relative -- far below
    # the injected sampling noise; the tolerance covers both modes
    assert abs(draws.std() - 1.0) < 0.15
    assert costs.shape == (n, 400)
    assert int(states.step[0]) == 100 + 400 * 5


def test_lanes_pack_unpack_roundtrip():
    from pysgmcmc_tpu.parallel.packed import (
        make_lanes_spec, pack_lanes, unpack_lanes,
    )

    template = _template()
    spec = make_lanes_spec(template)
    assert all(off % 8 == 0 for off in spec.offsets)
    assert spec.rows % 256 == 0
    rng = np.random.RandomState(3)
    stacked = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal((4,) + l.shape),
                              jnp.float32), template)
    flat = pack_lanes(spec, stacked)
    assert flat.shape == (spec.rows, 4)
    out = unpack_lanes(spec, flat)
    for a, b in zip(jax.tree_util.tree_leaves(stacked),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.parametrize("state_dtype", ["f32", "bf16"])
def test_lanes_chain_samples_gaussian(state_dtype):
    """The chains-on-lanes driver (xla backend) matches target moments.

    bf16 momentum/mass state perturbs each step by O(2^-8) relative on the
    momentum — far below the injected noise; the stationary moments must
    be indistinguishable at this tolerance.
    """
    from pysgmcmc_tpu.parallel.packed import sample_chain_lanes

    state_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[state_dtype]
    sampler = _gaussian_sampler()
    n = 16
    template = {"x": jnp.zeros(4), "y": jnp.zeros((2, 3))}
    positions = jax.tree_util.tree_map(
        lambda l: 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), (n,) + l.shape), template)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(4), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=100, collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(5), n))

    run = jax.jit(lambda s, k: sample_chain_lanes(
        sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
        keep_every=5, compute_dtype=None, backend="xla",
        state_dtype=state_dtype))
    states, positions, costs = run(states, jax.random.PRNGKey(6))
    draws = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(positions)
    ])
    assert np.isfinite(draws).all()
    assert abs(draws.mean()) < 0.1
    assert abs(draws.std() - 1.0) < 0.15
    assert costs.shape == (n, 400)
    assert int(states.step[0]) == 100 + 400 * 5


def test_packed_rejects_non_sghmc():
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler

    sampler = SGLDSampler(lambda p: jnp.sum(p**2), stepsize_schedule=0.01)
    with pytest.raises(NotImplementedError):
        sample_chain_packed(sampler, None, jax.random.PRNGKey(0), 1)


@pytest.mark.slow
def test_slim_sgld_update_matches_pytree_step():
    """The flat SGLD kernel math == SGLDSampler.step, same noise."""
    from pysgmcmc_tpu.ops.slim_update import slim_sgld_update
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler

    template = _template()
    spec = make_pack_spec(template)
    rng = np.random.RandomState(5)
    n = 3
    positions = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal((n,) + l.shape),
                              jnp.float32), template)
    sampler = SGLDSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.01, burn_in_steps=2, scale_grad=10.0,
        gaussian_prior_scale=0.125,
    )
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=2, collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)
    ref_state, _ = jax.vmap(
        lambda s, e: sampler.step(
            s, jax.random.PRNGKey(0), jnp.zeros(()), noise=e,
            phase="sampling")
    )(states, eta)

    grads = jax.vmap(jax.grad(sampler.cost_fn))(
        states.position, jnp.zeros((n,)))
    theta2 = slim_sgld_update(
        pack_tree(spec, states.position),
        pack_tree(spec, grads),
        pack_tree(spec, states.stats.minv),
        pack_mask(spec), eps=0.01, seed=0,
        a_coef=float(sampler.A), scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        noise=pack_tree(spec, eta), interpret=True,
    )
    got = unpack_tree(spec, theta2)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.position),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


@pytest.mark.slow
def test_lanes_sgld_samples_gaussian():
    """The lanes driver with SGLD (xla backend) matches target moments."""
    from pysgmcmc_tpu.parallel.packed import sample_chain_lanes
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler

    sampler = SGLDSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.05, burn_in_steps=100,
    )
    n = 16
    template = {"x": jnp.zeros(4), "y": jnp.zeros((2, 3))}
    positions = jax.tree_util.tree_map(
        lambda l: 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), (n,) + l.shape), template)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(4), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=100, collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(5), n))

    run = jax.jit(lambda s, k: sample_chain_lanes(
        sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
        keep_every=5, compute_dtype=None, backend="xla"))
    states, positions, costs = run(states, jax.random.PRNGKey(6))
    draws = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(positions)
    ])
    assert np.isfinite(draws).all()
    assert abs(draws.mean()) < 0.1
    assert abs(draws.std() - 1.0) < 0.15
    assert int(states.step[0]) == 100 + 400 * 5


@pytest.mark.slow
def test_slim_psgld_update_matches_pytree_step():
    """The flat pSGLD kernel math == PSGLDSampler.step, same noise."""
    from pysgmcmc_tpu.ops.slim_update import slim_psgld_update
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler

    template = _template()
    spec = make_pack_spec(template)
    rng = np.random.RandomState(7)
    n = 3
    positions = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal((n,) + l.shape),
                              jnp.float32), template)
    sampler = PSGLDSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.01, scale_grad=10.0,
    )
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    # a couple of steps so the accumulator is non-trivial
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=3, collect_costs=False)
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)
    ref_state, _ = jax.vmap(
        lambda s, e: sampler.step(
            s, jax.random.PRNGKey(0), jnp.zeros(()), noise=e)
    )(states, eta)

    grads = jax.vmap(jax.grad(sampler.cost_fn))(
        states.position, jnp.zeros((n,)))
    theta2, v2 = slim_psgld_update(
        pack_tree(spec, states.position),
        pack_tree(spec, states.v),
        pack_tree(spec, grads),
        pack_mask(spec), eps=0.01, seed=0,
        alpha=sampler.alpha, lambda_reg=sampler.lambda_reg,
        scale_grad=sampler.scale_grad,
        noise=pack_tree(spec, eta), interpret=True,
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.position),
                    jax.tree_util.tree_leaves(unpack_tree(spec, theta2))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.v),
                    jax.tree_util.tree_leaves(unpack_tree(spec, v2))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


@pytest.mark.slow
def test_lanes_psgld_samples_gaussian():
    """The lanes driver with pSGLD (xla backend) matches target moments."""
    from pysgmcmc_tpu.parallel.packed import sample_chain_lanes
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler

    sampler = PSGLDSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.05,
    )
    n = 16
    template = {"x": jnp.zeros(4), "y": jnp.zeros((2, 3))}
    positions = jax.tree_util.tree_map(
        lambda l: 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), (n,) + l.shape), template)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(4), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=200, collect_costs=False)
    )(states, jax.random.split(jax.random.PRNGKey(5), n))

    run = jax.jit(lambda s, k: sample_chain_lanes(
        sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
        keep_every=5, compute_dtype=None, backend="xla"))
    states2, positions, costs = run(states, jax.random.PRNGKey(6))
    draws = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(positions)
    ])
    assert np.isfinite(draws).all()
    assert int(states2.step[0]) == 200 + 400 * 5

    # the lanes driver must match the PYTREE pSGLD's stationary moments
    # (pSGLD's preconditioned discretization over-disperses this target at
    # eps=0.05 -- that bias belongs to the sampler, not the driver)
    ref_run = jax.jit(jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=5)[1]))
    ref_positions = ref_run(
        states, jax.random.split(jax.random.PRNGKey(7), n))
    ref = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(ref_positions)
    ])
    assert abs(draws.mean() - ref.mean()) < 0.15
    assert abs(draws.std() - ref.std()) < 0.25 * ref.std()


@pytest.mark.slow
def test_slim_rsghmc_update_matches_pytree_step():
    """The flat relativistic kernel math == RelativisticSGHMCSampler.step."""
    from pysgmcmc_tpu.ops.slim_update import slim_rsghmc_update
    from pysgmcmc_tpu.samplers.relativistic_sghmc import (
        RelativisticSGHMCSampler,
    )

    template = _template()
    spec = make_pack_spec(template)
    rng = np.random.RandomState(9)
    n = 3
    positions = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal((n,) + l.shape),
                              jnp.float32), template)
    sampler = RelativisticSGHMCSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.05,
    )
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))

    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)
    ref_state, _ = jax.vmap(
        lambda s, e: sampler.step(
            s, jax.random.PRNGKey(0), jnp.zeros(()), noise=e)
    )(states, eta)

    grads = jax.vmap(jax.grad(sampler.cost_fn))(
        states.position, jnp.zeros((n,)))
    theta2, p2 = slim_rsghmc_update(
        pack_tree(spec, states.position),
        pack_tree(spec, states.momentum),
        pack_tree(spec, grads),
        pack_mask(spec), eps=0.05, seed=0,
        d_coef=sampler.D, bhat=sampler.Bhat, mass=sampler.mass,
        speed_of_light=sampler.speed_of_light,
        noise=pack_tree(spec, eta), interpret=True,
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.position),
                    jax.tree_util.tree_leaves(unpack_tree(spec, theta2))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.momentum),
                    jax.tree_util.tree_leaves(unpack_tree(spec, p2))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


@pytest.mark.slow
def test_lanes_rsghmc_samples_gaussian():
    """The lanes driver with relativistic SGHMC matches pytree moments."""
    from pysgmcmc_tpu.parallel.packed import sample_chain_lanes
    from pysgmcmc_tpu.samplers.relativistic_sghmc import (
        RelativisticSGHMCSampler,
    )

    sampler = RelativisticSGHMCSampler(
        lambda p, b: 0.5 * sum(jnp.sum(x**2) for x in
                               jax.tree_util.tree_leaves(p)),
        stepsize_schedule=0.05,
    )
    n = 16
    template = {"x": jnp.zeros(4), "y": jnp.zeros((2, 3))}
    positions = jax.tree_util.tree_map(
        lambda l: 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), (n,) + l.shape), template)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(4), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=200, collect_costs=False)
    )(states, jax.random.split(jax.random.PRNGKey(5), n))

    run = jax.jit(lambda s, k: sample_chain_lanes(
        sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
        keep_every=5, compute_dtype=None, backend="xla"))
    states2, positions_out, costs = run(states, jax.random.PRNGKey(6))
    draws = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(positions_out)
    ])
    assert np.isfinite(draws).all()

    ref_run = jax.jit(jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 400, batch_fn=lambda kk: jnp.zeros(()),
            keep_every=5)[1]))
    ref_positions = ref_run(
        states, jax.random.split(jax.random.PRNGKey(7), n))
    ref = np.concatenate([
        np.asarray(l).reshape(-1)
        for l in jax.tree_util.tree_leaves(ref_positions)
    ])
    assert abs(draws.mean() - ref.mean()) < 0.15
    assert abs(draws.std() - ref.std()) < 0.25 * ref.std()
    assert int(states2.step[0]) == 200 + 400 * 5


def test_resolve_noise_impl_rules():
    """'auto' resolution: CLT on the real fused path, Box-Muller under
    interpret (zero PRNG bits must mean ZERO noise — the CLT generator's
    zero-bit output is a -sqrt(12n)/2 lane-0 constant that, eagerly
    resolved, injected a persistent per-step bias into every CPU model
    training run) and for the paired kernels (box_muller only)."""
    from pysgmcmc_tpu.parallel.packed import resolve_noise_impl

    assert resolve_noise_impl("auto") == "hadamard_clt"
    assert resolve_noise_impl("auto", pair_dots=True) == "box_muller"
    assert resolve_noise_impl("auto", interpret=True) == "box_muller"
    assert resolve_noise_impl("box_muller") == "box_muller"
    assert resolve_noise_impl("hadamard_clt", interpret=True) == \
        "hadamard_clt"


def test_model_keeps_noise_impl_unresolved():
    """The model must NOT resolve 'auto' at construction: the drivers
    resolve per call with the interpret flag (regression: bc9b8ee)."""
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        BayesianNeuralNetwork,
    )

    bnn = BayesianNeuralNetwork(network="dense", step_impl="fused")
    assert bnn.noise_impl == "auto"
    assert BayesianNeuralNetwork().noise_impl == "box_muller"

"""flash-SGHMC fused-step kernel: packing round-trips and math parity.

The whole-step kernel (forward + likelihood + backward + update in one
Pallas call) must reproduce the pytree sampler's step on the dense BNN —
same minibatch, same injected noise — up to bfloat16 matmul rounding.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# repo root (for `import bench`) relative to THIS file, so the
# mutation harness's copied trees test their own package, not
# the original checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pysgmcmc_tpu.ops.fused_step import (  # noqa: E402
    B_PAD,
    data_windows,
    fused_bnn_step,
    gather_batch,
    pack_fused,
    unpack_fused,
)
from pysgmcmc_tpu.samplers.base import sample_chain  # noqa: E402
from pysgmcmc_tpu.utils.pytree import normal_like_tree  # noqa: E402


def _workload(n_chains=4):
    from bench import build_workload

    sampler, positions, select = build_workload(
        n_chains=n_chains, network="dense")
    # the bench config burns in for 3000 steps; 50 is plenty for the
    # parity tests and keeps the CPU run fast
    sampler.burn_in_steps = 50
    return sampler, positions, select


def test_pack_unpack_roundtrip():
    from pysgmcmc_tpu.models.architectures import dense_network

    init_fn, _ = dense_network(1)
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), 3))
    packed = pack_fused(params)
    assert packed[0].shape == (3, 72, 64)   # W2 slab + vector rows
    assert packed[1].shape == (3, 64, 64)
    out = unpack_fused(packed, 50)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(params[k]), np.asarray(out[k]), err_msg=k)
    # padding is zero (row 50 holds the bias; rows 64+ the vector slots)
    assert np.all(np.asarray(packed[0])[:, 51:64, :] == 0)
    assert np.all(np.asarray(packed[0])[:, :64, 50:] == 0)


def test_data_windows_match_batch_fn():
    """Window contents equal data_batches.batch_fn's windows."""
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (30, 1)).astype(np.float32)
    y = rng.uniform(0, 1, 30).astype(np.float32)
    xw, yw = data_windows(x, y, batch_size=7)
    assert xw.shape == (24, B_PAD)
    for w in (0, 5, 23):
        np.testing.assert_array_equal(
            np.asarray(xw)[w, :7], x[w:w + 7, 0])
        np.testing.assert_array_equal(
            np.asarray(yw)[w, :7], y[w:w + 7])
        assert np.all(np.asarray(xw)[w, 7:] == 0)


@pytest.mark.slow
def test_fused_step_matches_pytree_step():
    """One fused step == vmapped SGHMCSampler.step (same batch + noise)."""
    n = 4
    sampler, positions, _ = _workload(n)
    # the bench workload's data (bench.build_workload defaults)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)

    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    x_win, y_win = data_windows(x, y, 20)

    # a couple of burn-in steps so minv is adapted (and then frozen)
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=select, keep_every=sampler.burn_in_steps,
            collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    widx = jnp.asarray([0, 3, 80, 41], jnp.int32)
    x_sel, y_sel = gather_batch(x_win, y_win, widx)
    np.testing.assert_allclose(
        np.asarray(x_sel)[2, :20], x[80:100, 0], rtol=0, atol=0)

    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)

    # reference: the pytree sampler on the same batches with the same noise
    def ref_step(state, e, w):
        xb = jax.lax.dynamic_slice_in_dim(jnp.asarray(x), w, 20, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(y).reshape(-1), w, 20, axis=0).reshape(-1, 1)
        return sampler.step(
            state, jax.random.PRNGKey(0), (xb, yb), noise=e,
            phase="sampling")[0]

    ref = jax.vmap(ref_step)(states, eta, widx)

    eps = float(np.sqrt(1e-4))
    theta = pack_fused(states.position)
    v = pack_fused(states.momentum)
    minv = pack_fused(states.stats.minv)
    noise = pack_fused(eta)
    theta2, v2, cost = fused_bnn_step(
        theta, v, minv, x_sel, y_sel, eps, 0,
        mdecay=sampler.mdecay, scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, noise=noise, interpret=True,
    )

    got_pos = unpack_fused(theta2, 50)
    got_mom = unpack_fused(v2, 50)
    for k in got_pos:
        np.testing.assert_allclose(
            np.asarray(ref.position[k]), np.asarray(got_pos[k]),
            rtol=0, atol=2e-4, err_msg="position " + k)
        np.testing.assert_allclose(
            np.asarray(ref.momentum[k]), np.asarray(got_mom[k]),
            rtol=0, atol=2e-4, err_msg="momentum " + k)

    # the cost the kernel reports matches the sampler's cost function
    ref_costs = jax.vmap(
        lambda p, w: sampler.cost_fn(p, (
            jax.lax.dynamic_slice_in_dim(jnp.asarray(x), w, 20, axis=0),
            jax.lax.dynamic_slice_in_dim(
                jnp.asarray(y).reshape(-1), w, 20, axis=0).reshape(-1, 1),
        ))
    )(states.position, widx)
    np.testing.assert_allclose(
        np.asarray(ref_costs), np.asarray(cost)[:, 0], rtol=5e-3, atol=5e-3)

    # padding never moves (row 50 is the bias row; rows 64+ vec slots)
    assert np.all(np.asarray(theta2[0])[:, 51:64, :] == 0)
    assert np.all(np.asarray(theta2[0])[:, :64, 50:] == 0)
    assert np.all(np.asarray(v2[0])[:, 51:64, :] == 0)


@pytest.mark.slow
def test_fused_driver_finite_and_bookkeeping():
    """sample_chain_fused runs end to end (interpret mode, injected-free).

    Interpret mode's PRNG returns zero bits, so this checks plumbing and
    finiteness, not the noise distribution (that is pinned on hardware by
    the shared _normal_from_bits validation and the bench quality gate).
    """
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused

    n = 4
    sampler, positions, _ = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)

    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=select,
            keep_every=sampler.burn_in_steps,
            collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    states, pos, costs = sample_chain_fused(
        sampler, states, jax.random.PRNGKey(2), 3, x, y,
        batch_size=20, keep_every=2, block_chains=n,
        state_dtype=jnp.float32, interpret=True,
    )
    assert costs.shape == (n, 3)
    assert np.isfinite(np.asarray(costs)).all()
    assert pos["w2"].shape == (n, 3, 50, 50)
    assert int(states.step[0]) == sampler.burn_in_steps + 6
    leaves = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(states.position)])
    assert np.isfinite(leaves).all()


@pytest.mark.slow
def test_multi_input_pack_roundtrip_and_step():
    """n_inputs > 1: packing round-trips and one fused step runs.

    The flagship family generalizes to up to MAX_INPUTS features: w1 is a
    matrix occupying the first rows of the vector slab.
    """
    from pysgmcmc_tpu.models.architectures import dense_network
    from pysgmcmc_tpu.ops.fused_step import MAX_INPUTS

    k = 3
    assert k <= MAX_INPUTS
    init_fn, apply_fn = dense_network(k)
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), 4))
    assert params["w1"].shape == (4, k, 50)
    packed = pack_fused(params)
    out = unpack_fused(packed, 50, n_inputs=k)
    for key in params:
        np.testing.assert_array_equal(
            np.asarray(params[key]), np.asarray(out[key]), err_msg=key)

    # one fused step on multi-feature data (interpret, injected noise)
    from pysgmcmc_tpu.utils.pytree import tree_zeros_like

    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (50, k)).astype(np.float32)
    y = rng.uniform(0, 1, 50).astype(np.float32)
    x_win, y_win = data_windows(x, y, 20)
    assert x_win.shape == (31, B_PAD, k)
    x_sel, y_sel = gather_batch(
        x_win, y_win, jnp.asarray([0, 5, 11, 30], jnp.int32))
    assert x_sel.shape == (4, B_PAD, k)
    np.testing.assert_array_equal(np.asarray(x_sel)[1, :20], x[5:25])

    theta = packed
    v = pack_fused(tree_zeros_like(params))
    minv = pack_fused(
        jax.tree_util.tree_map(lambda l: jnp.ones_like(l), params))
    noise = pack_fused(tree_zeros_like(params))
    theta2, v2, cost = fused_bnn_step(
        theta, v, minv, x_sel, y_sel, 0.01, 0,
        mdecay=0.05, scale_grad=50.0, prior_scale=1e-6,
        batch_size=20, n_data=50, block_chains=4,
        state_dtype=jnp.float32, n_inputs=k, noise=noise, interpret=True,
    )
    assert np.isfinite(np.asarray(cost)).all()
    got = unpack_fused(theta2, 50, n_inputs=k)
    # zero noise: theta moved only by the gradient terms; finite + moved
    moved = sum(
        float(np.abs(np.asarray(got[key]) - np.asarray(params[key])).max())
        for key in got)
    assert np.isfinite(moved) and moved > 0


def _bnn_data():
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    return x, y


@pytest.mark.slow
def test_fused_sgld_step_matches_pytree_step():
    """One fused SGLD step == vmapped SGLDSampler.step (same batch/noise)."""
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_step_sgld
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler

    n = 4
    base, positions, _ = _workload(n)
    sampler = SGLDSampler(
        base.cost_fn, stepsize_schedule=0.01, burn_in_steps=50,
        scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale)
    x, y = _bnn_data()

    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=select, keep_every=50,
            collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    x_win, y_win = data_windows(x, y, 20)
    widx = jnp.asarray([0, 3, 80, 41], jnp.int32)
    x_sel, y_sel = gather_batch(x_win, y_win, widx)
    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)

    def ref_step(state, e, w):
        xb = jax.lax.dynamic_slice_in_dim(jnp.asarray(x), w, 20, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(y).reshape(-1), w, 20, axis=0).reshape(-1, 1)
        return sampler.step(
            state, jax.random.PRNGKey(0), (xb, yb), noise=e,
            phase="sampling")[0]

    ref = jax.vmap(ref_step)(states, eta, widx)

    theta2, cost = fused_bnn_step_sgld(
        pack_fused(states.position), pack_fused(states.stats.minv),
        x_sel, y_sel, 0.01, 0,
        a_coef=float(sampler.A), scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        batch_size=20, n_data=100, block_chains=n,
        noise=pack_fused(eta), interpret=True,
    )
    got_pos = unpack_fused(theta2, 50)
    # SGLD's position update moves at eps * minv (not SGHMC's eps^2 *
    # minv), and the 50-step-adapted minv reaches ~1e3 on slow-moving
    # coordinates, so the kernel's bf16 forward/backward rounding is
    # amplified ~100x relative to the SGHMC parity bound.  The 1e-2
    # bound is still ~50x below the per-step injected noise (sigma ~
    # 0.45 at these minv values), i.e. the deterministic parts agree to
    # far under one noise quantum.
    for k in got_pos:
        np.testing.assert_allclose(
            np.asarray(ref.position[k]), np.asarray(got_pos[k]),
            rtol=0, atol=1e-2, err_msg="position " + k)
    assert np.isfinite(np.asarray(cost)).all()
    # padding never moves
    assert np.all(np.asarray(theta2[0])[:, 51:64, :] == 0)
    assert np.all(np.asarray(theta2[0])[:, :64, 50:] == 0)


@pytest.mark.slow
def test_fused_psgld_step_matches_pytree_step():
    """One fused pSGLD step == vmapped PSGLDSampler.step (same batch/noise).

    pSGLD's preconditioner 1/(lambda + sqrt(v)) amplifies the bf16
    gradient rounding where the accumulator is small, so the position
    tolerance is looser than the SGHMC/SGLD kernels'; the accumulator
    itself (quadratic in the gradient) is tight.
    """
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_step_psgld
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler

    n = 4
    base, positions, _ = _workload(n)
    sampler = PSGLDSampler(
        base.cost_fn, stepsize_schedule=1e-5,
        scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale)
    x, y = _bnn_data()

    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    # some adaptation so the accumulator is away from zero
    def adv(state, k):
        def body(carry, kk):
            s, = carry
            s, _ = sampler.step(s, kk, (jnp.asarray(x)[:20],
                                        jnp.asarray(y)[:20]))
            return (s,), ()
        (state,), _ = jax.lax.scan(
            body, (state,), jax.random.split(k, 10))
        return state

    states = jax.vmap(adv)(
        states, jax.random.split(jax.random.PRNGKey(1), n))

    x_win, y_win = data_windows(x, y, 20)
    widx = jnp.asarray([0, 3, 80, 41], jnp.int32)
    x_sel, y_sel = gather_batch(x_win, y_win, widx)
    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)

    def ref_step(state, e, w):
        xb = jax.lax.dynamic_slice_in_dim(jnp.asarray(x), w, 20, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(y).reshape(-1), w, 20, axis=0).reshape(-1, 1)
        return sampler.step(
            state, jax.random.PRNGKey(0), (xb, yb), noise=e)[0]

    ref = jax.vmap(ref_step)(states, eta, widx)

    theta2, v2, cost = fused_bnn_step_psgld(
        pack_fused(states.position), pack_fused(states.v),
        x_sel, y_sel, 1e-5, 0,
        alpha=sampler.alpha, lambda_reg=sampler.lambda_reg,
        scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, noise=pack_fused(eta), interpret=True,
    )
    got_pos = unpack_fused(theta2, 50)
    got_v = unpack_fused(v2, 50)
    for k in got_pos:
        np.testing.assert_allclose(
            np.asarray(ref.position[k]), np.asarray(got_pos[k]),
            rtol=0, atol=5e-3, err_msg="position " + k)
        np.testing.assert_allclose(
            np.asarray(ref.v[k]), np.asarray(got_v[k]),
            rtol=2e-2, atol=1e-6, err_msg="v " + k)
    assert np.isfinite(np.asarray(cost)).all()
    # padding never moves or accumulates
    assert np.all(np.asarray(theta2[0])[:, 51:64, :] == 0)
    assert np.all(np.asarray(theta2[0])[:, :64, 50:] == 0)
    assert np.all(np.asarray(v2[0])[:, 51:64, :] == 0)


@pytest.mark.slow
def test_wide_slot_pack_roundtrip_and_step():
    """H=100 routes to the 128-slot layout; pack round-trips and one
    fused SGHMC step matches the pytree step (same batch + noise)."""
    from pysgmcmc_tpu.models.architectures import dense_network
    from pysgmcmc_tpu.ops.fused_step import WIDE_BIAS_ROW, fused_slot
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler

    assert fused_slot(50) == (64, 50)
    assert fused_slot(100) == (128, WIDE_BIAS_ROW)
    with pytest.raises(ValueError, match="up to 114"):
        fused_slot(115)

    h, n = 100, 2
    init_fn, apply_fn = dense_network(1, units=(h, h, h))
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), n))
    packed = pack_fused(params)
    assert packed[0].shape == (n, 136, 128)
    assert packed[1].shape == (n, 128, 128)
    out = unpack_fused(packed, h)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(params[k]), np.asarray(out[k]), err_msg=k)

    x, y = _bnn_data()

    def cost(p, batch):
        xb, yb = batch
        net = apply_fn(p, xb)
        mse = jnp.square(yb - net[:, 0:1])
        f_log_var = net[:, 1:2]
        ll = jnp.sum(jnp.sum(
            -mse * 0.5 / (jnp.exp(f_log_var) + 1e-16) - 0.5 * f_log_var,
            axis=1)) / 20.0
        from pysgmcmc_tpu.models.bayesian_neural_network import (
            log_variance_prior_log_like,
        )
        ll += log_variance_prior_log_like(f_log_var) / 100.0
        return -ll

    sampler = SGHMCSampler(
        cost, stepsize_schedule=float(np.sqrt(1e-4)), burn_in_steps=20,
        scale_grad=100.0, gaussian_prior_scale=1e-5)
    states = jax.vmap(sampler.init)(
        params, jax.random.split(jax.random.PRNGKey(1), n))

    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=select, keep_every=20,
            collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(2), n))

    x_win, y_win = data_windows(x, y, 20)
    widx = jnp.asarray([4, 61], jnp.int32)
    x_sel, y_sel = gather_batch(x_win, y_win, widx)
    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(3), n), states.position)

    def ref_step(state, e, w):
        xb = jax.lax.dynamic_slice_in_dim(jnp.asarray(x), w, 20, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(y).reshape(-1), w, 20, axis=0).reshape(-1, 1)
        return sampler.step(
            state, jax.random.PRNGKey(0), (xb, yb), noise=e,
            phase="sampling")[0]

    ref = jax.vmap(ref_step)(states, eta, widx)

    theta2, v2, cost_out = fused_bnn_step(
        pack_fused(states.position), pack_fused(states.momentum),
        pack_fused(states.stats.minv), x_sel, y_sel,
        float(np.sqrt(1e-4)), 0,
        mdecay=sampler.mdecay, scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, noise=pack_fused(eta), interpret=True,
    )
    got_pos = unpack_fused(theta2, h)
    got_mom = unpack_fused(v2, h)
    for k in got_pos:
        np.testing.assert_allclose(
            np.asarray(ref.position[k]), np.asarray(got_pos[k]),
            rtol=0, atol=2e-4, err_msg="position " + k)
        np.testing.assert_allclose(
            np.asarray(ref.momentum[k]), np.asarray(got_mom[k]),
            rtol=0, atol=2e-4, err_msg="momentum " + k)
    assert np.isfinite(np.asarray(cost_out)).all()
    # padding never moves (bias row 114; rows 101..113 and 115+ dead)
    assert np.all(np.asarray(theta2[0])[:, 101:114, :] == 0)
    assert np.all(np.asarray(theta2[0])[:, :128, 100:] == 0)


@pytest.mark.slow
def test_fused_sgnht_step_matches_pytree_step():
    """One fused SGNHT step == vmapped SGNHTSampler.step (same batch/noise),
    including the per-chain thermostat update."""
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_step_sgnht
    from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler

    n = 4
    base, positions, _ = _workload(n)
    sampler = SGNHTSampler(
        base.cost_fn, stepsize_schedule=1e-3,
        scale_grad=base.scale_grad,
        gaussian_prior_scale=base.gaussian_prior_scale)
    x, y = _bnn_data()

    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))

    x_win, y_win = data_windows(x, y, 20)
    widx = jnp.asarray([0, 3, 80, 41], jnp.int32)
    x_sel, y_sel = gather_batch(x_win, y_win, widx)
    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)

    def ref_step(state, e, w):
        xb = jax.lax.dynamic_slice_in_dim(jnp.asarray(x), w, 20, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(y).reshape(-1), w, 20, axis=0).reshape(-1, 1)
        return sampler.step(
            state, jax.random.PRNGKey(0), (xb, yb), noise=e)[0]

    ref = jax.vmap(ref_step)(states, eta, widx)

    xi0 = jnp.broadcast_to(
        jnp.asarray(states.xi, jnp.float32)[:, None], (n, 128)
    ) + jnp.zeros((n, 128), jnp.float32)
    theta2, v2, xi2, cost = fused_bnn_step_sgnht(
        pack_fused(states.position), pack_fused(states.momentum),
        xi0, x_sel, y_sel, 1e-3, 0,
        a_diff=sampler.a_diff, scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, noise=pack_fused(eta), interpret=True,
    )
    got_pos = unpack_fused(theta2, 50)
    got_p = unpack_fused(v2, 50)
    for k in got_pos:
        np.testing.assert_allclose(
            np.asarray(ref.position[k]), np.asarray(got_pos[k]),
            rtol=0, atol=5e-3, err_msg="position " + k)
        np.testing.assert_allclose(
            np.asarray(ref.momentum[k]), np.asarray(got_p[k]),
            rtol=0, atol=5e-3, err_msg="momentum " + k)
    # thermostat: per-chain scalar, replicated across the lane row
    np.testing.assert_allclose(
        np.asarray(ref.xi), np.asarray(xi2)[:, 0], rtol=0, atol=1e-4)
    assert np.all(np.asarray(xi2) == np.asarray(xi2)[:, 0:1])
    assert np.isfinite(np.asarray(cost)).all()
    # padding never moves
    assert np.all(np.asarray(theta2[0])[:, 51:64, :] == 0)
    assert np.all(np.asarray(theta2[0])[:, :64, 50:] == 0)
    assert np.all(np.asarray(v2[0])[:, 51:64, :] == 0)


@pytest.mark.slow
def test_fused_rsghmc_step_matches_pytree_step():
    """One fused relativistic-SGHMC step == vmapped
    RelativisticSGHMCSampler.step (same batch/noise)."""
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_step_rsghmc
    from pysgmcmc_tpu.samplers.relativistic_sghmc import (
        RelativisticSGHMCSampler,
    )

    n = 4
    base, positions, _ = _workload(n)
    sampler = RelativisticSGHMCSampler(
        base.cost_fn, stepsize_schedule=1e-3,
        gaussian_prior_scale=base.gaussian_prior_scale)
    x, y = _bnn_data()

    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))

    x_win, y_win = data_windows(x, y, 20)
    widx = jnp.asarray([0, 3, 80, 41], jnp.int32)
    x_sel, y_sel = gather_batch(x_win, y_win, widx)
    eta = jax.vmap(normal_like_tree, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(2), n), states.position)

    def ref_step(state, e, w):
        xb = jax.lax.dynamic_slice_in_dim(jnp.asarray(x), w, 20, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(y).reshape(-1), w, 20, axis=0).reshape(-1, 1)
        return sampler.step(
            state, jax.random.PRNGKey(0), (xb, yb), noise=e)[0]

    ref = jax.vmap(ref_step)(states, eta, widx)

    theta2, v2, cost = fused_bnn_step_rsghmc(
        pack_fused(states.position), pack_fused(states.momentum),
        x_sel, y_sel, 1e-3, 0,
        mass=sampler.mass, speed_of_light=sampler.speed_of_light,
        d_coef=sampler.D, b_hat=sampler.Bhat,
        prior_scale=sampler.gaussian_prior_scale,
        batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, noise=pack_fused(eta), interpret=True,
    )
    got_pos = unpack_fused(theta2, 50)
    got_p = unpack_fused(v2, 50)
    for k in got_pos:
        np.testing.assert_allclose(
            np.asarray(ref.position[k]), np.asarray(got_pos[k]),
            rtol=0, atol=5e-3, err_msg="position " + k)
        np.testing.assert_allclose(
            np.asarray(ref.momentum[k]), np.asarray(got_p[k]),
            rtol=0, atol=5e-3, err_msg="momentum " + k)
    assert np.isfinite(np.asarray(cost)).all()
    # padding never moves
    assert np.all(np.asarray(theta2[0])[:, 51:64, :] == 0)
    assert np.all(np.asarray(theta2[0])[:, :64, 50:] == 0)
    assert np.all(np.asarray(v2[0])[:, 51:64, :] == 0)


@pytest.mark.slow
def test_fused_driver_sgnht_and_rsghmc():
    """sample_chain_fused runs the SGNHT and RSGHMC kinds end to end
    (interpret mode): bookkeeping, state threading (incl. the SGNHT
    thermostat in the scan carry), and mesh composition."""
    from pysgmcmc_tpu.parallel.mesh import chain_mesh
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused
    from pysgmcmc_tpu.samplers.relativistic_sghmc import (
        RelativisticSGHMCSampler,
    )
    from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler

    n = 4
    base, positions, _ = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)

    for sampler in (
        SGNHTSampler(
            base.cost_fn, stepsize_schedule=1e-3,
            scale_grad=base.scale_grad,
            gaussian_prior_scale=base.gaussian_prior_scale),
        RelativisticSGHMCSampler(
            base.cost_fn, stepsize_schedule=1e-3,
            gaussian_prior_scale=base.gaussian_prior_scale),
    ):
        states = jax.vmap(sampler.init)(
            positions, jax.random.split(jax.random.PRNGKey(0), n))
        out_states, pos, costs = sample_chain_fused(
            sampler, states, jax.random.PRNGKey(2), 3, x, y,
            batch_size=20, keep_every=2, block_chains=n,
            state_dtype=jnp.float32, interpret=True,
        )
        name = type(sampler).__name__
        assert costs.shape == (n, 3), name
        assert np.isfinite(np.asarray(costs)).all(), name
        assert pos["w2"].shape == (n, 3, 50, 50), name
        assert int(out_states.step[0]) == 6, name
        if isinstance(sampler, SGNHTSampler):
            xi = np.asarray(out_states.xi)
            assert xi.shape == (n,) and np.isfinite(xi).all()
            # the thermostat moved off its initial value
            assert np.any(xi != sampler.a_diff)
        # mesh composition: same call sharded over 2 virtual devices
        _, _, costs_mesh = sample_chain_fused(
            sampler, states, jax.random.PRNGKey(2), 3, x, y,
            batch_size=20, keep_every=2, block_chains=2,
            state_dtype=jnp.float32, interpret=True, mesh=chain_mesh(2),
        )
        assert np.isfinite(np.asarray(costs_mesh)).all(), name


@pytest.mark.slow
def test_wide_slot_multistep():
    """H=100 (128-slot layout) through the multi-step VMEM-resident
    kernels: SGHMC via the raw entry point (padding rows must stay dead)
    and SGNHT/pSGLD through the driver (valid-mask family)."""
    from pysgmcmc_tpu.models.architectures import dense_network
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        log_variance_prior_log_like,
    )
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_multistep
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
    from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler

    h, n = 100, 2
    x, y = _bnn_data()
    init_fn, apply_fn = dense_network(1, units=(h, h, h))
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), n))

    def cost(p, batch):
        xb, yb = batch
        net = apply_fn(p, xb)
        mse = jnp.square(yb - net[:, 0:1])
        flv = net[:, 1:2]
        ll = jnp.sum(jnp.sum(
            -mse * 0.5 / (jnp.exp(flv) + 1e-16) - 0.5 * flv,
            axis=1)) / 20.0
        ll += log_variance_prior_log_like(flv) / 100.0
        return -ll

    # raw SGHMC entry point: k=3 steps, padding rows must stay dead
    theta = pack_fused(params)
    assert theta[0].shape == (n, 136, 128)
    v = tuple(jnp.zeros_like(t) for t in theta)
    minv = tuple((jnp.abs(t) > 0).astype(jnp.float32) for t in theta)
    x_win, y_win = data_windows(x, y, 20)
    theta2, v2, cost_out = fused_bnn_multistep(
        theta, v, minv, x_win, y_win, 1e-3, 7,
        scale_grad=100.0, batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, k_steps=3, interpret=True)
    assert np.isfinite(np.asarray(cost_out)).all()
    moved = np.asarray(theta2[0]) - np.asarray(theta[0])
    assert np.any(moved[:, 0:100, 0:100] != 0)
    # dead zone: rows 101..113 (between hidden rows and vec rows' w1/b1
    # content) and lanes >= 100 of the hidden block never move
    assert np.all(np.asarray(theta2[0])[:, 101:114, :] == 0)
    assert np.all(np.asarray(theta2[0])[:, 0:100, 100:] == 0)

    # driver: SGNHT + pSGLD (valid-mask family) on the wide layout
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    for smp in (
        SGNHTSampler(cost, stepsize_schedule=1e-3,
                     gaussian_prior_scale=1e-5),
        PSGLDSampler(cost, stepsize_schedule=1e-4, scale_grad=100.0,
                     gaussian_prior_scale=1e-5),
        SGHMCSampler(cost, stepsize_schedule=1e-2, burn_in_steps=10,
                     scale_grad=100.0, gaussian_prior_scale=1e-5),
    ):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            st = smp.init(p, k1)
            st, _ = sample_chain(smp, st, k2, 1, batch_fn=select,
                                 keep_every=12, collect_costs=False)
            return st
        states = jax.vmap(one)(
            params, jax.random.split(jax.random.PRNGKey(1), n))
        out_states, pos, costs = sample_chain_fused(
            smp, states, jax.random.PRNGKey(2), 2, jnp.asarray(x),
            jnp.asarray(y), batch_size=20, keep_every=2, block_chains=n,
            state_dtype=jnp.float32, multistep=True, interpret=True)
        name = type(smp).__name__
        assert np.isfinite(np.asarray(costs)).all(), name
        assert pos["w2"].shape == (n, 2, h, h), name


@pytest.mark.slow
def test_multi_input_multistep():
    """n_inputs=3 through the multi-step kernels: the drivers transpose
    the window tables feature-major and the kernel gathers each feature
    with one dot; dead padding rows stay zero on the raw entry point."""
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
    from pysgmcmc_tpu.models.architectures import dense_network
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        log_variance_prior_log_like,
    )
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_multistep
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler

    k, h, n = 3, 50, 2
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, k)).astype(np.float32)
    y = np.sin(x.sum(axis=1, keepdims=True)).astype(np.float32)
    init_fn, apply_fn = dense_network(k, units=(h, h, h))
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), n))

    # raw entry point: vec rows shift by n_inputs; cost row stays dead
    theta = pack_fused(params)
    v = tuple(jnp.zeros_like(t) for t in theta)
    minv = tuple((jnp.abs(t) > 0).astype(jnp.float32) for t in theta)
    x_win, y_win = data_windows(x, y, 20)
    assert x_win.shape == (81, B_PAD, k)
    theta2, v2, cost_out = fused_bnn_multistep(
        theta, v, minv, x_win, y_win, 1e-3, 7,
        scale_grad=100.0, batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, k_steps=3, interpret=True)
    assert np.isfinite(np.asarray(cost_out)).all()
    moved = np.asarray(theta2[0]) - np.asarray(theta[0])
    assert np.any(moved[:, 64:64 + k + 1, 0:h] != 0)  # w1/b1 rows moved
    # rows between scal (64+k+2) and the cost row stay dead
    assert np.all(np.asarray(theta2[0])[:, 64 + k + 3:71, :] == 0)

    def cost(p, batch):
        xb, yb = batch
        net = apply_fn(p, xb)
        mse = jnp.square(yb - net[:, 0:1])
        flv = net[:, 1:2]
        ll = jnp.sum(jnp.sum(
            -mse * 0.5 / (jnp.exp(flv) + 1e-16) - 0.5 * flv,
            axis=1)) / 20.0
        ll += log_variance_prior_log_like(flv) / 100.0
        return -ll

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    for smp in (
        SGHMCSampler(cost, stepsize_schedule=1e-2, burn_in_steps=10,
                     scale_grad=100.0, gaussian_prior_scale=1e-5),
        PSGLDSampler(cost, stepsize_schedule=1e-4, scale_grad=100.0,
                     gaussian_prior_scale=1e-5),
    ):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            st = smp.init(p, k1)
            st, _ = sample_chain(smp, st, k2, 1, batch_fn=select,
                                 keep_every=12, collect_costs=False)
            return st
        states = jax.vmap(one)(
            params, jax.random.split(jax.random.PRNGKey(1), n))
        out_states, pos, costs = sample_chain_fused(
            smp, states, jax.random.PRNGKey(2), 2, jnp.asarray(x),
            jnp.asarray(y), batch_size=20, keep_every=2, block_chains=n,
            state_dtype=jnp.float32, multistep=True, interpret=True)
        name = type(smp).__name__
        assert np.isfinite(np.asarray(costs)).all(), name
        assert pos["w1"].shape == (n, 2, k, h), name


@pytest.mark.slow
def test_multistep_burnin_matches_pytree():
    """k fused burn-in steps == k pytree burn-in steps (interpret mode).

    Interpret mode's in-kernel PRNG returns zero bits, so the noise is
    exactly zero and the window draw always picks window 0 — making the
    whole k-step adaptive phase deterministic and directly comparable to
    the pytree sampler iterated on batch ``x[0:20]`` with injected zero
    noise.  Pins theta, momentum AND the tau/g/v_hat/minv adaptation
    statistics of ops/fused_step.fused_bnn_multistep_burnin against
    samplers/sghmc.py's burn-in step (reference semantics
    /root/reference/pysgmcmc/samplers/sghmc.py:126-196)."""
    from bench import build_workload
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_multistep_burnin

    n, k_steps = 4, 3
    sampler, positions, _ = build_workload(n_chains=n, network="dense")
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)

    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))

    # pytree reference: k burn-in steps on window 0 with zero noise
    xb = jnp.asarray(x[0:20])
    yb = jnp.asarray(y[0:20]).reshape(-1, 1)

    def ref_steps(state):
        zero = jax.tree_util.tree_map(jnp.zeros_like, state.position)
        for _ in range(k_steps):
            state = sampler.step(
                state, jax.random.PRNGKey(0), (xb, yb), noise=zero,
                phase="burn_in")[0]
        return state

    ref = jax.vmap(ref_steps)(states)

    theta = pack_fused(states.position)
    v = pack_fused(states.momentum)
    tau = pack_fused(states.stats.tau)
    g = pack_fused(states.stats.g)
    v_hat = pack_fused(states.stats.v_hat)
    x_win, y_win = data_windows(x, y, 20)
    theta2, v2, tau2, g2, vh2, minv2, cost = fused_bnn_multistep_burnin(
        theta, v, tau, g, v_hat, x_win, y_win,
        float(np.sqrt(1e-4)), 0,
        mdecay=sampler.mdecay, scale_grad=sampler.scale_grad,
        prior_scale=sampler.gaussian_prior_scale,
        batch_size=20, n_data=100, block_chains=n,
        state_dtype=jnp.float32, k_steps=k_steps, interpret=True,
    )
    assert np.isfinite(np.asarray(cost)).all()

    got = {
        "position": unpack_fused(theta2, 50),
        "momentum": unpack_fused(v2, 50),
        "tau": unpack_fused(tau2, 50),
        "g": unpack_fused(g2, 50),
        "v_hat": unpack_fused(vh2, 50),
        "minv": unpack_fused(minv2, 50),
    }
    want = {
        "position": ref.position,
        "momentum": ref.momentum,
        "tau": ref.stats.tau,
        "g": ref.stats.g,
        "v_hat": ref.stats.v_hat,
        "minv": ref.stats.minv,
    }
    # Tolerances: the in-kernel forward/backward runs bf16 matmuls whose
    # few-percent gradient deltas (amplified by exp(log_var) in the
    # heteroscedastic likelihood) feed the g/v_hat EMAs directly — the
    # EMA *math* itself is pinned exactly by
    # test_burnin_step_math_matches_pytree; this end-to-end check guards
    # the structural path (row mapping, output aliasing, the in-kernel
    # k-step loop and window select).  Bounds are ~2x the measured k=3
    # interpret-mode deltas.
    tols = {
        "position": dict(rtol=0.0, atol=1.5e-3),
        "momentum": dict(rtol=0.0, atol=1.5e-3),
        "tau": dict(rtol=1e-1, atol=1e-3),
        "g": dict(rtol=0.5, atol=7.0),
        "v_hat": dict(rtol=0.5, atol=7e3),
        "minv": dict(rtol=1.5e-1, atol=1e-4),
    }
    for name in want:
        for key in want[name]:
            np.testing.assert_allclose(
                np.asarray(want[name][key]), np.asarray(got[name][key]),
                err_msg=name + " " + key, **tols[name])


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sghmc", "sgld"])
def test_burnin_chain_fused_driver(kind):
    """The multi-step burn-in driver adapts the EMAs and hands off to the
    fused sampling phase (frozen minv) with correct step bookkeeping."""
    from bench import build_workload
    from pysgmcmc_tpu.parallel.packed import (
        burnin_chain_fused,
        sample_chain_fused,
    )
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler

    n = 4
    sampler, positions, _ = build_workload(n_chains=n, network="dense")
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    if kind == "sgld":
        sampler = SGLDSampler(
            sampler.cost_fn, stepsize_schedule=1e-5, burn_in_steps=10,
            scale_grad=sampler.scale_grad,
            gaussian_prior_scale=sampler.gaussian_prior_scale)

    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    out = burnin_chain_fused(
        sampler, states, jax.random.PRNGKey(1), 10, x, y,
        batch_size=20, block_chains=n, state_dtype=jnp.float32,
        interpret=True)
    assert int(np.asarray(out.step)[0]) == 10
    tau = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out.stats.tau)])
    assert (tau > 1.0).all()
    minv = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out.stats.minv)])
    assert np.isfinite(minv).all() and (minv > 0).all()

    # handoff: the sampling phase freezes the adapted minv
    out2, pos, costs = sample_chain_fused(
        sampler, out, jax.random.PRNGKey(2), 2, x, y,
        batch_size=20, keep_every=2, block_chains=n,
        state_dtype=jnp.float32, multistep=True, interpret=True)
    assert np.isfinite(np.asarray(costs)).all()
    assert int(np.asarray(out2.step)[0]) == 14
    for leaf in jax.tree_util.tree_leaves(out2.position):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("kind", ["sghmc", "sgld"])
def test_burnin_step_math_matches_pytree(kind):
    """The kernels' burn-in math == the pytree sampler, exactly.

    ops/fused_step._sghmc_burnin_step_math / _sgld_burnin_step_math are
    the literal code the multi-step burn-in kernels execute per step;
    calling them with a controlled gradient and noise against
    sampler.step (linear cost => exact injected gradient, random
    adaptation stats) pins the Springenberg et al. EMA ordering
    (reference /root/reference/pysgmcmc/samplers/sghmc.py:126-196)
    without any bf16 forward-pass slack."""
    from pysgmcmc_tpu.ops.fused_step import (
        _sghmc_burnin_step_math,
        _sgld_burnin_step_math,
    )
    from pysgmcmc_tpu.samplers._adaptive import AdaptiveStats
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler

    rng = np.random.RandomState(3)
    shape = (6, 7)
    gc = jnp.asarray(rng.standard_normal(shape) * 5.0, jnp.float32)

    def cost(p, batch):
        return jnp.sum(gc * p["x"])

    eps, scale_grad = 0.05, 10.0
    if kind == "sghmc":
        sampler = SGHMCSampler(
            cost, stepsize_schedule=eps, burn_in_steps=100,
            scale_grad=scale_grad)
    else:
        sampler = SGLDSampler(
            cost, stepsize_schedule=eps, burn_in_steps=100,
            scale_grad=scale_grad, A=1.3)

    pos = {"x": jnp.asarray(rng.standard_normal(shape), jnp.float32)}
    state = sampler.init(pos, jax.random.PRNGKey(0))
    stats = AdaptiveStats(
        tau={"x": jnp.asarray(rng.uniform(1.0, 9.0, shape), jnp.float32)},
        g={"x": jnp.asarray(rng.standard_normal(shape), jnp.float32)},
        v_hat={"x": jnp.asarray(
            rng.uniform(0.1, 4.0, shape), jnp.float32)},
        minv={"x": jnp.ones(shape, jnp.float32)},
    )
    state = state._replace(stats=stats)
    eta = {"x": jnp.asarray(rng.standard_normal(shape), jnp.float32)}

    ref = sampler.step(
        state, jax.random.PRNGKey(1), jnp.zeros(()), noise=eta,
        phase="burn_in")[0]

    valid = jnp.ones(shape, jnp.float32)
    if kind == "sghmc":
        t2, v2, tau2, g2, vh2, minv2 = _sghmc_burnin_step_math(
            state.position["x"], state.momentum["x"],
            stats.tau["x"], stats.g["x"], stats.v_hat["x"],
            gc, valid, eta["x"], eps,
            eps / np.sqrt(scale_grad), sampler.mdecay, 0.0)
        got = {"position": t2, "momentum": v2, "tau": tau2, "g": g2,
               "v_hat": vh2, "minv": minv2}
        want = {"position": ref.position["x"],
                "momentum": ref.momentum["x"],
                "tau": ref.stats.tau["x"], "g": ref.stats.g["x"],
                "v_hat": ref.stats.v_hat["x"],
                "minv": ref.stats.minv["x"]}
    else:
        small = 1e-16
        sg_safe = scale_grad + 2.0 * np.sign(scale_grad) * small + small
        t2, tau2, g2, vh2, minv2 = _sgld_burnin_step_math(
            state.position["x"], stats.tau["x"], stats.g["x"],
            stats.v_hat["x"], gc, valid, eta["x"], eps,
            sampler.A, sg_safe, 0.0)
        got = {"position": t2, "tau": tau2, "g": g2, "v_hat": vh2,
               "minv": minv2}
        want = {"position": ref.position["x"],
                "tau": ref.stats.tau["x"], "g": ref.stats.g["x"],
                "v_hat": ref.stats.v_hat["x"],
                "minv": ref.stats.minv["x"]}
    for name in want:
        np.testing.assert_allclose(
            np.asarray(want[name]), np.asarray(got[name]),
            rtol=1e-6, atol=1e-7, err_msg=kind + " " + name)


@pytest.mark.slow
def test_burnin_chain_fused_wide_slot():
    """H=100 (128-slot layout) through the multi-step burn-in driver:
    the adaptive phase adapts and hands off to wide-slot sampling."""
    from pysgmcmc_tpu.models.architectures import dense_network
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        log_variance_prior_log_like,
    )
    from pysgmcmc_tpu.parallel.packed import (
        burnin_chain_fused,
        sample_chain_fused,
    )
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler

    h, n = 100, 2
    x, y = _bnn_data()
    init_fn, apply_fn = dense_network(1, units=(h, h, h))
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), n))

    def cost(p, batch):
        xb, yb = batch
        net = apply_fn(p, xb)
        mse = jnp.square(yb - net[:, 0:1])
        flv = net[:, 1:2]
        ll = jnp.sum(jnp.sum(
            -mse * 0.5 / (jnp.exp(flv) + 1e-16) - 0.5 * flv,
            axis=1)) / 20.0
        ll += log_variance_prior_log_like(flv) / 100.0
        return -ll

    sampler = SGHMCSampler(cost, stepsize_schedule=1e-2, burn_in_steps=10,
                           scale_grad=100.0, gaussian_prior_scale=1e-5)
    states = jax.vmap(sampler.init)(
        params, jax.random.split(jax.random.PRNGKey(1), n))
    out = burnin_chain_fused(
        sampler, states, jax.random.PRNGKey(2), 5, x, y,
        batch_size=20, block_chains=n, state_dtype=jnp.float32,
        interpret=True)
    assert int(np.asarray(out.step)[0]) == 5
    assert out.position["w2"].shape == (n, h, h)
    tau = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out.stats.tau)])
    assert np.isfinite(tau).all() and (tau >= 1.0).all()
    assert tau.mean() > 1.1
    out2, pos, costs = sample_chain_fused(
        sampler, out, jax.random.PRNGKey(3), 1, x, y,
        batch_size=20, keep_every=2, block_chains=n,
        state_dtype=jnp.float32, multistep=True, interpret=True)
    assert np.isfinite(np.asarray(costs)).all()
    assert pos["w2"].shape == (n, 1, h, h)


@pytest.mark.slow
@pytest.mark.parametrize(
    "kind", ["sghmc", "sgld", "psgld", "sgnht", "rsghmc"])
def test_multistep_sampling_matches_pytree(kind):
    """k multi-step-kernel sampling steps == k pytree steps, per sampler.

    Interpret mode's in-kernel PRNG returns zero bits (zero noise,
    window 0 every step), so the k-step sampling launch is deterministic
    and directly comparable to the pytree sampler iterated on batch
    ``x[0:20]`` with injected zero noise — pinning the whole family's
    multi-step kernels (ops/fused_step.fused_bnn_multistep*) against
    samplers/{sghmc,sgld,psgld,sgnht,relativistic_sghmc}.py, not just
    finiteness.  Tolerances absorb the bf16 forward-pass deltas (the
    update math itself is exact; see the burn-in math test)."""
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler
    from pysgmcmc_tpu.samplers.relativistic_sghmc import (
        RelativisticSGHMCSampler,
    )
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler
    from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler

    n, k_steps = 2, 3
    base, positions, _ = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    prior = base.gaussian_prior_scale

    if kind == "sghmc":
        sampler = base
    elif kind == "sgld":
        sampler = SGLDSampler(
            base.cost_fn, stepsize_schedule=1e-5, burn_in_steps=50,
            scale_grad=100.0, gaussian_prior_scale=prior)
    elif kind == "psgld":
        sampler = PSGLDSampler(
            base.cost_fn, stepsize_schedule=1e-4, scale_grad=100.0,
            gaussian_prior_scale=prior)
    elif kind == "sgnht":
        sampler = SGNHTSampler(
            base.cost_fn, stepsize_schedule=1e-3, scale_grad=100.0,
            gaussian_prior_scale=prior)
    else:
        sampler = RelativisticSGHMCSampler(
            base.cost_fn, stepsize_schedule=1e-3,
            gaussian_prior_scale=prior)

    # warm the state on the pytree path (adapts + freezes minv for the
    # burn-in family; spins the accumulator/thermostat for the rest)
    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)
    warm = getattr(sampler, "burn_in_steps", 0) or 10

    def one(p, ck):
        k1, k2 = jax.random.split(ck)
        st = sampler.init(p, k1)
        st, _ = sample_chain(
            sampler, st, k2, 1, batch_fn=select, keep_every=warm,
            collect_costs=False)
        return st

    states = jax.vmap(one)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    # pytree reference: k sampling steps on window 0 with zero noise
    xb = jnp.asarray(x[0:20])
    yb = jnp.asarray(y[0:20]).reshape(-1, 1)

    def ref_steps(state):
        zero = jax.tree_util.tree_map(jnp.zeros_like, state.position)
        for _ in range(k_steps):
            state = sampler.step(
                state, jax.random.PRNGKey(0), (xb, yb), noise=zero,
                phase="sampling")[0]
        return state

    ref = jax.vmap(ref_steps)(states)

    # Pin noise_impl: this A/B's premise is "interpret-mode zero bits =>
    # zero noise", true for Box-Muller but not the CLT generator (whose
    # zero-bit output is -sqrt(12n)/2 on lane 0 — see
    # test_normal_clt_zero_bit_value), and "auto" resolves to the CLT.
    out, pos, costs = sample_chain_fused(
        sampler, states, jax.random.PRNGKey(2), 1, x, y,
        batch_size=20, keep_every=k_steps, block_chains=n,
        state_dtype=jnp.float32, multistep=True,
        noise_impl="box_muller", interpret=True)

    assert np.isfinite(np.asarray(costs)).all()
    for key in ref.position:
        np.testing.assert_allclose(
            np.asarray(ref.position[key]),
            np.asarray(out.position[key]),
            rtol=0, atol=2e-3, err_msg=kind + " position " + key)
        np.testing.assert_allclose(
            np.asarray(out.position[key]),
            np.asarray(pos[key][:, 0]),
            rtol=0, atol=0, err_msg=kind + " collected sample " + key)
    if hasattr(ref, "momentum"):
        for key in ref.momentum:
            np.testing.assert_allclose(
                np.asarray(ref.momentum[key]),
                np.asarray(out.momentum[key]),
                # SGNHT/RSGHMC momenta integrate the raw gradient at
                # eps (not eps^2), so the bf16 forward deltas show up
                # at ~0.3% relative — hence the rtol term
                rtol=1e-2, atol=2e-3, err_msg=kind + " momentum " + key)


@pytest.mark.slow
def test_multistep_single_window_selects_the_data():
    """batch_size == dataset size => ONE window, and the kernel's
    in-kernel gather MUST select it.

    The reference degrades batch_size to the dataset size when data is
    scarce (``/root/reference/pysgmcmc/data_batches.py:107-116``); here
    that corner pins the window-selection one-hot itself: with
    n_windows == 1 any mis-addressed gather (e.g. an off-by-one window
    index) reads PAST the table and returns an all-zero batch, which the
    pytree comparison catches at O(1) — unlike a one-point window shift,
    which tolerances could absorb."""
    from bench import build_workload
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused

    n, k_steps = 2, 2
    # n_data == batch_size: the whole (tiny) dataset is the one window
    sampler, positions, _, (x, y) = build_workload(
        n_chains=n, network="dense", n_data=20, batch_size=20,
        return_data=True)
    sampler.burn_in_steps = 50
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)

    def one(p, ck):
        k1, k2 = jax.random.split(ck)
        st = sampler.init(p, k1)
        st, _ = sample_chain(
            sampler, st, k2, 1, batch_fn=select,
            keep_every=sampler.burn_in_steps, collect_costs=False)
        return st

    states = jax.vmap(one)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    xb = jnp.asarray(x)
    yb = jnp.asarray(y).reshape(-1, 1)

    def ref_steps(state):
        zero = jax.tree_util.tree_map(jnp.zeros_like, state.position)
        cost = None
        for _ in range(k_steps):
            state, info = sampler.step(
                state, jax.random.PRNGKey(0), (xb, yb), noise=zero,
                phase="sampling")
            cost = info.cost
        return state, cost

    ref, ref_cost = jax.vmap(ref_steps)(states)
    # box_muller: the zero-noise interpret-mode premise (see
    # test_multistep_sampling_matches_pytree) does not hold for the CLT
    # generator that "auto" resolves to
    out, _, costs = sample_chain_fused(
        sampler, states, jax.random.PRNGKey(2), 1, x, y,
        batch_size=20, keep_every=k_steps, block_chains=n,
        state_dtype=jnp.float32, multistep=True,
        noise_impl="box_muller", interpret=True)

    # the final-step cost is evaluated on the REAL batch: a mis-gathered
    # (zeroed) batch moves it at O(1), far outside the bf16 slack
    np.testing.assert_allclose(
        np.asarray(costs).reshape(-1), np.asarray(ref_cost).reshape(-1),
        rtol=5e-2, atol=5e-2)
    for key in ref.position:
        np.testing.assert_allclose(
            np.asarray(ref.position[key]),
            np.asarray(out.position[key]),
            rtol=0, atol=2e-3, err_msg="position " + key)


@pytest.mark.slow
def test_multistep_cyclical_schedule_matches_pytree():
    """A STEP-VARYING schedule through multistep == the per-step path.

    Round 3's multi-step drivers evaluated the schedule once per k-step
    segment, silently quantizing cyclical/polynomial schedules; the
    drivers now ship a per-step eps vector into the kernel's SMEM scalar
    table (ops/fused_step._per_step_table).  Pin it: k kernel steps
    under a cyclical schedule must match k pytree steps that re-evaluate
    the schedule every step — if the kernel ever reuses one eps for the
    whole segment again, the trajectories diverge at O(delta-eps)."""
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
    from pysgmcmc_tpu.stepsize_schedules import CyclicalStepsizeSchedule

    n, k_steps = 2, 4
    base, positions, _ = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)

    # a short cycle so eps genuinely varies WITHIN the k-step segment
    schedule = CyclicalStepsizeSchedule(0.05, cycle_length=6)
    sampler = SGHMCSampler(
        base.cost_fn, stepsize_schedule=schedule, burn_in_steps=50,
        scale_grad=100.0,
        gaussian_prior_scale=base.gaussian_prior_scale)

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)

    def one(p, ck):
        k1, k2 = jax.random.split(ck)
        st = sampler.init(p, k1)
        st, _ = sample_chain(
            sampler, st, k2, 1, batch_fn=select,
            keep_every=sampler.burn_in_steps, collect_costs=False)
        return st

    states = jax.vmap(one)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    xb = jnp.asarray(x[0:20])
    yb = jnp.asarray(y[0:20]).reshape(-1, 1)

    def ref_steps(state):
        zero = jax.tree_util.tree_map(jnp.zeros_like, state.position)
        for _ in range(k_steps):
            # the pytree step re-evaluates the schedule at state.step
            state = sampler.step(
                state, jax.random.PRNGKey(0), (xb, yb), noise=zero,
                phase="sampling")[0]
        return state

    ref = jax.vmap(ref_steps)(states)
    # box_muller: zero-bit PRNG => zero noise holds only for this
    # generator (not the "auto"-default CLT)
    out, _, costs = sample_chain_fused(
        sampler, states, jax.random.PRNGKey(2), 1, x, y,
        batch_size=20, keep_every=k_steps, block_chains=n,
        state_dtype=jnp.float32, multistep=True,
        noise_impl="box_muller", interpret=True)

    assert np.isfinite(np.asarray(costs)).all()
    # sanity: the schedule really varies inside the segment
    step0 = int(np.asarray(states.step)[0])
    eps_seq = [float(schedule.value(None, step0 + t))
               for t in range(k_steps)]
    assert max(eps_seq) > min(eps_seq) * 1.5
    for key in ref.position:
        np.testing.assert_allclose(
            np.asarray(ref.position[key]),
            np.asarray(out.position[key]),
            rtol=0, atol=2e-3, err_msg="position " + key)


@pytest.mark.slow
@pytest.mark.parametrize(
    "kind", ["sghmc", "sgld", "sgnht", "psgld", "rsghmc"])
def test_multistep_paired_matches_unpaired(kind):
    """pair_dots=True == pair_dots=False through the multi-step driver.

    Interpret mode's in-kernel PRNG returns zero bits (zero noise,
    window 0 every step), so the only difference between the paired and
    the standard multi-step kernel is the dot formulation: block-diagonal
    (Cp, 2s, 2s) operands whose off-diagonal blocks are exact zeros.
    Adding exact zeros is exact in floating point, so positions, momenta
    and costs must agree bitwise — including that the off-diagonal
    blocks never leak into the unpacked state (the paired minv freeze).
    """
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler
    from pysgmcmc_tpu.samplers.relativistic_sghmc import (
        RelativisticSGHMCSampler,
    )
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler
    from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler

    n, k_steps = 4, 3
    sampler, positions, _ = _workload(n)
    if kind == "sgld":
        sampler = SGLDSampler(
            sampler.cost_fn, stepsize_schedule=1e-5, burn_in_steps=50,
            scale_grad=100.0,
            gaussian_prior_scale=sampler.gaussian_prior_scale)
    elif kind == "sgnht":
        sampler = SGNHTSampler(
            sampler.cost_fn, stepsize_schedule=1e-3, scale_grad=100.0,
            gaussian_prior_scale=sampler.gaussian_prior_scale)
    elif kind == "psgld":
        sampler = PSGLDSampler(
            sampler.cost_fn, stepsize_schedule=1e-4, scale_grad=100.0,
            gaussian_prior_scale=sampler.gaussian_prior_scale)
    elif kind == "rsghmc":
        sampler = RelativisticSGHMCSampler(
            sampler.cost_fn, stepsize_schedule=1e-3,
            gaussian_prior_scale=sampler.gaussian_prior_scale)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)

    # warm past burn-in on the pytree path so minv is frozen
    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)

    def one(p, ck):
        k1, k2 = jax.random.split(ck)
        st = sampler.init(p, k1)
        st, _ = sample_chain(
            sampler, st, k2, 1, batch_fn=select,
            keep_every=getattr(sampler, "burn_in_steps", 0) or 10,
            collect_costs=False)
        return st

    states = jax.vmap(one)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    runs = {}
    for paired in (False, True):
        # Pin noise_impl on BOTH sides: pairing is a dot-formulation A/B,
        # and "auto" resolves asymmetrically (box_muller when paired,
        # hadamard_clt when unpaired). The CLT generator also violates
        # this test's premise — its zero-bit output is -sqrt(12n)/2 on
        # lane 0, not zero (see test_normal_clt_zero_bit_value).
        out, pos, costs = sample_chain_fused(
            sampler, states, jax.random.PRNGKey(2), 2, x, y,
            batch_size=20, keep_every=k_steps, block_chains=n,
            state_dtype=jnp.float32, multistep=True, pair_dots=paired,
            noise_impl="box_muller", interpret=True)
        runs[paired] = (out, pos, costs)

    out_u, pos_u, costs_u = runs[False]
    out_p, pos_p, costs_p = runs[True]
    assert np.isfinite(np.asarray(costs_p)).all()
    np.testing.assert_array_equal(
        np.asarray(costs_u), np.asarray(costs_p), err_msg="costs")
    for key in out_u.position:
        np.testing.assert_array_equal(
            np.asarray(out_u.position[key]),
            np.asarray(out_p.position[key]), err_msg="position " + key)
        if hasattr(out_u, "momentum"):
            np.testing.assert_array_equal(
                np.asarray(out_u.momentum[key]),
                np.asarray(out_p.momentum[key]),
                err_msg="momentum " + key)
        np.testing.assert_array_equal(
            np.asarray(pos_u[key]), np.asarray(pos_p[key]),
            err_msg="collected " + key)


def test_multistep_paired_guards():
    """pair_dots validates its configuration loudly."""
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused

    n = 2
    sampler, positions, _ = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    states = jax.vmap(
        lambda p, k: sampler.init(p, k))(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    with pytest.raises(ValueError, match="multistep"):
        sample_chain_fused(
            sampler, states, jax.random.PRNGKey(2), 1, x, y,
            batch_size=20, block_chains=n, pair_dots=True,
            interpret=True)


    from pysgmcmc_tpu.ops.fused_step import fused_bnn_multistep, pack_fused

    theta = pack_fused(states.position)
    v = jax.tree_util.tree_map(jnp.zeros_like, theta)
    minv = jax.tree_util.tree_map(jnp.ones_like, theta)
    x_win = jnp.zeros((81, 24), jnp.float32)
    y_win = jnp.zeros((81, 24), jnp.float32)
    with pytest.raises(ValueError, match="even"):
        fused_bnn_multistep(
            theta, v, minv, x_win, y_win, 1e-3, 0,
            block_chains=1, k_steps=2, pair_dots=True, interpret=True)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sghmc", "sgld"])
def test_multistep_burnin_paired_matches_unpaired(kind):
    """Paired-dot burn-in == standard burn-in through the driver.

    Same bitwise argument as the sampling-phase parity test: interpret
    mode draws zero noise and window 0, so the paired burn-in kernel's
    only delta is the block-diagonal dot formulation with exact-zero
    off-diagonal blocks.  theta, momentum, every adaptation statistic
    (tau/g/v_hat) and the frozen mass-matrix inverse must agree bitwise.
    """
    from pysgmcmc_tpu.parallel.packed import burnin_chain_fused
    from pysgmcmc_tpu.samplers.sgld import SGLDSampler

    n = 4
    sampler, positions, _ = _workload(n)
    if kind == "sgld":
        sampler = SGLDSampler(
            sampler.cost_fn, stepsize_schedule=1e-5, burn_in_steps=50,
            scale_grad=100.0,
            gaussian_prior_scale=sampler.gaussian_prior_scale)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    runs = {}
    for paired in (False, True):
        # pin noise_impl on BOTH sides: pairing is a dot-formulation
        # A/B, and "auto" resolves asymmetrically (box_muller when
        # paired, hadamard_clt when unpaired)
        runs[paired] = burnin_chain_fused(
            sampler, states, jax.random.PRNGKey(2), 3, x, y,
            batch_size=20, block_chains=n, state_dtype=jnp.float32,
            pair_dots=paired, noise_impl="box_muller", interpret=True)

    out_u, out_p = runs[False], runs[True]
    for key in out_u.position:
        np.testing.assert_array_equal(
            np.asarray(out_u.position[key]),
            np.asarray(out_p.position[key]), err_msg="position " + key)
        for stat in ("tau", "g", "v_hat", "minv"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_u.stats, stat)[key]),
                np.asarray(getattr(out_p.stats, stat)[key]),
                err_msg=stat + " " + key)
        if hasattr(out_u, "momentum"):
            np.testing.assert_array_equal(
                np.asarray(out_u.momentum[key]),
                np.asarray(out_p.momentum[key]),
                err_msg="momentum " + key)
    tau = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(out_p.stats.tau)])
    assert np.isfinite(tau).all() and (tau >= 1.0).all()


def test_multi_input_paired_matches_unpaired():
    """n_inputs=3 paired == unpaired (bitwise, interpret mode): the
    paired layer-1 block-diagonal operand widens to 2*(n_inputs+1)
    lanes and the w1 gradient unpair follows; everything else is the
    1-input paired path."""
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_multistep

    k, h, n = 3, 50, 2
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, k)).astype(np.float32)
    y = np.sin(x.sum(axis=1, keepdims=True)).astype(np.float32)
    from pysgmcmc_tpu.models.architectures import dense_network

    init_fn, _ = dense_network(k, units=(h, h, h))
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), n))
    theta = pack_fused(params)
    v = tuple(jnp.zeros_like(t) for t in theta)
    minv = tuple((jnp.abs(t) > 0).astype(jnp.float32) for t in theta)
    x_win, y_win = data_windows(x, y, 20)

    outs = {}
    for paired in (False, True):
        outs[paired] = fused_bnn_multistep(
            theta, v, minv, x_win, y_win, 1e-3, 7,
            scale_grad=100.0, batch_size=20, n_data=100, block_chains=n,
            state_dtype=jnp.float32, k_steps=3, pair_dots=paired,
            interpret=True)
    (t_u, v_u, c_u), (t_p, v_p, c_p) = outs[False], outs[True]
    np.testing.assert_array_equal(np.asarray(c_u), np.asarray(c_p))
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(t_u[i]), np.asarray(t_p[i]), err_msg="theta %d" % i)
        np.testing.assert_array_equal(
            np.asarray(v_u[i]), np.asarray(v_p[i]), err_msg="v %d" % i)


@pytest.mark.slow
def test_per_step_paired_matches_unpaired():
    """fused_bnn_step(pair_dots=True) == pair_dots=False, bitwise.

    The round-2 PER-STEP paired kernel (measured negative on chip,
    kept flag-gated; docs/performance.md) must stay correct: in
    interpret mode the in-kernel PRNG returns zero bits, so the only
    difference is the block-diagonal dot formulation whose off-diagonal
    blocks are exact zeros.
    """
    n = 4
    sampler, positions, _ = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    select = make_batch_fn(jnp.asarray(x), jnp.asarray(y), 20)

    def one(p, ck):
        k1, k2 = jax.random.split(ck)
        st = sampler.init(p, k1)
        st, _ = sample_chain(
            sampler, st, k2, 1, batch_fn=select,
            keep_every=sampler.burn_in_steps, collect_costs=False,
            phase="burn_in")
        return st

    states = jax.vmap(one)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    x_win, y_win = data_windows(x, y, 20)
    x_sel, y_sel = gather_batch(
        x_win, y_win, jnp.asarray([0, 3, 80, 41], jnp.int32))
    theta = pack_fused(states.position)
    v = pack_fused(states.momentum)
    minv = pack_fused(states.stats.minv)
    eps = float(np.sqrt(1e-4))

    outs = {}
    for paired in (False, True):
        outs[paired] = fused_bnn_step(
            theta, v, minv, x_sel, y_sel, eps, 0,
            mdecay=sampler.mdecay, scale_grad=sampler.scale_grad,
            prior_scale=sampler.gaussian_prior_scale,
            batch_size=20, n_data=100, block_chains=n,
            state_dtype=jnp.float32, pair_dots=paired, interpret=True,
        )
    (t_u, v_u, c_u), (t_p, v_p, c_p) = outs[False], outs[True]
    np.testing.assert_array_equal(np.asarray(c_u), np.asarray(c_p))
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(t_u[i]), np.asarray(t_p[i]), err_msg="theta %d" % i)
        np.testing.assert_array_equal(
            np.asarray(v_u[i]), np.asarray(v_p[i]), err_msg="v %d" % i)


def test_per_step_paired_guards():
    """The per-step pair_dots flag validates its configuration."""
    n = 2
    sampler, positions, _ = _workload(n)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    theta = pack_fused(states.position)
    v = pack_fused(states.momentum)
    minv = pack_fused(states.stats.minv)
    x_sel = jnp.zeros((n, 24, 1), jnp.float32)
    y_sel = jnp.zeros((n, 24), jnp.float32)
    eta = pack_fused(states.position)

    with pytest.raises(ValueError, match="even"):
        fused_bnn_step(
            theta, v, minv, x_sel, y_sel, 1e-2, 0, batch_size=20,
            n_data=100, block_chains=1, pair_dots=True, interpret=True)
    with pytest.raises(ValueError, match="noise"):
        fused_bnn_step(
            theta, v, minv, x_sel, y_sel, 1e-2, 0, batch_size=20,
            n_data=100, block_chains=n, pair_dots=True, noise=eta,
            interpret=True)


def test_fused_config_guards():
    """The small configuration guards raise precisely."""
    from pysgmcmc_tpu.ops.fused_step import (
        MAX_INPUTS,
        _vec_rows,
        data_windows,
        fused_bnn_multistep,
    )

    with pytest.raises(ValueError, match="input features"):
        _vec_rows(0)
    with pytest.raises(ValueError, match="input features"):
        _vec_rows(MAX_INPUTS + 1)
    # every admitted width keeps the scal row clear of the cost row
    # (the round-2 advisor's n_inputs == MAX_INPUTS collision)
    for k in range(1, MAX_INPUTS + 1):
        _, _, row_scal = _vec_rows(k)
        from pysgmcmc_tpu.ops.fused_step import S, VEC_ROWS
        assert row_scal < S + VEC_ROWS - 1

    with pytest.raises(ValueError, match="batch rows"):
        data_windows(np.zeros((100, 1)), np.zeros(100), batch_size=25)

    # multistep driver: chain/block divisibility and wide-slot pair_dots
    sampler, positions, _ = _workload(2)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), 2))
    theta = pack_fused(states.position)
    v = pack_fused(states.momentum)
    minv = pack_fused(states.stats.minv)
    x_win, y_win = data_windows(
        np.zeros((100, 1), np.float32), np.zeros(100, np.float32), 20)
    with pytest.raises(ValueError, match="divisible"):
        fused_bnn_multistep(
            theta, v, minv, x_win, y_win, 1e-2, 0, batch_size=20,
            n_data=100, block_chains=4, k_steps=2, interpret=True)

    with pytest.raises(ValueError, match="n_inputs=1"):
        fused_bnn_step(
            theta, v, minv,
            jnp.zeros((2, 24, 2), jnp.float32), jnp.zeros((2, 24)),
            1e-2, 0, batch_size=20, n_data=100, block_chains=2,
            pair_dots=True, n_inputs=2, interpret=True)


@pytest.mark.slow
@pytest.mark.parametrize("depth", [2, 4])
def test_multistep_depth_parity(depth):
    """Depth-2 and depth-4 networks through the fused multi-step kernel
    == the pytree path (round-4 parametric-depth generators: pack_fused
    emits one (H, H) slab per hidden layer beyond the first and the
    generators loop the forward/backward over them —
    ops/fused_step._fwd_bwd).  Interpret mode: the zero-bit PRNG pins
    window 0 and zero noise on both sides."""
    from bench import build_workload
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused

    n, k_steps, h = 2, 3, 30
    sampler, positions, select, (x, y) = build_workload(
        n_chains=n, network="dense", units=(h,) * depth,
        return_data=True)
    sampler.burn_in_steps = 40

    def one(p, ck):
        k1, k2 = jax.random.split(ck)
        st = sampler.init(p, k1)
        st, _ = sample_chain(
            sampler, st, k2, 1, batch_fn=select,
            keep_every=sampler.burn_in_steps, collect_costs=False)
        return st

    states = jax.vmap(one)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    xb = jnp.asarray(x[0:20])
    yb = jnp.asarray(y[0:20]).reshape(-1, 1)

    def ref_steps(state):
        zero = jax.tree_util.tree_map(jnp.zeros_like, state.position)
        for _ in range(k_steps):
            state = sampler.step(
                state, jax.random.PRNGKey(0), (xb, yb), noise=zero,
                phase="sampling")[0]
        return state

    ref = jax.vmap(ref_steps)(states)
    # box_muller: zero-bit PRNG => zero noise holds only for this
    # generator (not the "auto"-default CLT)
    out, _, costs = sample_chain_fused(
        sampler, states, jax.random.PRNGKey(2), 1, x, y,
        batch_size=20, keep_every=k_steps, block_chains=n,
        state_dtype=jnp.float32, multistep=True,
        noise_impl="box_muller", interpret=True)

    assert np.isfinite(np.asarray(costs)).all()
    for key in ref.position:
        np.testing.assert_allclose(
            np.asarray(ref.position[key]),
            np.asarray(out.position[key]),
            rtol=0, atol=2e-3, err_msg="position " + key)


@pytest.mark.parametrize("depth", [2, 4])
def test_pack_unpack_roundtrip_depths(depth):
    """pack_fused/unpack_fused invert each other at depths 2 and 4."""
    from pysgmcmc_tpu.models.architectures import dense_network

    init_fn, _ = dense_network(1, units=(30,) * depth)
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), 3))
    packed = pack_fused(params)
    assert len(packed) == depth - 1
    assert packed[0].shape == (3, 72, 64)
    for m in packed[1:]:
        assert m.shape == (3, 64, 64)
    out = unpack_fused(packed, 30)
    assert set(out) == set(params)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(params[k]), np.asarray(out[k]), err_msg=k)


def test_fused_depth_validation():
    """Out-of-range depths and pair_dots x depth are rejected loudly."""
    from pysgmcmc_tpu.models.architectures import dense_network
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_multistep, fused_depth

    init_fn, _ = dense_network(1, units=(10,) * 5)
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), 2))
    with pytest.raises(ValueError, match="2-4 hidden"):
        fused_depth(params)
    with pytest.raises(ValueError, match="2-4 hidden"):
        pack_fused(params)

    init_fn, _ = dense_network(1, units=(10, 10))
    params2 = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(1), 2))
    theta = pack_fused(params2)
    v = tuple(jnp.zeros_like(t) for t in theta)
    minv = tuple(jnp.ones_like(t) for t in theta)
    xw, yw = data_windows(
        np.zeros((30, 1), np.float32), np.zeros(30, np.float32), 20)
    with pytest.raises(ValueError, match="3-hidden-layer"):
        fused_bnn_multistep(
            theta, v, minv, xw, yw, 1e-3, 0, batch_size=20, n_data=30,
            block_chains=2, k_steps=1, pair_dots=True, interpret=True)


@pytest.mark.slow
def test_roofline_ablation_knob_is_live():
    """ops.fused_step._ABLATE changes the traced kernel — with the cache
    cleared, as the roofline benchmark does.

    The knob exists only for benchmarks/wide_roofline_tpu.py, but the
    whole roofline methodology rests on it: the public kernel drivers
    are @jax.jit-wrapped and the module global is invisible to the jit
    cache key, so WITHOUT jax.clear_caches() every "ablated" variant
    silently reuses the first-traced (full) kernel.  Bitten on chip
    once — five identical timings published as marginals.  This pins
    (a) the knob reaches the kernel after a cache clear, and (b) the
    default (None) path is restored afterwards.
    """
    from pysgmcmc_tpu.ops import fused_step
    from pysgmcmc_tpu.ops.fused_step import fused_bnn_multistep

    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (100, 1)).astype(np.float32)
    y = rng.uniform(0, 1, 100).astype(np.float32)
    xw, yw = data_windows(x, y, batch_size=20)
    big = jnp.asarray(rng.randn(2, 72, 64) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.randn(2, 64, 64) * 0.1, jnp.float32)
    theta = [big, w3]
    v = [jnp.zeros_like(big), jnp.zeros_like(w3)]
    minv = [jnp.ones_like(big), jnp.ones_like(w3)]

    def run():
        th, _, _ = fused_bnn_multistep(
            theta, v, minv, xw, yw, 1e-2, 0, batch_size=20, n_data=100,
            block_chains=2, state_dtype=jnp.float32, k_steps=3,
            interpret=True)
        return np.asarray(th[0])

    full = run()
    assert fused_step._ABLATE is None
    fused_step._ABLATE = "rulemath"
    try:
        jax.clear_caches()
        ablated = run()
    finally:
        fused_step._ABLATE = None
    jax.clear_caches()
    restored = run()

    assert not np.array_equal(full, ablated), (
        "ablation knob did not reach the kernel — jit cache reuse?")
    np.testing.assert_array_equal(full, restored)


#  MXU-CLT noise generator (noise_impl='hadamard_clt') ------------------------


def test_hadamard_pm1_orthogonal():
    """The +-1 Sylvester-Hadamard mixing matrix: H^T H = n I exactly, so
    the CLT generator's covariance is the identity by construction."""
    from pysgmcmc_tpu.ops.fused_step import _hadamard_pm1

    for n in (64, 128, 256):
        h = np.asarray(_hadamard_pm1(n), np.float32)
        assert set(np.unique(h).tolist()) == {-1.0, 1.0}
        np.testing.assert_array_equal(h.T @ h, n * np.eye(n, dtype=np.float32))
        # Sylvester structure: H[i, j] = (-1)^popcount(i & j)
        i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        pop = np.vectorize(lambda v: bin(v).count("1"))(i & j)
        np.testing.assert_array_equal(h, np.where(pop % 2, -1.0, 1.0))


def test_normal_clt_zero_bit_value():
    """Interpret mode's PRNG yields zero bits -> u = 0 -> the CLT output
    is exactly -0.5 * sum_i H[i, j] * sqrt(12/n): -sqrt(12 n)/2 on lane 0
    (H's first column is all ones), 0 elsewhere.  Pins the scale constant
    and the mixing axis."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pysgmcmc_tpu.ops.fused_step import _hadamard_pm1, _normal_clt

    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        out_ref[:] = _normal_clt((4, 16, 128), _hadamard_pm1(128))

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 16, 128), jnp.float32),
        interpret=pltpu.InterpretParams(),
    )(jnp.asarray([42], jnp.int32))
    z = np.asarray(out)
    expect0 = -0.5 * 128 * np.sqrt(12.0 / 128.0)
    np.testing.assert_allclose(z[:, :, 0], expect0, rtol=1e-6)
    np.testing.assert_array_equal(z[:, :, 1:], 0.0)


@pytest.mark.slow
def test_noise_impl_reaches_the_kernel():
    """The zero-bit discriminator: through the FULL driver stack
    (sample_chain_fused, multistep), Box-Muller's zero-bit stream is
    exactly zero noise while the CLT's is a -sqrt(12 n)/2 spike on lane
    0 — so the two noise_impl settings must produce different states,
    and box_muller must reproduce today's stream bitwise."""
    from pysgmcmc_tpu.parallel.packed import sample_chain_fused

    n = 4
    sampler, positions, select = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(0), n))
    states, _ = jax.vmap(
        lambda s, k: sample_chain(
            sampler, s, k, 1, batch_fn=select,
            keep_every=sampler.burn_in_steps,
            collect_costs=False, phase="burn_in")
    )(states, jax.random.split(jax.random.PRNGKey(1), n))

    def run(noise_impl):
        st, _, costs = sample_chain_fused(
            sampler, states, jax.random.PRNGKey(2), 2, x, y,
            batch_size=20, keep_every=2, block_chains=n,
            state_dtype=jnp.float32, multistep=True,
            noise_impl=noise_impl, interpret=True,
        )
        assert np.isfinite(np.asarray(costs)).all()
        return np.asarray(st.position["w2"])

    w2_bm = run("box_muller")
    w2_bm2 = run("box_muller")
    w2_clt = run("hadamard_clt")
    np.testing.assert_array_equal(w2_bm, w2_bm2)
    assert not np.array_equal(w2_bm, w2_clt), (
        "noise_impl='hadamard_clt' produced the Box-Muller stream — the "
        "knob never reached the kernel")


def test_noise_impl_error_paths():
    from pysgmcmc_tpu.models.bayesian_neural_network import (
        BayesianNeuralNetwork,
    )
    from pysgmcmc_tpu.ops.fused_step import _noise_hmats

    with pytest.raises(ValueError, match="noise_impl"):
        _noise_hmats("wallace", 64)
    assert _noise_hmats("box_muller", 64) is None
    with pytest.raises(ValueError, match="noise_impl"):
        BayesianNeuralNetwork(step_impl="pytree", noise_impl="hadamard_clt")
    with pytest.raises(ValueError, match="box_muller"):
        BayesianNeuralNetwork(step_impl="fused", network="dense",
                              pair_dots=True, noise_impl="hadamard_clt")
    with pytest.raises(ValueError, match="noise_impl"):
        BayesianNeuralNetwork(step_impl="fused", network="dense",
                              noise_impl="clt")


def test_noise_impl_rejects_injected_noise():
    """noise_impl selects the in-kernel PRNG generator; combining it with
    injected noise arrays must refuse loudly, not silently ignore one."""
    from pysgmcmc_tpu.models.architectures import dense_network

    init_fn, _ = dense_network(1)
    params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), 4))
    theta = pack_fused(params)
    v = pack_fused(jax.tree_util.tree_map(jnp.zeros_like, params))
    minv = pack_fused(jax.tree_util.tree_map(jnp.ones_like, params))
    x_sel = jnp.zeros((4, B_PAD), jnp.float32)
    y_sel = jnp.zeros((4, B_PAD), jnp.float32)
    noise = pack_fused(jax.tree_util.tree_map(jnp.zeros_like, params))
    with pytest.raises(ValueError, match="injected"):
        fused_bnn_step(
            theta, v, minv, x_sel, y_sel, 0.01, 0,
            block_chains=4, state_dtype=jnp.float32, noise=noise,
            noise_impl="hadamard_clt", interpret=True)


@pytest.mark.slow
def test_multistep_launch_chunking_matches_single_launch(monkeypatch):
    """Segments longer than MAX_STEPS_PER_LAUNCH chunk into bounded
    launches that reproduce the single-launch trajectory.

    The per-step SMEM schedule table costs one 128-lane f32 row per
    step, so one launch covering a whole 3000-step burn-in asks for
    1.5 MB of the chip's 1 MiB SMEM and fails AOT compilation (found
    on-chip: BayesianNeuralNetwork(log_every=None) trains the full
    burn-in as one segment).  Interpret mode draws zero noise and
    window 0, so the chunked and unchunked runs are directly
    comparable — shrink the bound to force chunking and pin both the
    sampling and burn-in drivers against their one-launch outputs.
    """
    from pysgmcmc_tpu.parallel import packed
    from pysgmcmc_tpu.parallel.packed import (
        burnin_chain_fused,
        sample_chain_fused,
    )

    n, k_steps = 2, 6
    sampler, positions, _ = _workload(n)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc

    y = np.asarray(sinc(x), np.float32)
    states = jax.vmap(sampler.init)(
        positions, jax.random.split(jax.random.PRNGKey(1), n))

    def run_both(fn):
        out = {}
        for bound in (packed.MAX_STEPS_PER_LAUNCH, 2):
            monkeypatch.setattr(packed, "MAX_STEPS_PER_LAUNCH", bound)
            out[bound] = fn()
        return out[packed.MAX_STEPS_PER_LAUNCH], out[2]

    # burn-in driver: 6 steps in one launch vs 3 launches of 2
    single_b, chunked_b = run_both(lambda: burnin_chain_fused(
        sampler, states, jax.random.PRNGKey(2), k_steps, x, y,
        batch_size=20, block_chains=n, state_dtype=jnp.float32,
        noise_impl="box_muller", interpret=True))
    assert int(np.asarray(chunked_b.step)[0]) == k_steps
    for key in single_b.position:
        np.testing.assert_array_equal(
            np.asarray(single_b.position[key]),
            np.asarray(chunked_b.position[key]),
            err_msg="burn-in position " + key)
        np.testing.assert_array_equal(
            np.asarray(single_b.stats.v_hat[key]),
            np.asarray(chunked_b.stats.v_hat[key]),
            err_msg="burn-in v_hat " + key)

    # sampling driver: keep_every=6 in one launch vs 3 launches of 2
    single, chunked = run_both(lambda: sample_chain_fused(
        sampler, single_b, jax.random.PRNGKey(3), 1, x, y,
        batch_size=20, keep_every=k_steps, block_chains=n,
        state_dtype=jnp.float32, multistep=True,
        noise_impl="box_muller", interpret=True))
    for key in single[0].position:
        np.testing.assert_array_equal(
            np.asarray(single[0].position[key]),
            np.asarray(chunked[0].position[key]),
            err_msg="sampling position " + key)
    np.testing.assert_array_equal(
        np.asarray(single[2]), np.asarray(chunked[2]),
        err_msg="final-step costs")


@pytest.mark.slow
def test_small_chain_pad_guard_bitwise():
    """n_chains < MIN_FUSED_CHAINS pads transparently and bit-exactly.

    Mosaic rejects 1-row chain blocks on real TPUs ("Not implemented:
    Offset change" on the per-chain cost reduction — found when
    ``BayesianNeuralNetwork(step_impl='fused')`` with the default
    ``n_chains=1`` failed to compile on a v5e while every CPU test
    passed).  On the compile path the fused drivers pad the chain axis
    to the sublane minimum and slice back (interpret mode has no Mosaic
    and runs unpadded); this pins the claim that makes the pad safe:
    an UNPADDED small run is BITWISE the first chains of the equivalent
    explicitly-padded MIN_FUSED_CHAINS-chain run (per-chain PRNG streams
    are chain-index keyed; the host-side window draw is prefix-stable
    under a longer draw shape).
    """
    from pysgmcmc_tpu.diagnostics.objective_functions import sinc
    from pysgmcmc_tpu.parallel.packed import (
        MIN_FUSED_CHAINS,
        _pad_chain_axis,
        burnin_chain_fused,
        sample_chain_fused,
    )

    n = 2
    sampler, positions, _ = _workload(MIN_FUSED_CHAINS)
    pos2 = jax.tree_util.tree_map(lambda l: l[:n], positions)
    rng = np.random.RandomState(0)
    x = rng.uniform(0.0, 1.0, (100, 1)).astype(np.float32)
    y = np.asarray(sinc(x), np.float32)

    states2 = jax.vmap(sampler.init)(
        pos2, jax.random.split(jax.random.PRNGKey(0), n))
    states8 = _pad_chain_axis(states2, n, MIN_FUSED_CHAINS)

    b2 = burnin_chain_fused(
        sampler, states2, jax.random.PRNGKey(1), 20, x, y,
        batch_size=20, interpret=True)
    b8 = burnin_chain_fused(
        sampler, states8, jax.random.PRNGKey(1), 20, x, y,
        batch_size=20, interpret=True)
    for name, l2, l8 in zip(
        range(10**9),
        jax.tree_util.tree_leaves(b2),
        jax.tree_util.tree_leaves(b8),
    ):
        l8s = np.asarray(l8)
        if np.ndim(l8s) >= 1 and l8s.shape[0] == MIN_FUSED_CHAINS:
            l8s = l8s[:n]
        np.testing.assert_array_equal(
            np.asarray(l2), l8s, err_msg="burn-in leaf {}".format(name))

    for multistep in (False, True):
        s2, p2, c2 = sample_chain_fused(
            sampler, b2, jax.random.PRNGKey(2), 3, x, y,
            batch_size=20, keep_every=2, multistep=multistep,
            interpret=True)
        s8, p8, c8 = sample_chain_fused(
            sampler, b8, jax.random.PRNGKey(2), 3, x, y,
            batch_size=20, keep_every=2, multistep=multistep,
            interpret=True)
        assert c2.shape == (n, 3)
        np.testing.assert_array_equal(
            np.asarray(c2), np.asarray(c8)[:n],
            err_msg="costs multistep={}".format(multistep))
        for key in p2:
            np.testing.assert_array_equal(
                np.asarray(p2[key]), np.asarray(p8[key])[:n],
                err_msg="positions {} multistep={}".format(key, multistep))

    # n_chains=1 (the reported config) runs end to end
    pos1 = jax.tree_util.tree_map(lambda l: l[:1], positions)
    states1 = jax.vmap(sampler.init)(
        pos1, jax.random.split(jax.random.PRNGKey(0), 1))
    b1 = burnin_chain_fused(
        sampler, states1, jax.random.PRNGKey(1), 5, x, y,
        batch_size=20, interpret=True)
    s1, p1, c1 = sample_chain_fused(
        sampler, b1, jax.random.PRNGKey(2), 2, x, y,
        batch_size=20, multistep=True, interpret=True)
    assert c1.shape == (1, 2)
    assert np.isfinite(np.asarray(c1)).all()
    assert p1["w2"].shape[0] == 1

"""Fused SGHMC update step as a Pallas TPU kernel.

One pass over all sampler state in VMEM: the scale-adapted burn-in EMAs
(tau, g, v_hat, minv), the post-burn-in minv freeze, Gaussian noise
generation (in-kernel threefry via the TPU PRNG + Box-Muller), the momentum
update and the position update — the complete per-step math of
:mod:`pysgmcmc_tpu.samplers.sghmc` (reference semantics:
``/root/reference/pysgmcmc/samplers/sghmc.py:109-253``).

Layout: sampler state is *stacked and flat* — every array is
``(n_chains, dim)`` with ``dim`` padded to a multiple of 128 lanes — so one
kernel serves any number of chains and parameters and the grid tiles
perfectly onto the VPU.  The XLA path in ``samplers/sghmc.py`` stays the
reference implementation; this kernel is the hot path for large chain
counts (it saves materializing the noise array and the half-dozen
intermediate elementwise tensors in HBM).

Noise modes:

- ``noise=None`` (default): in-kernel RNG.  Seeded per grid block from the
  ``seed`` operand, so results are deterministic in (seed, shapes, blocking)
  but not bitwise-equal to the ``jax.random.normal`` stream of the XLA path.
- explicit ``noise`` array: deterministic math only — bitwise-testable
  against a pure-jnp replica (used by the parity tests).

Examples
--------
>>> pad_dim(5)
128
>>> pad_dim(200)
256
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def pad_dim(dim):
    """Round ``dim`` up to a multiple of the 128-lane TPU tile width."""
    return ((dim + LANES - 1) // LANES) * LANES


def _block_shape(n_rows, n_cols, n_buffers):
    """Pick (block_rows, block_cols) dividing the array, under a VMEM budget."""
    col_tiles = n_cols // LANES
    block_cols = n_cols
    for k in range(min(col_tiles, 8), 0, -1):
        if col_tiles % k == 0:
            block_cols = k * LANES
            break
    block_rows = 8
    while (
        block_rows * 2 <= n_rows
        and n_rows % (block_rows * 2) == 0
        and block_rows * 2 * block_cols * 4 * n_buffers <= _VMEM_BUDGET_BYTES
    ):
        block_rows *= 2
    if n_rows % block_rows != 0:
        block_rows = n_rows  # small/odd row counts: single row block
    return block_rows, block_cols


def _uniform_from_bits(shape):
    """uint32 PRNG bits -> uniform in [0, 1) via exponent stuffing."""
    bits = pltpu.prng_random_bits(shape)
    mantissa = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9)
    )
    return pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32) - 1.0


def _normal_from_bits(shape):
    """Standard normal samples from the in-kernel PRNG via Box-Muller.

    Uses BOTH Box-Muller outputs (cos and sin) when the sublane count is
    even, halving the per-element transcendental cost; each (u1, u2) pair
    yields two independent normals.
    """
    rows, cols = shape
    if rows % 2 == 0:
        half = rows // 2
        u1 = _uniform_from_bits((half, cols))
        u2 = _uniform_from_bits((half, cols))
        radius = jnp.sqrt(-2.0 * jnp.log1p(-u1))  # log(1-u1), u1 in [0,1)
        angle = 2.0 * jnp.pi * u2
        return jnp.concatenate(
            [radius * jnp.cos(angle), radius * jnp.sin(angle)], axis=0
        )
    u1 = _uniform_from_bits(shape)
    u2 = _uniform_from_bits(shape)
    radius = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    return radius * jnp.cos(2.0 * jnp.pi * u2)


def _update_math(theta, v, tau, g, v_hat, minv, grad, eta,
                 eps, eps_scaled, mdecay, burning_in):
    """The SGHMC step, identical term-by-term to samplers/sghmc.py."""
    small = 1e-16
    r = 1.0 / (tau + 1.0)
    sqrt_vhat = jnp.sqrt(jnp.maximum(v_hat, 0.0))
    minv_new = 1.0 / (sqrt_vhat + 2.0 * jnp.sign(sqrt_vhat) * small + small)
    minv_used = jnp.where(burning_in, minv_new, minv)

    denom = v_hat + 2.0 * jnp.sign(v_hat) * small + small
    tau_new = tau + (-g * g * tau) / denom + 1.0
    g_new = g - r * g + r * grad
    v_hat_new = v_hat - r * v_hat + r * grad * grad

    noise_var = 2.0 * eps_scaled**2 * mdecay * minv_used - eps_scaled**4
    sigma = jnp.sqrt(jnp.maximum(noise_var, 1e-16))
    v_new = v - eps**2 * minv_used * grad - mdecay * v + sigma * eta
    theta_new = theta + v_new
    return theta_new, v_new, tau_new, g_new, v_hat_new, minv_used


def _kernel_rng(int_ref, float_ref, theta_ref, v_ref, tau_ref, g_ref,
                v_hat_ref, minv_ref, grad_ref,
                theta_out, v_out, tau_out, g_out, v_hat_out, minv_out):
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    # two-word seeding MIXES the (per-step seed, block id) material, so
    # streams can never collide across (step, block) pairs the way an
    # additive seed + pid would (seed+1, pid) == (seed, pid+1)
    pltpu.prng_seed(int_ref[0], pid)
    eps = float_ref[0]
    eps_scaled = float_ref[1]
    mdecay = float_ref[2]
    burning_in = int_ref[1] > 0

    eta = _normal_from_bits(theta_ref.shape)
    outs = _update_math(
        theta_ref[:], v_ref[:], tau_ref[:], g_ref[:], v_hat_ref[:],
        minv_ref[:], grad_ref[:], eta, eps, eps_scaled, mdecay, burning_in,
    )
    for ref, val in zip(
        (theta_out, v_out, tau_out, g_out, v_hat_out, minv_out), outs
    ):
        ref[:] = val


def _kernel_noise(int_ref, float_ref, theta_ref, v_ref, tau_ref, g_ref,
                  v_hat_ref, minv_ref, grad_ref, eta_ref,
                  theta_out, v_out, tau_out, g_out, v_hat_out, minv_out):
    eps = float_ref[0]
    eps_scaled = float_ref[1]
    mdecay = float_ref[2]
    burning_in = int_ref[1] > 0

    outs = _update_math(
        theta_ref[:], v_ref[:], tau_ref[:], g_ref[:], v_hat_ref[:],
        minv_ref[:], grad_ref[:], eta_ref[:], eps, eps_scaled, mdecay,
        burning_in,
    )
    for ref, val in zip(
        (theta_out, v_out, tau_out, g_out, v_hat_out, minv_out), outs
    ):
        ref[:] = val


@functools.partial(
    jax.jit, static_argnames=("mdecay", "scale_grad", "interpret")
)
def fused_sghmc_update(
    theta, v, tau, g, v_hat, minv, grad,
    eps, burning_in, seed,
    mdecay=0.05, scale_grad=1.0,
    noise=None,
    interpret=False,
):
    """One fused SGHMC step over stacked flat state.

    All array arguments are ``(n_chains, dim)`` float32 with ``dim`` a
    multiple of 128 (see :func:`pad_dim`).  ``eps`` is a scalar (traced ok),
    ``burning_in`` a scalar bool/int, ``seed`` a scalar int32.

    Returns the six updated state arrays
    ``(theta, v, tau, g, v_hat, minv)``.
    """
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "fused_sghmc_update: dim must be a multiple of {} (use pad_dim); "
            "got {}".format(LANES, n_cols)
        )
    with_noise = noise is not None
    n_buffers = 13 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    eps_scaled32 = eps32 / jnp.sqrt(jnp.asarray(scale_grad, jnp.float32))
    int_scalars = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(burning_in, jnp.int32)]
    )
    float_scalars = jnp.stack(
        [eps32, eps_scaled32, jnp.asarray(mdecay, jnp.float32)]
    )

    # index_map receives the scalar-prefetch refs after the grid indices.
    tensor_spec = pl.BlockSpec(
        (block_rows, block_cols),
        lambda i, j, *_: (i, j),
        memory_space=pltpu.VMEM,
    )
    n_inputs = 7 + (1 if with_noise else 0)
    out_shape = tuple(
        jax.ShapeDtypeStruct(theta.shape, jnp.float32) for _ in range(6)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[tensor_spec] * n_inputs,
        out_specs=(tensor_spec,) * 6,
    )
    kernel = _kernel_noise if with_noise else _kernel_rng
    operands = (theta, v, tau, g, v_hat, minv, grad)
    if with_noise:
        operands = operands + (noise,)
    # alias inputs 2..7 (after the two scalar-prefetch args) onto the outputs
    aliases = {i + 2: i for i in range(6)}
    # NOTE: plain interpret=True cannot lower the TPU prng primitives on CPU;
    # InterpretParams emulates them (random bits come back as zeros — fine
    # for structural tests; statistical RNG tests run on real TPU).
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)

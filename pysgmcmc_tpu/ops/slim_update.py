"""Slim sampling-phase SGHMC update as a Pallas TPU kernel.

After burn-in the adaptation statistics are frozen
(:meth:`pysgmcmc_tpu.samplers.sghmc.SGHMCSampler.partition_frozen`), so the
per-step state is just ``(theta, v)`` and the update needs only the frozen
``minv`` and the gradient:

    sigma  = sqrt(max(2 eps_s^2 mdecay minv - eps_s^4, 1e-16))
    v'     = (v - eps^2 minv (grad + prior_scale theta) - mdecay v
              + sigma eta) * mask
    theta' = theta + v'

(reference semantics ``/root/reference/pysgmcmc/samplers/sghmc.py:211-243``;
``prior_scale`` folds an isotropic Gaussian weight prior's analytic gradient
into the theta-reading pass, see ``samplers/sghmc.py`` here).

Layout: all state is *packed flat* — ``(n_chains, width)`` with every
pytree leaf occupying a 128-aligned lane slot (see
:mod:`pysgmcmc_tpu.parallel.packed`).  This is the load-bearing choice:
TPU physical layout pads the last dimension of every array to 128 lanes,
so streaming the stacked BNN pytree (leaves like ``(chains, 50, 50)`` or
``(chains, 50, 2)``) moves 3-70x more HBM bytes than the logical state.
The packed layout is dense up to the ~10% slot padding, which the ``mask``
operand zeroes so padding lanes never drift from 0.

The kernel fuses, in one VMEM pass: Gaussian noise generation (in-kernel
TPU PRNG + dual-output Box-Muller), the prior fold, the momentum update and
the position update.  ``grad`` may be bfloat16 (the MXU's native output),
halving its HBM read.

Noise modes mirror :func:`pysgmcmc_tpu.ops.fused_update.fused_sghmc_update`:
``noise=None`` draws in-kernel (deterministic in (seed, shape, blocking) but
not bitwise-equal to the threefry stream); an explicit ``noise`` array makes
the kernel pure math, bitwise-testable against the pytree sampler.

Examples
--------
>>> import jax, jax.numpy as jnp
>>> theta = jnp.zeros((8, 256)); v = jnp.zeros((8, 256))
>>> grad = jnp.ones((8, 256)); minv = jnp.ones((8, 256))
>>> mask = jnp.ones((1, 256))
>>> theta2, v2 = slim_sghmc_update(
...     theta, v, grad, minv, mask, eps=0.1, seed=0,
...     noise=jnp.zeros((8, 256)), interpret=True)
>>> bool(jnp.allclose(v2, -0.01 * 1.0 * 1.0))  # -eps^2 * minv * grad
True
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pysgmcmc_tpu.ops.fused_update import LANES, _normal_from_bits

# Tighter than fused_update's budget: the compiler double-buffers every
# block and Box-Muller adds ~3 block-sized f32 temporaries.
_VMEM_BUDGET_BYTES = 4 * 1024 * 1024


def _block_shape(n_rows, n_cols, n_buffers):
    """Pick (block_rows, block_cols) dividing the array, under the budget."""
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


def _check_eps_row(eps32, n_cols, name):
    """Validate/shape a per-chain stepsize into a ``(1, n_cols)`` row.

    Per-chain stepsizes only make sense in the chains-on-lanes layout
    (chains on the minor axis), where a ``(1, width)`` row broadcasts one
    value per chain across all of its parameter rows.
    """
    if eps32.size != n_cols:
        raise ValueError(
            "{}: per-chain eps must have one entry per column "
            "(chains-on-lanes layout); got {} entries for width {}".format(
                name, eps32.size, n_cols))
    return eps32.reshape(1, n_cols)


def _update_math(theta, v, grad, minv, mask, eta,
                 eps, eps_scaled, mdecay, prior_scale):
    """All arithmetic in f32; v/minv/grad may arrive bfloat16."""
    v = v.astype(jnp.float32)
    minv = minv.astype(jnp.float32)
    g = grad.astype(jnp.float32) + prior_scale * theta
    noise_var = 2.0 * eps_scaled**2 * mdecay * minv - eps_scaled**4
    sigma = jnp.sqrt(jnp.maximum(noise_var, 1e-16))
    v_new = (v - eps**2 * minv * g - mdecay * v + sigma * eta) * mask
    return theta + v_new, v_new


def _seeded_eta(int_ref, shape):
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    # two-word seeding MIXES the (per-step seed, block id) material, so
    # streams can never collide across (step, block) pairs the way an
    # additive seed + pid would ((seed+1, pid) == (seed, pid+1))
    pltpu.prng_seed(int_ref[0], pid)
    return _normal_from_bits(shape)


def _make_sghmc_kernel(with_noise, with_eps):
    """SGHMC sampling-phase kernel.

    ``with_eps``: the stepsize arrives as two ``(1, block_cols)`` row
    operands (per-chain ``eps`` and ``eps_scaled`` in the chains-on-lanes
    layout) instead of ``float_ref`` scalars — one compiled program then
    advances every chain at its own stepsize (the ESS-sweep pattern of
    :class:`pysgmcmc_tpu.stepsize_schedules.TracedStepsizeSchedule`).
    """

    def kernel(int_ref, float_ref, *refs):
        theta_ref, v_ref, grad_ref, minv_ref, mask_ref = refs[:5]
        i = 5
        if with_eps:
            eps_ref, eps_s_ref = refs[i], refs[i + 1]
            i += 2
            eps, eps_scaled = eps_ref[:], eps_s_ref[:]
        else:
            eps, eps_scaled = float_ref[0], float_ref[1]
        if with_noise:
            eta = refs[i][:]
            i += 1
        else:
            eta = _seeded_eta(int_ref, theta_ref.shape)
        theta_out, v_out = refs[i], refs[i + 1]
        theta_new, v_new = _update_math(
            theta_ref[:], v_ref[:], grad_ref[:], minv_ref[:], mask_ref[:],
            eta, eps, eps_scaled, float_ref[2], float_ref[3],
        )
        theta_out[:] = theta_new
        v_out[:] = v_new.astype(v_out.dtype)

    return kernel


def _leaf_uniform(shape):
    bits = pltpu.prng_random_bits(shape)
    mantissa = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9))
    return pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32) - 1.0


def _leaf_kernel_rng(int_ref, float_ref, theta_ref, v_ref, grad_ref,
                     minv_ref, *outs):
    pltpu.prng_seed(int_ref[0], pl.program_id(0))
    u1 = _leaf_uniform(theta_ref.shape)
    u2 = _leaf_uniform(theta_ref.shape)
    eta = jnp.sqrt(-2.0 * jnp.log1p(-u1)) * jnp.cos(2.0 * jnp.pi * u2)
    theta_new, v_new = _update_math(
        theta_ref[:], v_ref[:], grad_ref[:], minv_ref[:], 1.0, eta,
        float_ref[0], float_ref[1], float_ref[2], float_ref[3],
    )
    outs[0][:], outs[1][:] = theta_new, v_new
    if len(outs) == 3:  # bf16 copy of theta for the next gradient pass
        outs[2][:] = theta_new.astype(jnp.bfloat16)


def _leaf_kernel_noise(int_ref, float_ref, theta_ref, v_ref, grad_ref,
                       minv_ref, eta_ref, *outs):
    theta_new, v_new = _update_math(
        theta_ref[:], v_ref[:], grad_ref[:], minv_ref[:], 1.0, eta_ref[:],
        float_ref[0], float_ref[1], float_ref[2], float_ref[3],
    )
    outs[0][:], outs[1][:] = theta_new, v_new
    if len(outs) == 3:
        outs[2][:] = theta_new.astype(jnp.bfloat16)


def _leaf_physical_bytes_per_row(shape):
    """Physical VMEM bytes per chain row of a stacked f32 leaf block."""
    dims = list(shape)
    if not dims:
        return 4 * LANES  # scalar leaf -> one padded lane row
    dims[-1] = ((dims[-1] + LANES - 1) // LANES) * LANES
    if len(dims) >= 2:
        dims[-2] = ((dims[-2] + 7) // 8) * 8
    out = 4
    for d in dims:
        out *= d
    return out


def _leaf_update(theta, v, grad, minv, float_scalars, seed,
                 noise=None, emit_bf16=False, interpret=False):
    n = theta.shape[0]
    shape = theta.shape[1:]
    per_row = _leaf_physical_bytes_per_row(shape)
    n_buffers = 7 + (1 if noise is not None else 0) + (1 if emit_bf16 else 0)
    block_rows = 8
    while (
        block_rows * 2 <= n
        and n % (block_rows * 2) == 0
        and block_rows * 2 * per_row * n_buffers <= _LEAF_VMEM_BUDGET
    ):
        block_rows *= 2
    if n % block_rows != 0:
        block_rows = n

    block = (block_rows,) + shape
    rank = len(block)

    def index_map(i, *_):
        return (i,) + (0,) * (rank - 1)

    def spec():
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    operands = (theta, v, grad, minv)
    in_specs = [spec(), spec(), spec(), spec()]
    if noise is not None:
        operands = operands + (noise,)
        in_specs.append(spec())
    out_shape = [
        jax.ShapeDtypeStruct(theta.shape, jnp.float32),
        jax.ShapeDtypeStruct(v.shape, jnp.float32),
    ]
    out_specs = [spec(), spec()]
    if emit_bf16:
        out_shape.append(jax.ShapeDtypeStruct(theta.shape, jnp.bfloat16))
        out_specs.append(spec())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // block_rows,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    kernel = _leaf_kernel_noise if noise is not None else _leaf_kernel_rng
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases={2: 0, 3: 1},
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)


# conservative: the compiler double-buffers every block and the in-kernel
# Box-Muller adds ~3 block-sized f32 temporaries on top of the operands
_LEAF_VMEM_BUDGET = 3 * 1024 * 1024
_LEAF_SEED_STRIDE = 1000003  # distinct PRNG stream per leaf


@functools.partial(
    jax.jit,
    static_argnames=(
        "mdecay", "scale_grad", "prior_scale", "emit_bf16", "interpret"
    ),
)
def slim_sghmc_update_tree(
    theta, v, grad, minv, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    noise=None, emit_bf16=False, interpret=False,
):
    """Fused sampling-phase SGHMC step over *stacked pytree* state.

    The zero-relayout variant of :func:`slim_sghmc_update`: every leaf keeps
    its native stacked layout ``(n_chains, *shape)`` (exactly what the
    vmapped gradient produces and the matmuls consume, so no pack/unpack
    pass ever runs) and gets its own kernel launch, blocked over the chain
    axis.  The win over the XLA elementwise chain is the in-kernel noise:
    the threefry draw + its HBM materialization (measured 1.9 ms of the
    5.5 ms flagship step) collapses into per-block TPU PRNG calls.

    ``theta``/``v``/``minv`` are float32 stacked pytrees, ``grad`` a stacked
    pytree in float32 or bfloat16, ``eps``/``seed`` traced scalars.
    Returns ``(theta', v')`` stacked pytrees, buffers aliased in place.
    """
    eps32 = jnp.asarray(eps, jnp.float32)
    eps_scaled32 = eps32 / jnp.sqrt(jnp.asarray(scale_grad, jnp.float32))
    float_scalars = jnp.stack([
        eps32, eps_scaled32,
        jnp.asarray(mdecay, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])
    seed32 = jnp.asarray(seed, jnp.int32)

    theta_leaves, treedef = jax.tree_util.tree_flatten(theta)
    v_leaves = jax.tree_util.tree_flatten(v)[0]
    grad_leaves = jax.tree_util.tree_flatten(grad)[0]
    minv_leaves = jax.tree_util.tree_flatten(minv)[0]
    noise_leaves = (
        jax.tree_util.tree_flatten(noise)[0]
        if noise is not None else [None] * len(theta_leaves)
    )

    theta_out, v_out, bf16_out = [], [], []
    for i, (t, vv, g, mi, e) in enumerate(zip(
        theta_leaves, v_leaves, grad_leaves, minv_leaves, noise_leaves
    )):
        leaf_seed = seed32 + jnp.int32((i * _LEAF_SEED_STRIDE) & 0x7FFFFFF)
        outs = _leaf_update(
            t, vv, g, mi, float_scalars, leaf_seed,
            noise=e, emit_bf16=emit_bf16, interpret=interpret,
        )
        theta_out.append(outs[0])
        v_out.append(outs[1])
        if emit_bf16:
            bf16_out.append(outs[2])
    unflatten = functools.partial(
        jax.tree_util.tree_unflatten, treedef
    )
    if emit_bf16:
        return unflatten(theta_out), unflatten(v_out), unflatten(bf16_out)
    return unflatten(theta_out), unflatten(v_out)


@functools.partial(
    jax.jit,
    static_argnames=("mdecay", "scale_grad", "prior_scale", "interpret"),
)
def slim_sghmc_update(
    theta, v, grad, minv, mask, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    noise=None, interpret=False,
):
    """One fused sampling-phase SGHMC step over packed flat state.

    Parameters
    ----------
    theta, v, minv : (n_chains, width) float32, ``width`` a multiple of 128
    grad : (n_chains, width) float32 or bfloat16
    mask : (1, width) float32 — 1 on real lanes, 0 on slot padding
    eps : scalar stepsize (traced ok), or a ``(width,)``/``(1, width)``
        per-chain stepsize vector for the chains-on-lanes layout (one
        entry per lane = per chain; the ESS-sweep pattern)
    seed : scalar int32 — per-step seed for the in-kernel PRNG
    noise : optional (n_chains, width) float32 standard normals; replaces
        the in-kernel draw (bitwise-testable math-only mode)

    Returns ``(theta', v')``, aliased onto the ``theta``/``v`` buffers.
    """
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "slim_sghmc_update: width must be a multiple of {}; got "
            "{}".format(LANES, n_cols)
        )
    if mask is not None and mask.shape != (1, n_cols):
        raise ValueError(
            "slim_sghmc_update: mask must be (1, {}); got {}".format(
                n_cols, mask.shape
            )
        )
    if mask is None:  # no slot padding to zero (e.g. chains-on-lanes packs)
        mask = jnp.ones((1, n_cols), jnp.float32)
    with_noise = noise is not None
    with_eps = jnp.ndim(eps) != 0
    n_buffers = 7 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    eps_scaled32 = eps32 / jnp.sqrt(jnp.asarray(scale_grad, jnp.float32))
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    zero = jnp.zeros((), jnp.float32)
    float_scalars = jnp.stack([
        zero if with_eps else eps32,
        zero if with_eps else eps_scaled32,
        jnp.asarray(mdecay, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def spec(dtype=None):
        return pl.BlockSpec(
            (block_rows, block_cols),
            lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM,
        )

    def row_spec():
        return pl.BlockSpec(
            (1, block_cols), lambda i, j, *_: (0, j),
            memory_space=pltpu.VMEM,
        )

    in_specs = [spec(), spec(), spec(), spec(), row_spec()]
    operands = (theta, v, grad, minv, mask)
    if with_eps:
        eps_row = _check_eps_row(eps32, n_cols, "slim_sghmc_update")
        eps_s_row = eps_scaled32.reshape(1, n_cols)
        in_specs += [row_spec(), row_spec()]
        operands = operands + (eps_row, eps_s_row)
    if with_noise:
        in_specs.append(spec())
        operands = operands + (noise,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec(), spec()),
    )
    out_shape = (
        jax.ShapeDtypeStruct(theta.shape, jnp.float32),
        # v round-trips in its own dtype: bfloat16 momentum halves its HBM
        # traffic (arithmetic stays f32 in VMEM)
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    )
    # alias theta (operand idx 2 incl. the two scalar-prefetch args) and v
    # onto the two outputs: the update is in-place in HBM
    aliases = {2: 0, 3: 1}
    kernel = _make_sghmc_kernel(with_noise, with_eps)
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)


#  SGLD (momentum-free) -----------------------------------------------------

def _sgld_math(theta, grad, minv, mask, eta, eps, a_over_sg, a_coef,
               prior_scale):
    minv = minv.astype(jnp.float32)
    g = grad.astype(jnp.float32) + prior_scale * theta
    sigma = jnp.sqrt(jnp.maximum(2.0 * eps * minv * a_over_sg, 0.0))
    return theta + (-eps * minv * a_coef * g + sigma * eta) * mask


def _make_sgld_kernel(with_noise, with_eps):
    def kernel(int_ref, float_ref, *refs):
        theta_ref, grad_ref, minv_ref, mask_ref = refs[:4]
        i = 4
        if with_eps:
            eps = refs[i][:]
            i += 1
        else:
            eps = float_ref[0]
        if with_noise:
            eta = refs[i][:]
            i += 1
        else:
            eta = _seeded_eta(int_ref, theta_ref.shape)
        theta_out = refs[i]
        theta_out[:] = _sgld_math(
            theta_ref[:], grad_ref[:], minv_ref[:], mask_ref[:], eta,
            eps, float_ref[1], float_ref[2], float_ref[3])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("a_coef", "scale_grad", "prior_scale", "interpret"),
)
def slim_sgld_update(
    theta, grad, minv, mask, eps, seed,
    a_coef=1.0, scale_grad=1.0, prior_scale=0.0,
    noise=None, interpret=False,
):
    """One fused sampling-phase SGLD step over packed flat state.

    SGLD semantics of :mod:`pysgmcmc_tpu.samplers.sgld`:
    ``theta' = theta - eps minv A grad + sqrt(2 eps minv A / scale_grad)
    eta``, with the optional analytic Gaussian-prior fold.  Arguments as
    in :func:`slim_sghmc_update` minus the momentum; returns ``theta'``
    aliased onto the input buffer.
    """
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "slim_sgld_update: width must be a multiple of {}; got "
            "{}".format(LANES, n_cols))
    if mask is None:
        mask = jnp.ones((1, n_cols), jnp.float32)
    with_noise = noise is not None
    with_eps = jnp.ndim(eps) != 0
    n_buffers = 5 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = jnp.stack([
        jnp.zeros((), jnp.float32) if with_eps else eps32,
        jnp.asarray(a_coef / scale_grad, jnp.float32),
        jnp.asarray(a_coef, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def spec():
        return pl.BlockSpec(
            (block_rows, block_cols), lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, block_cols), lambda i, j, *_: (0, j),
            memory_space=pltpu.VMEM)

    in_specs = [spec(), spec(), spec(), row_spec()]
    operands = (theta, grad, minv, mask)
    if with_eps:
        in_specs.append(row_spec())
        operands = operands + (
            _check_eps_row(eps32, n_cols, "slim_sgld_update"),)
    if with_noise:
        in_specs.append(spec())
        operands = operands + (noise,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec(),),
    )
    kernel = _make_sgld_kernel(with_noise, with_eps)
    interpreter = pltpu.InterpretParams() if interpret else False
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(theta.shape, jnp.float32),),
        input_output_aliases={2: 0},
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)
    return out


#  pSGLD (RMSprop-preconditioned) --------------------------------------------

def _psgld_math(theta, v, grad, mask, eta, eps, alpha, lam, inv_sg,
                prior_scale):
    v32 = v.astype(jnp.float32)
    g = grad.astype(jnp.float32) + prior_scale * theta
    v_new = alpha * v32 + (1.0 - alpha) * g * g
    precond = 1.0 / (lam + jnp.sqrt(jnp.maximum(v_new, 0.0)))
    sigma = jnp.sqrt(jnp.maximum(eps * precond * inv_sg, 0.0))
    theta_new = theta + (-0.5 * eps * precond * g + sigma * eta) * mask
    return theta_new, v_new * mask


def _make_psgld_kernel(with_noise, with_eps):
    def kernel(int_ref, float_ref, *refs):
        theta_ref, v_ref, grad_ref, mask_ref = refs[:4]
        i = 4
        if with_eps:
            eps = refs[i][:]
            i += 1
        else:
            eps = float_ref[0]
        if with_noise:
            eta = refs[i][:]
            i += 1
        else:
            eta = _seeded_eta(int_ref, theta_ref.shape)
        theta_out, v_out = refs[i], refs[i + 1]
        theta_new, v_new = _psgld_math(
            theta_ref[:], v_ref[:], grad_ref[:], mask_ref[:], eta,
            eps, float_ref[1], float_ref[2], float_ref[3],
            float_ref[4])
        theta_out[:] = theta_new
        v_out[:] = v_new.astype(v_out.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "lambda_reg", "scale_grad", "prior_scale",
                     "interpret"),
)
def slim_psgld_update(
    theta, v, grad, mask, eps, seed,
    alpha=0.99, lambda_reg=1e-5, scale_grad=1.0, prior_scale=0.0,
    noise=None, interpret=False,
):
    """One fused pSGLD step over packed flat state.

    pSGLD semantics of :mod:`pysgmcmc_tpu.samplers.psgld` (Li et al. 2016,
    RMSprop preconditioner adapting every step — there is no frozen
    phase):

        v'     = alpha v + (1 - alpha) grad^2
        G      = 1 / (lambda + sqrt(v'))
        theta' = theta - eps/2 G grad + sqrt(eps G / scale_grad) eta

    ``v`` is the preconditioner accumulator (may be ``bfloat16``; the
    arithmetic runs in f32 in VMEM).  Returns ``(theta', v')`` aliased
    in place."""
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "slim_psgld_update: width must be a multiple of {}; got "
            "{}".format(LANES, n_cols))
    if mask is None:
        mask = jnp.ones((1, n_cols), jnp.float32)
    with_noise = noise is not None
    with_eps = jnp.ndim(eps) != 0
    n_buffers = 6 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = jnp.stack([
        jnp.zeros((), jnp.float32) if with_eps else eps32,
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(lambda_reg, jnp.float32),
        jnp.asarray(1.0 / scale_grad, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def spec():
        return pl.BlockSpec(
            (block_rows, block_cols), lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, block_cols), lambda i, j, *_: (0, j),
            memory_space=pltpu.VMEM)

    in_specs = [spec(), spec(), spec(), row_spec()]
    operands = (theta, v, grad, mask)
    if with_eps:
        in_specs.append(row_spec())
        operands = operands + (
            _check_eps_row(eps32, n_cols, "slim_psgld_update"),)
    if with_noise:
        in_specs.append(spec())
        operands = operands + (noise,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec(), spec()),
    )
    out_shape = (
        jax.ShapeDtypeStruct(theta.shape, jnp.float32),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    )
    kernel = _make_psgld_kernel(with_noise, with_eps)
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={2: 0, 3: 1},
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)


#  Relativistic SGHMC ---------------------------------------------------------

def _rsghmc_math(theta, pm, grad, mask, eta, eps, noise_scale, d_coef,
                 inv_m, inv_m2c2, prior_scale):
    p32 = pm.astype(jnp.float32)
    # dynamics use the log-likelihood gradient = -(cost gradient)
    g = -(grad.astype(jnp.float32) + prior_scale * theta)

    def vel(p):
        return eps * p * inv_m * jax.lax.rsqrt(p * p * inv_m2c2 + 1.0)

    p_new = (p32 + eps * g + noise_scale * eta - d_coef * vel(p32)) * mask
    theta_new = theta + vel(p_new) * mask
    return theta_new, p_new


def _make_rsghmc_kernel(with_noise, with_eps):
    def kernel(int_ref, float_ref, *refs):
        theta_ref, p_ref, grad_ref, mask_ref = refs[:4]
        i = 4
        if with_eps:
            eps, noise_scale = refs[i][:], refs[i + 1][:]
            i += 2
        else:
            eps, noise_scale = float_ref[0], float_ref[1]
        if with_noise:
            eta = refs[i][:]
            i += 1
        else:
            eta = _seeded_eta(int_ref, theta_ref.shape)
        theta_out, p_out = refs[i], refs[i + 1]
        theta_new, p_new = _rsghmc_math(
            theta_ref[:], p_ref[:], grad_ref[:], mask_ref[:], eta,
            eps, noise_scale, float_ref[2], float_ref[3],
            float_ref[4], float_ref[5])
        theta_out[:] = theta_new
        p_out[:] = p_new.astype(p_out.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("d_coef", "bhat", "mass", "speed_of_light",
                     "prior_scale", "interpret"),
)
def slim_rsghmc_update(
    theta, p, grad, mask, eps, seed,
    d_coef=1.0, bhat=0.0, mass=1.0, speed_of_light=1.0, prior_scale=0.0,
    noise=None, interpret=False,
):
    """One fused relativistic-SGHMC step over packed flat state.

    Semantics of :mod:`pysgmcmc_tpu.samplers.relativistic_sghmc`
    (Lu et al. 2017):

        v(p)   = eps p / (m sqrt(p^2/(m^2 c^2) + 1))
        p'     = p + eps d(loglik)/dtheta + sqrt(eps (2D - eps Bhat)) eta
                 - D v(p)
        theta' = theta + v(p')

    ``p`` is the relativistic momentum (bfloat16 supported; arithmetic in
    f32).  Returns ``(theta', p')`` aliased in place."""
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "slim_rsghmc_update: width must be a multiple of {}; got "
            "{}".format(LANES, n_cols))
    if mask is None:
        mask = jnp.ones((1, n_cols), jnp.float32)
    with_noise = noise is not None
    with_eps = jnp.ndim(eps) != 0
    n_buffers = 6 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    noise_scale32 = jnp.sqrt(jnp.maximum(
        eps32 * (2.0 * d_coef - eps32 * bhat), 0.0))
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    zero = jnp.zeros((), jnp.float32)
    float_scalars = jnp.stack([
        zero if with_eps else eps32,
        zero if with_eps else noise_scale32,
        jnp.asarray(d_coef, jnp.float32),
        jnp.asarray(1.0 / mass, jnp.float32),
        jnp.asarray(1.0 / (mass**2 * speed_of_light**2), jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def spec():
        return pl.BlockSpec(
            (block_rows, block_cols), lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, block_cols), lambda i, j, *_: (0, j),
            memory_space=pltpu.VMEM)

    in_specs = [spec(), spec(), spec(), row_spec()]
    operands = (theta, p, grad, mask)
    if with_eps:
        in_specs += [row_spec(), row_spec()]
        operands = operands + (
            _check_eps_row(eps32, n_cols, "slim_rsghmc_update"),
            noise_scale32.reshape(1, n_cols),
        )
    if with_noise:
        in_specs.append(spec())
        operands = operands + (noise,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec(), spec()),
    )
    out_shape = (
        jax.ShapeDtypeStruct(theta.shape, jnp.float32),
        jax.ShapeDtypeStruct(p.shape, p.dtype),
    )
    kernel = _make_rsghmc_kernel(with_noise, with_eps)
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={2: 0, 3: 1},
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)

#  SGNHT (Nosé-Hoover thermostat) ---------------------------------------------

def _sgnht_math(theta, p, grad, mask, eta, eps, sigma, xi, prior_scale):
    p32 = p.astype(jnp.float32)
    g = grad.astype(jnp.float32) + prior_scale * theta
    p_new = (p32 - xi * eps * p32 - eps * g + sigma * eta) * mask
    return theta + eps * p_new, p_new


def _make_sgnht_kernel(with_noise, with_eps):
    def kernel(int_ref, float_ref, *refs):
        theta_ref, p_ref, grad_ref, mask_ref, xi_ref = refs[:5]
        i = 5
        if with_eps:
            eps, sigma = refs[i][:], refs[i + 1][:]
            i += 2
        else:
            eps, sigma = float_ref[0], float_ref[1]
        if with_noise:
            eta = refs[i][:]
            i += 1
        else:
            eta = _seeded_eta(int_ref, theta_ref.shape)
        theta_out, p_out = refs[i], refs[i + 1]
        theta_new, p_new = _sgnht_math(
            theta_ref[:], p_ref[:], grad_ref[:], mask_ref[:], eta,
            eps, sigma, xi_ref[:], float_ref[2])
        theta_out[:] = theta_new
        p_out[:] = p_new.astype(p_out.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("a_diff", "scale_grad", "prior_scale", "interpret"),
)
def slim_sgnht_update(
    theta, p, grad, mask, xi, eps, seed,
    a_diff=1.0, scale_grad=1.0, prior_scale=0.0,
    noise=None, interpret=False,
):
    """One fused SGNHT step over packed flat state.

    Semantics of :mod:`pysgmcmc_tpu.samplers.sgnht` (Ding et al. 2014):

        p'     = p - xi eps p - eps grad
                 + sqrt(2 A eps / scale_grad) eta
        theta' = theta + eps p'

    ``xi`` is the per-chain thermostat as a ``(1, width)`` row (one scalar
    per chain on the lanes); its own update ``xi' = xi + eps (p'^T p'/d -
    1)`` is a cross-row reduction per chain and lives in the driver
    (:func:`pysgmcmc_tpu.parallel.packed.sample_chain_lanes`), one cheap
    XLA pass over ``p'``.  Other arguments as in
    :func:`slim_sghmc_update`.  Returns ``(theta', p')`` aliased in place.
    """
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "slim_sgnht_update: width must be a multiple of {}; got "
            "{}".format(LANES, n_cols))
    if mask is None:
        mask = jnp.ones((1, n_cols), jnp.float32)
    if xi.shape != (1, n_cols):
        raise ValueError(
            "slim_sgnht_update: xi must be a (1, {}) per-chain row; got "
            "{}".format(n_cols, xi.shape))
    with_noise = noise is not None
    with_eps = jnp.ndim(eps) != 0
    n_buffers = 6 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    sigma32 = jnp.sqrt(jnp.maximum(
        2.0 * a_diff * eps32 / scale_grad, 0.0))
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    zero = jnp.zeros((), jnp.float32)
    float_scalars = jnp.stack([
        zero if with_eps else eps32,
        zero if with_eps else sigma32,
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def spec():
        return pl.BlockSpec(
            (block_rows, block_cols), lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, block_cols), lambda i, j, *_: (0, j),
            memory_space=pltpu.VMEM)

    in_specs = [spec(), spec(), spec(), row_spec(), row_spec()]
    operands = (theta, p, grad, mask, jnp.asarray(xi, jnp.float32))
    if with_eps:
        in_specs += [row_spec(), row_spec()]
        operands = operands + (
            _check_eps_row(eps32, n_cols, "slim_sgnht_update"),
            sigma32.reshape(1, n_cols),
        )
    if with_noise:
        in_specs.append(spec())
        operands = operands + (noise,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec(), spec()),
    )
    out_shape = (
        jax.ShapeDtypeStruct(theta.shape, jnp.float32),
        jax.ShapeDtypeStruct(p.shape, p.dtype),
    )
    kernel = _make_sgnht_kernel(with_noise, with_eps)
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={2: 0, 3: 1},
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)


#  Scale-adapted burn-in (SGHMC / SGLD) ---------------------------------------
#
# The Springenberg et al. self-tuning burn-in EMAs
# (pysgmcmc_tpu/samplers/_adaptive.py, reference semantics
# /root/reference/pysgmcmc/samplers/sghmc.py:126-196) fused with the
# parameter update into one VMEM pass, so full runs never touch the pytree
# path: burn-in traffic is theta/v/tau/g/v_hat in, the updated five plus
# minv_used out, with in-kernel noise.  The math below reproduces the
# pytree path term for term under injected noise (pinned in
# tests/parallel/test_burnin_lanes.py: tau/minv bitwise, the
# mul-add-bearing outputs to 1-2 ulp of FMA-contraction freedom between
# compilations): safe_divide's sign-aware epsilon and safe_sqrt's clip
# are inlined exactly as utils/numeric.py defines them.
#
# Padding rows need no masking: their gradient is identically zero, so
# g stays 0, v_hat stays 0, minv saturates at 1/1e-16 and the injected
# sigma*eta random walk stays finite and is never unpacked.

def _sghmc_burnin_math(theta, v, tau, g, v_hat, grad, mask, eta,
                       eps, eps_scaled, mdecay, prior_scale):
    small = 1e-16
    v32 = v.astype(jnp.float32)
    gg = grad.astype(jnp.float32) + prior_scale * theta
    # minv_used = safe_divide(1, safe_sqrt(OLD v_hat))
    sqrt_vhat = jnp.sqrt(jnp.maximum(v_hat, 0.0))
    minv = 1.0 / (sqrt_vhat + 2.0 * jnp.sign(sqrt_vhat) * small + small)
    # tau' = tau + safe_divide(-g*g*tau, v_hat) + 1     (OLD g, v_hat)
    denom = v_hat + 2.0 * jnp.sign(v_hat) * small + small
    tau_new = tau + (-g * g * tau) / denom + 1.0
    r = 1.0 / (tau + 1.0)                               # OLD tau
    g_new = g - r * g + r * gg
    v_hat_new = v_hat - r * v_hat + r * gg * gg
    sigma = jnp.sqrt(jnp.maximum(
        2.0 * eps_scaled**2 * mdecay * minv - eps_scaled**4, 1e-16))
    v_new = (v32 - eps**2 * minv * gg - mdecay * v32 + sigma * eta) * mask
    return theta + v_new, v_new, tau_new, g_new, v_hat_new, minv


def _make_sghmc_burnin_kernel(with_noise, with_eps):
    def kernel(int_ref, float_ref, *refs):
        theta_ref, v_ref, tau_ref, g_ref, v_hat_ref, grad_ref, mask_ref = \
            refs[:7]
        i = 7
        if with_eps:
            eps, eps_scaled = refs[i][:], refs[i + 1][:]
            i += 2
        else:
            eps, eps_scaled = float_ref[0], float_ref[1]
        if with_noise:
            eta = refs[i][:]
            i += 1
        else:
            eta = _seeded_eta(int_ref, theta_ref.shape)
        outs = refs[i:i + 6]
        vals = _sghmc_burnin_math(
            theta_ref[:], v_ref[:], tau_ref[:], g_ref[:], v_hat_ref[:],
            grad_ref[:], mask_ref[:], eta,
            eps, eps_scaled, float_ref[2], float_ref[3])
        for ref, val in zip(outs, vals):
            ref[:] = val.astype(ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mdecay", "scale_grad", "prior_scale", "interpret"),
)
def slim_sghmc_burnin_update(
    theta, v, tau, g, v_hat, grad, mask, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    noise=None, interpret=False,
):
    """One fused burn-in SGHMC step (EMA adaptation + update) over flat state.

    Semantics of :func:`pysgmcmc_tpu.samplers._adaptive.update_stats`
    (``phase="burn_in"``) followed by the SGHMC momentum/position update,
    matching the pytree path under injected ``noise`` (tau/minv bitwise,
    the rest to 1-2 ulp of FMA-contraction freedom).  All of
    ``theta, v, tau, g, v_hat`` are ``(n_rows, n_cols)`` float32 (``v`` may
    be bfloat16); ``eps`` is a scalar or a per-chain ``(1, n_cols)`` row
    (chains-on-lanes layout).  Returns
    ``(theta', v', tau', g', v_hat', minv_used)`` with the first five
    aliased in place; ``minv_used = 1/sqrt(old v_hat)`` is what the step
    actually used — after the final burn-in step it is the frozen mass
    matrix the sampling phase feeds to :func:`slim_sghmc_update`.
    """
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "slim_sghmc_burnin_update: width must be a multiple of {}; "
            "got {}".format(LANES, n_cols))
    if mask is None:
        mask = jnp.ones((1, n_cols), jnp.float32)
    with_noise = noise is not None
    with_eps = jnp.ndim(eps) != 0
    n_buffers = 13 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    eps_scaled32 = eps32 / jnp.sqrt(jnp.asarray(scale_grad, jnp.float32))
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    zero = jnp.zeros((), jnp.float32)
    float_scalars = jnp.stack([
        zero if with_eps else eps32,
        zero if with_eps else eps_scaled32,
        jnp.asarray(mdecay, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def spec():
        return pl.BlockSpec(
            (block_rows, block_cols), lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, block_cols), lambda i, j, *_: (0, j),
            memory_space=pltpu.VMEM)

    in_specs = [spec()] * 6 + [row_spec()]
    operands = (theta, v, tau, g, v_hat, grad, mask)
    if with_eps:
        in_specs += [row_spec(), row_spec()]
        operands = operands + (
            _check_eps_row(eps32, n_cols, "slim_sghmc_burnin_update"),
            eps_scaled32.reshape(1, n_cols),
        )
    if with_noise:
        in_specs.append(spec())
        operands = operands + (noise,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(spec() for _ in range(6)),
    )
    out_shape = (
        jax.ShapeDtypeStruct(theta.shape, jnp.float32),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct(tau.shape, jnp.float32),
        jax.ShapeDtypeStruct(g.shape, jnp.float32),
        jax.ShapeDtypeStruct(v_hat.shape, jnp.float32),
        jax.ShapeDtypeStruct(v_hat.shape, jnp.float32),  # minv_used
    )
    # alias the five state operands (idx 2.. incl. scalar-prefetch args)
    aliases = {2: 0, 3: 1, 4: 2, 5: 3, 6: 4}
    kernel = _make_sghmc_burnin_kernel(with_noise, with_eps)
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)


def _sgld_burnin_math(theta, tau, g, v_hat, grad, mask, eta,
                      eps, a_coef, sg_safe, prior_scale):
    small = 1e-16
    gg = grad.astype(jnp.float32) + prior_scale * theta
    sqrt_vhat = jnp.sqrt(jnp.maximum(v_hat, 0.0))
    minv = 1.0 / (sqrt_vhat + 2.0 * jnp.sign(sqrt_vhat) * small + small)
    denom = v_hat + 2.0 * jnp.sign(v_hat) * small + small
    tau_new = tau + (-g * g * tau) / denom + 1.0
    r = 1.0 / (tau + 1.0)
    g_new = g - r * g + r * gg
    v_hat_new = v_hat - r * v_hat + r * gg * gg
    # sigma = safe_sqrt(2 eps safe_divide(minv A, scale_grad)); sg_safe is
    # the sign-nudged denominator computed once in the wrapper
    sigma = jnp.sqrt(jnp.maximum(
        2.0 * eps * ((minv * a_coef) / sg_safe), 0.0))
    theta_new = theta + (-eps * minv * a_coef * gg + sigma * eta) * mask
    return theta_new, tau_new, g_new, v_hat_new, minv


def _make_sgld_burnin_kernel(with_noise, with_eps):
    def kernel(int_ref, float_ref, *refs):
        theta_ref, tau_ref, g_ref, v_hat_ref, grad_ref, mask_ref = refs[:6]
        i = 6
        if with_eps:
            eps = refs[i][:]
            i += 1
        else:
            eps = float_ref[0]
        if with_noise:
            eta = refs[i][:]
            i += 1
        else:
            eta = _seeded_eta(int_ref, theta_ref.shape)
        outs = refs[i:i + 5]
        vals = _sgld_burnin_math(
            theta_ref[:], tau_ref[:], g_ref[:], v_hat_ref[:], grad_ref[:],
            mask_ref[:], eta,
            eps, float_ref[1], float_ref[2], float_ref[3])
        for ref, val in zip(outs, vals):
            ref[:] = val.astype(ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("a_coef", "scale_grad", "prior_scale", "interpret"),
)
def slim_sgld_burnin_update(
    theta, tau, g, v_hat, grad, mask, eps, seed,
    a_coef=1.0, scale_grad=1.0, prior_scale=0.0,
    noise=None, interpret=False,
):
    """One fused burn-in SGLD step (EMA adaptation + update) over flat state.

    Semantics of :func:`pysgmcmc_tpu.samplers._adaptive.update_stats`
    (``phase="burn_in"``) followed by the SGLD update of
    :mod:`pysgmcmc_tpu.samplers.sgld`, matching the pytree path under
    injected ``noise`` (tau/minv bitwise, the rest to 1-2 ulp).  Returns
    ``(theta', tau', g', v_hat', minv_used)``, the first four aliased in
    place (see :func:`slim_sghmc_burnin_update` for the layout and the
    ``eps`` row convention).
    """
    n_rows, n_cols = theta.shape
    if n_cols % LANES != 0:
        raise ValueError(
            "slim_sgld_burnin_update: width must be a multiple of {}; "
            "got {}".format(LANES, n_cols))
    if mask is None:
        mask = jnp.ones((1, n_cols), jnp.float32)
    with_noise = noise is not None
    with_eps = jnp.ndim(eps) != 0
    n_buffers = 10 + (1 if with_noise else 0)
    block_rows, block_cols = _block_shape(n_rows, n_cols, n_buffers)
    grid = (n_rows // block_rows, n_cols // block_cols)

    eps32 = jnp.asarray(eps, jnp.float32)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    # safe_divide's sign-nudged denominator, computed with the same jnp
    # ops as utils/numeric.safe_divide so the kernel divides bitwise-equal
    sg = jnp.asarray(scale_grad, jnp.float32)
    c = jnp.asarray(1e-16, jnp.float32)
    sg_safe = sg + 2.0 * jnp.sign(sg) * c + c
    float_scalars = jnp.stack([
        jnp.zeros((), jnp.float32) if with_eps else eps32,
        jnp.asarray(a_coef, jnp.float32),
        sg_safe,
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def spec():
        return pl.BlockSpec(
            (block_rows, block_cols), lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, block_cols), lambda i, j, *_: (0, j),
            memory_space=pltpu.VMEM)

    in_specs = [spec()] * 5 + [row_spec()]
    operands = (theta, tau, g, v_hat, grad, mask)
    if with_eps:
        in_specs.append(row_spec())
        operands = operands + (
            _check_eps_row(eps32, n_cols, "slim_sgld_burnin_update"),)
    if with_noise:
        in_specs.append(spec())
        operands = operands + (noise,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(spec() for _ in range(5)),
    )
    out_shape = (
        jax.ShapeDtypeStruct(theta.shape, jnp.float32),
        jax.ShapeDtypeStruct(tau.shape, jnp.float32),
        jax.ShapeDtypeStruct(g.shape, jnp.float32),
        jax.ShapeDtypeStruct(v_hat.shape, jnp.float32),
        jax.ShapeDtypeStruct(v_hat.shape, jnp.float32),  # minv_used
    )
    aliases = {2: 0, 3: 1, 4: 2, 5: 3}
    kernel = _make_sgld_burnin_kernel(with_noise, with_eps)
    interpreter = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)

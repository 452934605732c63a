"""flash-SGHMC: the entire BNN sampling-phase step as ONE Pallas kernel.

Forward pass, heteroscedastic Gaussian likelihood (+ log-variance prior),
backward pass, Gaussian weight-prior fold, noise generation and the SGHMC
momentum/position update — fused into a single kernel per chain block, for
the flagship workload family: the reference's 3x``H``-tanh heteroscedastic
regression BNN (``/root/reference/pysgmcmc/models/bayesian_neural_network.
py:28-69``, dense parameterization of :func:`pysgmcmc_tpu.models.
architectures.dense_network`) advanced by SGHMC
(``.../samplers/sghmc.py:211-243``) across thousands of chains.

Why one kernel: the XLA program materializes, per step, bf16 weight
copies (the cast pass), every activation, the gradients, and the threefry
noise.  Here activations, gradients and noise never leave VMEM; HBM
traffic per step is exactly read theta(f32)+v(bf16)+minv(bf16) and write
theta+v, plus the tiny selected minibatch.

Design notes (probed on v5e, ``benchmarks/megakernel_probe*.py``):

- Per-chain ``fori_loop`` dots run at ~155 ns/dot (5x XLA's batched
  matmul); a *batch-dimension* ``dot_general`` inside the kernel runs at
  ~54 ns/dot.  The kernel is therefore written with NO loops: every op is
  vectorized over the chain block, and all six HxH matmuls (2 forward,
  4 backward) are batched ``dot_general`` calls.
- Weights live as ``(n_chains, S, S)`` with the real ``(H, H)`` matrix in
  the top-left and zero padding elsewhere (``S = 64`` for ``H = 50``).
  Zero padding is self-consistent: padded activations and padded-weight
  gradients are exactly zero (checked in the parity test), and the
  update masks its noise so padding never drifts.
- The minibatch is gathered OUTSIDE the kernel (a one-hot MXU matmul over
  the precomputed contiguous windows, exactly
  :func:`pysgmcmc_tpu.data_batches.batch_fn` semantics) and enters as
  ``(n_chains, B_pad)`` arrays; rows past the true batch size are masked
  in-kernel.

Noise modes mirror :mod:`pysgmcmc_tpu.ops.slim_update`: in-kernel PRNG +
Box-Muller by default; explicit ``noise`` arrays for bitwise-testable
math (parity pinned in ``tests/ops/test_fused_step.py``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pysgmcmc_tpu.ops.fused_update import _normal_from_bits  # noqa: F401


def _uniform_3d(shape):
    bits = pltpu.prng_random_bits(shape)
    mantissa = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9))
    return pltpu.bitcast(
        mantissa | jnp.uint32(0x3F800000), jnp.float32) - 1.0


def _normal_3d(shape):
    """Standard normals of any rank from the in-kernel PRNG (Box-Muller)."""
    u1 = _uniform_3d(shape)
    u2 = _uniform_3d(shape)
    return jnp.sqrt(-2.0 * jnp.log1p(-u1)) * jnp.cos(2.0 * jnp.pi * u2)


S = 64        # per-chain matrix slot (both dims); fits H = 50
B_PAD = 24    # padded batch rows (B = 20)
VEC_ROWS = 8  # [w1, b1, b2, b3, w4, (b4, lvb), 0, 0]
ROW_W1, ROW_B1, ROW_B2, ROW_B3, ROW_W4, ROW_SCAL = 0, 1, 2, 3, 4, 5
LANE_B4, LANE_LVB = 0, 1

LOG_MP = float(np.log(1e-6))   # log-variance prior mean (reference)
VAR_P = 0.01                   # log-variance prior variance


#  Packing ------------------------------------------------------------------

def pack_fused(params):
    """Stacked dense-network params -> (w2, w3, vec) fused-kernel layout.

    ``params`` is a stacked :func:`pysgmcmc_tpu.models.architectures.
    dense_network` pytree (leaves ``(n, ...)``).  Returns float32 arrays
    ``w2, w3: (n, S, S)`` (zero-padded) and ``vec: (n, VEC_ROWS, S)``.
    """
    n, h, _ = params["w2"].shape

    def mat(key):
        return jnp.pad(
            jnp.asarray(params[key], jnp.float32),
            ((0, 0), (0, S - h), (0, S - h)))

    def row(leaf):
        leaf = jnp.asarray(leaf, jnp.float32).reshape(n, -1)
        return jnp.pad(leaf, ((0, 0), (0, S - leaf.shape[1])))

    scal = jnp.concatenate(
        [jnp.reshape(params["b4"], (n, 1)),
         jnp.reshape(params["log_variance_bias"], (n, 1))], axis=1)
    vec = jnp.stack(
        [row(params["w1"]), row(params["b1"]), row(params["b2"]),
         row(params["b3"]), row(params["w4"]), row(scal),
         jnp.zeros((n, S), jnp.float32), jnp.zeros((n, S), jnp.float32)],
        axis=1)
    return mat("w2"), mat("w3"), vec


def unpack_fused(packed, h):
    """Inverse of :func:`pack_fused` -> stacked dense-network pytree."""
    w2, w3, vec = packed
    n = w2.shape[0]
    return {
        "w1": vec[:, ROW_W1, :h],
        "b1": vec[:, ROW_B1, :h],
        "w2": w2[:, :h, :h],
        "b2": vec[:, ROW_B2, :h],
        "w3": w3[:, :h, :h],
        "b3": vec[:, ROW_B3, :h],
        "w4": vec[:, ROW_W4, :h],
        "b4": vec[:, ROW_SCAL, LANE_B4].reshape(n, 1),
        "log_variance_bias": vec[:, ROW_SCAL, LANE_LVB].reshape(n, 1, 1),
    }


def data_windows(x, y, batch_size):
    """Contiguous minibatch windows padded to ``B_PAD`` rows.

    Returns ``(x_win, y_win)`` of shape ``(n_windows, B_PAD)`` with
    ``x_win[w, b] = x[w + b]`` for ``b < batch_size`` and zeros beyond —
    window semantics of :func:`pysgmcmc_tpu.data_batches.batch_fn`.
    Traceable (static slices only), so it can live inside a jitted driver.
    """
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    n = x.shape[0]
    n_windows = n - batch_size + 1
    pad = jnp.zeros((n_windows, B_PAD - batch_size), jnp.float32)
    xw = jnp.concatenate(
        [jnp.stack([x[b:b + n_windows] for b in range(batch_size)], axis=1),
         pad], axis=1)
    yw = jnp.concatenate(
        [jnp.stack([y[b:b + n_windows] for b in range(batch_size)], axis=1),
         pad], axis=1)
    return xw, yw


def gather_batch(x_win, y_win, widx):
    """One-hot MXU gather of each chain's window: ``(n, B_PAD)`` x2."""
    n_windows = x_win.shape[0]
    onehot = jax.nn.one_hot(widx, n_windows, dtype=jnp.float32)
    return onehot @ x_win, onehot @ y_win


#  Kernel -------------------------------------------------------------------

def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, ((contract[0], contract[1]), batch),
        preferred_element_type=jnp.float32)


def _make_kernel(batch_size, n_data, with_noise, block_chains):
    bf16 = jnp.bfloat16
    inv_b = 1.0 / batch_size
    inv_n = 1.0 / n_data

    def kernel(int_ref, float_ref,
               tw2, tw3, tvec,
               vw2, vw3, vvec,
               mw2, mw3, mvec,
               x_ref, y_ref,
               *rest):
        if with_noise:
            (nw2, nw3, nvec,
             ow2, ow3, ovec, pw2, pw3, pvec, cost_ref) = rest
        else:
            (ow2, ow3, ovec, pw2, pw3, pvec, cost_ref) = rest
            pltpu.prng_seed(int_ref[0] + pl.program_id(0))

        eps = float_ref[0]
        eps_scaled = float_ref[1]
        mdecay = float_ref[2]
        prior_scale = float_ref[3]

        # row mask for the padded batch rows
        brow = jax.lax.broadcasted_iota(
            jnp.int32, (block_chains, B_PAD), 1)
        bmask = (brow < batch_size).astype(jnp.float32)      # (C, B_PAD)

        # Mosaic cannot represent an empty-contraction dot_general, so the
        # per-chain rank-1 outer products use None-indexing broadcasts
        # (compile-probed OK on v5e: benchmarks/mosaic_constructs_probe.py).
        def _outer(u, w):
            # (C, B) x (C, S) -> (C, B, S): batched outer product
            return u[:, :, None] * w[:, None, :]

        def _brow(m, r):
            # (C, 8, S) -> (C, 1, S) row r, broadcastable over B
            return m[:, r:r + 1, :]

        vec = tvec[:]                                        # (C, 8, S)
        w1 = vec[:, ROW_W1, :]                               # (C, S)
        w4 = vec[:, ROW_W4, :]
        scal = vec[:, ROW_SCAL, :]                           # (C, S)
        b4 = scal[:, LANE_B4:LANE_B4 + 1]                    # (C, 1)
        lvb = scal[:, LANE_LVB:LANE_LVB + 1]

        x = x_ref[:]                                         # (C, B_PAD)
        y = y_ref[:]

        # ---- forward (bf16 matmuls, f32 accumulation) ----------------------
        z1 = _outer(x, w1) + _brow(vec, ROW_B1)
        a1 = jnp.tanh(z1).astype(bf16)                       # (C, B, S)
        w2_bf = tw2[:].astype(bf16)
        w3_bf = tw3[:].astype(bf16)
        z2 = _bdot(a1, w2_bf, (((2,), (1,))))                # (C, B, S)
        a2 = jnp.tanh(z2 + _brow(vec, ROW_B2)).astype(bf16)
        z3 = _bdot(a2, w3_bf, (((2,), (1,))))
        a3 = jnp.tanh(z3 + _brow(vec, ROW_B3)).astype(bf16)
        a3f = a3.astype(jnp.float32)
        # f_mean[c,b] = sum_j a3[c,b,j] w4[c,j] (+ b4)
        f_mean = jnp.sum(a3f * w4[:, None, :], axis=2) + b4  # (C, B)

        # ---- likelihood + head gradients ------------------------------------
        e_lv = jnp.exp(lvb)                                  # (C, 1)
        var_inv = 1.0 / (e_lv + 1e-16)
        diff = (f_mean - y) * bmask                          # (C, B)
        mse = diff * diff
        ll = jnp.sum(
            -mse * (0.5 * var_inv) - 0.5 * lvb * bmask,
            axis=1, keepdims=True) * inv_b                   # (C, 1)
        p_term = -jnp.square(lvb - LOG_MP) / (2.0 * VAR_P) \
            - 0.5 * float(np.log(VAR_P))
        cost_ref[:] = -(ll + p_term * inv_n)

        d_mean = diff * var_inv * inv_b                      # (C, B)
        # dcost/dlvb = -d(ll)/dlvb (likelihood term) + prior term
        d_lvb = -jnp.sum(
            mse * (0.5 * e_lv) * jnp.square(var_inv) - 0.5 * bmask,
            axis=1, keepdims=True) * inv_b
        d_lvb = d_lvb + (lvb - LOG_MP) / VAR_P * inv_n       # (C, 1)
        g_b4 = jnp.sum(d_mean, axis=1, keepdims=True)        # (C, 1)

        # ---- backward --------------------------------------------------------
        # g_w4[c,j] = sum_b d_mean[c,b] a3[c,b,j]
        g_w4 = jnp.sum(a3f * d_mean[:, :, None], axis=1)     # (C, S)
        dz3 = _outer(d_mean, w4) * (1.0 - a3f * a3f)         # (C, B, S)
        g_b3 = jnp.sum(dz3, axis=1)                          # (C, S)
        dz3_bf = dz3.astype(bf16)
        # dW3[c,i,j] = sum_b a2[c,b,i] dz3[c,b,j]
        g_w3 = _bdot(a2, dz3_bf, (((1,), (1,))))             # (C, S, S)
        # da2[c,b,i] = sum_j dz3[c,b,j] W3[c,i,j]
        da2 = _bdot(dz3_bf, w3_bf, (((2,), (2,))))           # (C, B, S)
        a2f = a2.astype(jnp.float32)
        dz2 = da2 * (1.0 - a2f * a2f)
        g_b2 = jnp.sum(dz2, axis=1)
        dz2_bf = dz2.astype(bf16)
        g_w2 = _bdot(a1, dz2_bf, (((1,), (1,))))
        da1 = _bdot(dz2_bf, w2_bf, (((2,), (2,))))
        a1f = a1.astype(jnp.float32)
        dz1 = da1 * (1.0 - a1f * a1f)
        g_b1 = jnp.sum(dz1, axis=1)
        # g_w1[c,j] = sum_b x[c,b] dz1[c,b,j]
        g_w1 = jnp.sum(x[:, :, None] * dz1, axis=1)          # (C, S)

        lane = jax.lax.broadcasted_iota(
            jnp.int32, (block_chains, S), 1)
        g_scal = jnp.where(
            lane == LANE_B4, g_b4,
            jnp.where(lane == LANE_LVB, d_lvb, 0.0),
        ).astype(jnp.float32)                                # (C, S)
        zeros_row = jnp.zeros((block_chains, S), jnp.float32)
        g_vec = jnp.stack(
            [g_w1, g_b1, g_b2, g_b3, g_w4, g_scal, zeros_row, zeros_row],
            axis=1)                                          # (C, 8, S)

        # ---- fused SGHMC update ----------------------------------------------
        if with_noise:
            etas = (nw2[:], nw3[:], nvec[:])
        else:
            etas = (
                _normal_3d((block_chains, S, S)),
                _normal_3d((block_chains, S, S)),
                _normal_3d((block_chains, VEC_ROWS, S)),
            )

        for t_ref, v_ref, m_ref, grad, eta, out_t, out_v in (
            (tw2, vw2, mw2, g_w2, etas[0], ow2, pw2),
            (tw3, vw3, mw3, g_w3, etas[1], ow3, pw3),
            (tvec, vvec, mvec, g_vec, etas[2], ovec, pvec),
        ):
            theta = t_ref[:]
            v32 = v_ref[:].astype(jnp.float32)
            minv = m_ref[:].astype(jnp.float32)
            g = grad + prior_scale * theta
            sigma = jnp.sqrt(jnp.maximum(
                2.0 * eps_scaled**2 * mdecay * minv - eps_scaled**4,
                1e-16))
            v_new = v32 - eps**2 * minv * g - mdecay * v32 + sigma * eta
            # padding slots have minv == 0 -> sigma floor 1e-8; kill even
            # that by masking on the (zero-initialized) minv itself
            v_new = jnp.where(minv > 0.0, v_new, 0.0)
            out_t[:] = theta + v_new
            out_v[:] = v_new.astype(out_v.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mdecay", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "state_dtype", "interpret"),
)
def fused_bnn_step(
    theta, v, minv, x_sel, y_sel, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=64,
    state_dtype=jnp.bfloat16, noise=None, interpret=False,
):
    """One fused forward+backward+update SGHMC step.

    ``theta`` is a ``(w2, w3, vec)`` tuple from :func:`pack_fused`
    (float32); ``v``/``minv`` the same shapes in ``state_dtype``;
    ``x_sel``/``y_sel`` the gathered minibatch ``(n_chains, B_PAD)``
    (see :func:`gather_batch`); ``eps``/``seed`` traced scalars.

    Returns ``(theta', v', cost)`` with ``cost`` shaped ``(n_chains, 1)``.
    """
    tw2, tw3, tvec = theta
    n_chains = tw2.shape[0]
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_step: n_chains ({}) must be divisible by "
            "block_chains ({})".format(n_chains, block_chains))

    eps32 = jnp.asarray(eps, jnp.float32)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = jnp.stack([
        eps32, eps32 / jnp.sqrt(jnp.asarray(scale_grad, jnp.float32)),
        jnp.asarray(mdecay, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def mat_spec():
        return pl.BlockSpec((block_chains, S, S), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def vec_spec():
        return pl.BlockSpec(
            (block_chains, VEC_ROWS, S), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM)

    def data_spec():
        return pl.BlockSpec((block_chains, B_PAD), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def cost_spec():
        return pl.BlockSpec((block_chains, 1), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    state_specs = [mat_spec(), mat_spec(), vec_spec()]
    in_specs = (
        state_specs + state_specs + state_specs
        + [data_spec(), data_spec()]
    )
    operands = list(theta) + list(v) + list(minv) + [x_sel, y_sel]
    with_noise = noise is not None
    if with_noise:
        in_specs = in_specs + state_specs
        operands = operands + list(noise)

    out_shape = (
        tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta)
        + tuple(jax.ShapeDtypeStruct(t.shape, state_dtype) for t in theta)
        + (jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),)
    )
    out_specs = (
        tuple(state_specs) + tuple(state_specs) + (cost_spec(),)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chains // block_chains,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    # alias theta (operands 2..4 incl. scalar-prefetch args) and v (5..7)
    aliases = {i + 2: i for i in range(3)}
    aliases.update({i + 5: i + 3 for i in range(3)})

    kernel = _make_kernel(
        float(batch_size), float(n_data), with_noise, block_chains)
    interpreter = pltpu.InterpretParams() if interpret else False
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)
    return tuple(outs[0:3]), tuple(outs[3:6]), outs[6]

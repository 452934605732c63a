"""flash-SGHMC: the entire BNN sampling-phase step as ONE Pallas kernel.

Forward pass, heteroscedastic Gaussian likelihood (+ log-variance prior),
backward pass, minibatch window selection, Gaussian prior fold, noise
generation and the SGHMC momentum/position update — fused into a single
VMEM-resident kernel per chain block, for the flagship workload family:
the reference's 3x``H``-tanh heteroscedastic regression BNN
(``/root/reference/pysgmcmc/models/bayesian_neural_network.py:28-69``,
dense parameterization of :func:`pysgmcmc_tpu.models.architectures.
dense_network`) advanced by SGHMC (``.../samplers/sghmc.py:211-243``)
across thousands of chains.

Why one kernel: the XLA program materializes, per step, the bf16 weight
copies (cast pass), every activation, the gradients, and the threefry
noise — ~4 GB of HBM round trips against a ~600 MB logical state.  Here
gradients, activations and noise never leave VMEM; HBM traffic per step is
exactly: read theta(f32) + v(bf16) + minv(bf16), write theta + v.

Layout ("interleaved", chains on lanes): per-chain weight matrices sit
side by side on the lane axis —

- ``w2``/``w3``: ``(H, H*n_chains)``, lane ``c*H + j`` = chain ``c``
  element ``[:, j]`` (dense: lanes are a multiple of 128 for
  ``n_chains % 128 == 0``)
- ``vec``: ``(8, H*n_chains)`` rows ``[w1, b1, b2, b3, w4, 0, 0, 0]``
- ``scal``: ``(8, n_chains)`` rows ``[b4, log_variance_bias, 0, ...]``

Within a block of ``C`` chains, the input layer, all activations, the
likelihood, the head and every reduction vectorize across the block's
``H*C`` lanes; only the (H,H) matmuls run in a per-chain ``fori_loop``
over dynamic lane slices (4 dots/chain: z2, z3 forward; fused
dW/d-activation pairs backward).  The head and the minibatch gather ride
the MXU as small masked dots instead of lane gathers.

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

from pysgmcmc_tpu.ops.fused_update import _normal_from_bits

# vec-array row indices
ROW_W1, ROW_B1, ROW_B2, ROW_B3, ROW_W4 = 0, 1, 2, 3, 4
# scal-array row indices
ROW_B4, ROW_LVB = 0, 1
VEC_ROWS = 8
SCAL_ROWS = 8


#  Packing ------------------------------------------------------------------

def pack_interleaved(params):
    """Stacked dense-network params -> (w2, w3, vec, scal) interleaved.

    ``params`` is a stacked :func:`pysgmcmc_tpu.models.architectures.
    dense_network` pytree (leaves ``(n, ...)``).  Returns float32 arrays
    in the kernel's chains-on-lanes layout.
    """
    n = params["w2"].shape[0]
    h = params["w2"].shape[1]

    def mat(key):
        # (n, h, h) -> (h, n, h) -> (h, n*h): lane c*h+j <- chain c col j
        return jnp.transpose(params[key], (1, 0, 2)).reshape(h, n * h)

    def vec_row(leaf):
        return jnp.reshape(leaf, (1, n * h))

    vec = jnp.concatenate(
        [vec_row(params["w1"]), vec_row(params["b1"]),
         vec_row(params["b2"]), vec_row(params["b3"]),
         vec_row(params["w4"]),
         jnp.zeros((VEC_ROWS - 5, n * h), params["w2"].dtype)],
        axis=0,
    )
    scal = jnp.concatenate(
        [jnp.reshape(params["b4"], (1, n)),
         jnp.reshape(params["log_variance_bias"], (1, n)),
         jnp.zeros((SCAL_ROWS - 2, n), params["w2"].dtype)],
        axis=0,
    )
    return (
        mat("w2").astype(jnp.float32),
        mat("w3").astype(jnp.float32),
        vec.astype(jnp.float32),
        scal.astype(jnp.float32),
    )


def unpack_interleaved(packed, n, h):
    """Inverse of :func:`pack_interleaved` -> stacked dense-network pytree."""
    w2, w3, vec, scal = packed

    def mat(a):
        return jnp.transpose(a.reshape(h, n, h), (1, 0, 2))

    def row(a, r, shape):
        return a[r].reshape((n,) + shape)

    return {
        "w1": row(vec, ROW_W1, (h,)),
        "b1": row(vec, ROW_B1, (h,)),
        "w2": mat(w2),
        "b2": row(vec, ROW_B2, (h,)),
        "w3": mat(w3),
        "b3": row(vec, ROW_B3, (h,)),
        "w4": row(vec, ROW_W4, (h,)),
        "b4": scal[ROW_B4].reshape(n, 1),
        "log_variance_bias": scal[ROW_LVB].reshape(n, 1, 1),
    }


def data_windows(x, y, batch_size):
    """Contiguous minibatch windows, stacked for one MXU gather.

    Returns ``xy_win`` of shape ``(2*batch, n_windows)``: rows 0..B-1 the
    x windows, rows B..2B-1 the y windows — ``xy_win[b, w] = x[w + b]``.
    Window semantics match :func:`pysgmcmc_tpu.data_batches.batch_fn`.
    """
    x = np.asarray(x, np.float32).reshape(-1)
    y = np.asarray(y, np.float32).reshape(-1)
    n = x.shape[0]
    n_windows = n - batch_size + 1
    xw = np.stack([x[w:w + batch_size] for w in range(n_windows)], axis=1)
    yw = np.stack([y[w:w + batch_size] for w in range(n_windows)], axis=1)
    return jnp.asarray(np.concatenate([xw, yw], axis=0))


#  Kernel -------------------------------------------------------------------

def _update_group(theta, v, minv, grad, eta, eps, eps_scaled, mdecay,
                  prior_scale):
    v32 = v.astype(jnp.float32)
    minv32 = minv.astype(jnp.float32)
    g = grad + prior_scale * theta
    sigma = jnp.sqrt(jnp.maximum(
        2.0 * eps_scaled**2 * mdecay * minv32 - eps_scaled**4, 1e-16))
    v_new = v32 - eps**2 * minv32 * g - mdecay * v32 + sigma * eta
    return theta + v_new, v_new


def _make_kernel(h, block_chains, batch_size, n_windows, n_data,
                 with_noise):
    """Build the fused-step kernel for static (H, C, B, W, N) config."""
    hc = h * block_chains
    b = batch_size
    log_mp = float(np.log(1e-6))   # log-variance prior mean (reference)
    var_p = 0.01                   # log-variance prior variance
    bf16 = jnp.bfloat16

    def kernel(int_ref, float_ref,
               tw2, tw3, tvec, tscal,        # theta (f32)
               vw2, vw3, vvec, vscal,        # momentum
               mw2, mw3, mvec, mscal,        # frozen minv
               xy_ref, widx_ref,             # data windows + window index
               *rest):
        if with_noise:
            (nw2, nw3, nvec, nscal,
             ow2, ow3, ovec, oscal,
             pw2, pw3, pvec, pscal, cost_ref) = rest
        else:
            (ow2, ow3, ovec, oscal,
             pw2, pw3, pvec, pscal, cost_ref) = rest
            pltpu.prng_seed(int_ref[0] + pl.program_id(0))

        eps = float_ref[0]
        eps_scaled = float_ref[1]
        mdecay = float_ref[2]
        prior_scale = float_ref[3]

        # ---- minibatch gather: one masked dot ----------------------------
        # onehot[w, c] = (widx[c] == w); xy_sel = xy_win @ onehot -> (2B, C)
        widx = widx_ref[0:1, :]                            # (1, C)
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (n_windows, block_chains), 0)
        onehot = (win_ids == widx).astype(bf16)
        xy_sel = jnp.dot(
            xy_ref[:].astype(bf16), onehot,
            preferred_element_type=jnp.float32)            # (2B, C)
        x_sel = xy_sel[0:b, :]
        y_sel = xy_sel[b:2 * b, :]

        # ---- forward ------------------------------------------------------
        w1 = tvec[ROW_W1:ROW_W1 + 1, :]                    # (1, HC)
        b1 = tvec[ROW_B1:ROW_B1 + 1, :]
        b2 = tvec[ROW_B2:ROW_B2 + 1, :]
        b3 = tvec[ROW_B3:ROW_B3 + 1, :]
        w4 = tvec[ROW_W4:ROW_W4 + 1, :]
        b4 = tscal[ROW_B4:ROW_B4 + 1, :]                   # (1, C)
        lvb = tscal[ROW_LVB:ROW_LVB + 1, :]

        x_e = jnp.repeat(x_sel, h, axis=1)                 # (B, HC)
        a1 = jnp.tanh(x_e * w1 + b1).astype(bf16)

        w2_bf = tw2[:].astype(bf16)                        # (H, HC)
        w3_bf = tw3[:].astype(bf16)

        def fwd_dots(a_in, w_bf):
            z = jnp.zeros((b, hc), jnp.float32)

            def body(c, z):
                a_c = jax.lax.dynamic_slice(a_in, (0, c * h), (b, h))
                w_c = jax.lax.dynamic_slice(w_bf, (0, c * h), (h, h))
                z_c = jnp.dot(a_c, w_c, preferred_element_type=jnp.float32)
                return jax.lax.dynamic_update_slice(z, z_c, (0, c * h))

            return jax.lax.fori_loop(0, block_chains, body, z)

        a2 = jnp.tanh(fwd_dots(a1, w2_bf) + b2).astype(bf16)
        a3 = jnp.tanh(fwd_dots(a2, w3_bf) + b3).astype(bf16)

        # ---- head: segment-sum over each chain's H lanes via masked dot --
        lane_chain = jax.lax.broadcasted_iota(jnp.int32, (hc, block_chains), 0) // h
        col_chain = jax.lax.broadcasted_iota(jnp.int32, (hc, block_chains), 1)
        seg = (lane_chain == col_chain).astype(bf16)       # (HC, C)
        ta3 = a3.astype(jnp.float32) * w4                  # (B, HC)
        f_mean = jnp.dot(
            ta3.astype(bf16), seg, preferred_element_type=jnp.float32
        ) + b4                                             # (B, C)
        # f_log_var = lvb broadcast (input-independent learned variance)

        # ---- likelihood + gradients at the head ---------------------------
        e_lv = jnp.exp(lvb)                                # (1, C)
        var_inv = 1.0 / (e_lv + 1e-16)
        diff = f_mean - y_sel                              # (B, C)
        mse = diff * diff
        ll = jnp.sum(-mse * (0.5 * var_inv) - 0.5 * lvb, axis=0,
                     keepdims=True) / b                    # (1, C)
        p_term = -jnp.square(lvb - log_mp) / (2.0 * var_p) \
            - 0.5 * float(np.log(var_p))
        ll = ll + p_term / n_data
        cost_ref[:] = -ll

        d_mean = diff * var_inv / b                        # dcost/df_mean
        # dcost/dlvb: likelihood term summed over batch + prior term
        d_lvb = jnp.sum(-(mse * (0.5 * e_lv) * var_inv * var_inv - 0.5),
                        axis=0, keepdims=True) / b * (-1.0)
        d_lvb = d_lvb + (lvb - log_mp) / var_p / n_data
        g_b4 = jnp.sum(d_mean, axis=0, keepdims=True)      # (1, C)

        # ---- backward ------------------------------------------------------
        d_mean_e = jnp.repeat(d_mean, h, axis=1)           # (B, HC)
        a3f = a3.astype(jnp.float32)
        g_w4 = jnp.sum(a3f * d_mean_e, axis=0, keepdims=True)
        dz3 = (d_mean_e * w4) * (1.0 - a3f * a3f)          # (B, HC)
        g_b3 = jnp.sum(dz3, axis=0, keepdims=True)

        dz3_bf = dz3.astype(bf16)

        def bwd_dots(a_prev, dz, w_bf):
            """Per chain: dW = a_prev_c^T dz_c ; da_prev = dz_c w_c^T."""
            gw = jnp.zeros((h, hc), jnp.float32)
            da = jnp.zeros((b, hc), jnp.float32)

            def body(c, carry):
                gw, da = carry
                a_c = jax.lax.dynamic_slice(a_prev, (0, c * h), (b, h))
                d_c = jax.lax.dynamic_slice(dz, (0, c * h), (b, h))
                w_c = jax.lax.dynamic_slice(w_bf, (0, c * h), (h, h))
                gw_c = jax.lax.dot_general(
                    a_c, d_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (H, H)
                da_c = jax.lax.dot_general(
                    d_c, w_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (B, H)
                gw = jax.lax.dynamic_update_slice(gw, gw_c, (0, c * h))
                da = jax.lax.dynamic_update_slice(da, da_c, (0, c * h))
                return gw, da

            return jax.lax.fori_loop(0, block_chains, body, (gw, da))

        g_w3, da2 = bwd_dots(a2, dz3_bf, w3_bf)
        a2f = a2.astype(jnp.float32)
        dz2 = da2 * (1.0 - a2f * a2f)
        g_b2 = jnp.sum(dz2, axis=0, keepdims=True)

        g_w2, da1 = bwd_dots(a1, dz2.astype(bf16), w2_bf)
        a1f = a1.astype(jnp.float32)
        dz1 = da1 * (1.0 - a1f * a1f)
        g_b1 = jnp.sum(dz1, axis=0, keepdims=True)
        g_w1 = jnp.sum(x_e * dz1, axis=0, keepdims=True)

        zeros_vrow = jnp.zeros((1, hc), jnp.float32)
        g_vec = jnp.concatenate(
            [g_w1, g_b1, g_b2, g_b3, g_w4] + [zeros_vrow] * (VEC_ROWS - 5),
            axis=0)
        zeros_srow = jnp.zeros((1, block_chains), jnp.float32)
        g_scal = jnp.concatenate(
            [g_b4, d_lvb] + [zeros_srow] * (SCAL_ROWS - 2), axis=0)

        # ---- fused SGHMC update --------------------------------------------
        if with_noise:
            etas = (nw2[:], nw3[:], nvec[:], nscal[:])
        else:
            etas = (
                _normal_from_bits((h, hc)),
                _normal_from_bits((h, hc)),
                _normal_from_bits((VEC_ROWS, hc)),
                _normal_from_bits((SCAL_ROWS, block_chains)),
            )

        groups = (
            (tw2, vw2, mw2, g_w2, ow2, pw2),
            (tw3, vw3, mw3, g_w3, ow3, pw3),
            (tvec, vvec, mvec, g_vec, ovec, pvec),
            (tscal, vscal, mscal, g_scal, oscal, pscal),
        )
        for (t_ref, v_ref, m_ref, grad, out_t, out_v), eta in zip(
            groups, etas
        ):
            t_new, v_new = _update_group(
                t_ref[:], v_ref[:], m_ref[:], grad, eta,
                eps, eps_scaled, mdecay, prior_scale)
            out_t[:] = t_new
            out_v[:] = v_new.astype(out_v.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mdecay", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "state_dtype", "interpret"),
)
def fused_bnn_step(
    theta, v, minv, xy_win, widx, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=64,
    state_dtype=jnp.bfloat16, noise=None, interpret=False,
):
    """One fused forward+backward+update SGHMC step.

    ``theta``/``v``/``minv`` are interleaved 4-tuples from
    :func:`pack_interleaved` (``v``/``minv`` may be ``state_dtype``);
    ``xy_win`` from :func:`data_windows`; ``widx`` an ``(1, n_chains)``
    int32 window index per chain; ``eps``/``seed`` traced scalars.

    Returns ``(theta', v', cost)`` with ``cost`` shaped ``(1, n_chains)``.
    """
    tw2, tw3, tvec, tscal = theta
    h = tw2.shape[0]
    n_chains = tscal.shape[1]
    hc = h * block_chains
    if (h * n_chains) % 128 or n_chains % block_chains:
        raise ValueError(
            "fused_bnn_step: need H*n_chains % 128 == 0 and n_chains "
            "divisible by block_chains; got H={}, n_chains={}, C={}".format(
                h, n_chains, block_chains))
    two_b, n_windows = xy_win.shape

    eps32 = jnp.asarray(eps, jnp.float32)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = jnp.stack([
        eps32, eps32 / jnp.sqrt(jnp.asarray(scale_grad, jnp.float32)),
        jnp.asarray(mdecay, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    def mat_spec():
        return pl.BlockSpec((h, hc), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    def vec_spec():
        return pl.BlockSpec((VEC_ROWS, hc), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    def scal_spec():
        return pl.BlockSpec((SCAL_ROWS, block_chains), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    def chain_row_spec():
        return pl.BlockSpec((1, block_chains), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    state_specs = [mat_spec(), mat_spec(), vec_spec(), scal_spec()]
    xy_spec = pl.BlockSpec((two_b, n_windows), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM)

    in_specs = (
        state_specs                      # theta
        + state_specs                    # v
        + state_specs                    # minv
        + [xy_spec, chain_row_spec()]    # data, window indices
    )
    operands = list(theta) + list(v) + list(minv) + [xy_win, widx]
    with_noise = noise is not None
    if with_noise:
        in_specs = in_specs + state_specs
        operands = operands + list(noise)

    out_shape = (
        tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta)
        + tuple(jax.ShapeDtypeStruct(t.shape, state_dtype) for t in theta)
        + (jax.ShapeDtypeStruct((1, n_chains), jnp.float32),)
    )
    out_specs = tuple(state_specs) + tuple(state_specs) + (chain_row_spec(),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chains // block_chains,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    # alias theta (operands 2..5 incl. scalar-prefetch args) and v (6..9)
    aliases = {i + 2: i for i in range(4)}
    aliases.update({i + 6: i + 4 for i in range(4)})

    kernel = _make_kernel(
        h, block_chains, batch_size, n_windows, float(n_data), with_noise)
    interpreter = pltpu.InterpretParams() if interpret else False
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)
    theta_new = tuple(outs[0:4])
    v_new = tuple(outs[4:8])
    cost = outs[8]
    return theta_new, v_new, cost

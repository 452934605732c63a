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

Design notes (probed on v5e, ``benchmarks/archive/megakernel_probe*.py``):

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

Examples
--------
>>> import jax, jax.numpy as jnp
>>> from pysgmcmc_tpu.models.architectures import dense_network
>>> init_fn, _ = dense_network(1)
>>> params = jax.vmap(init_fn)(jax.random.split(jax.random.PRNGKey(0), 2))
>>> big, w3m = pack_fused(params)
>>> (big.shape, w3m.shape)
((2, 72, 64), (2, 64, 64))
>>> out = unpack_fused((big, w3m), 50)
>>> bool(jnp.allclose(out["w2"], params["w2"]))
True
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
    """Standard normals from the in-kernel PRNG (dual-output Box-Muller).

    When the second-to-last dim is even, each (u1, u2) pair yields two
    normals (cos and sin), halving the transcendental cost — the kernel's
    noise covers the 1.64x-padded state slabs, so this matters.
    """
    rows = shape[-2]
    if rows % 2 == 0:
        half = shape[:-2] + (rows // 2,) + shape[-1:]
        u1 = _uniform_3d(half)
        u2 = _uniform_3d(half)
        radius = jnp.sqrt(-2.0 * jnp.log1p(-u1))
        angle = 2.0 * jnp.pi * u2
        return jnp.concatenate(
            [radius * jnp.cos(angle), radius * jnp.sin(angle)], axis=-2)
    u1 = _uniform_3d(shape)
    u2 = _uniform_3d(shape)
    return jnp.sqrt(-2.0 * jnp.log1p(-u1)) * jnp.cos(2.0 * jnp.pi * u2)


def _hadamard_pm1(n):
    """(n, n) +-1 Sylvester-Hadamard, bf16: ``H[i,j] = (-1)^popcount(i&j)``.

    Parity via an XOR fold (valid for n <= 256, i.e. 8 index bits) —
    shift/xor lowers on any int vreg, ``population_count`` would be a
    Mosaic lowering gamble.
    """
    assert n <= 256 and (n & (n - 1)) == 0, n
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    b = i & j
    b = b ^ (b >> 4)
    b = b ^ (b >> 2)
    b = b ^ (b >> 1)
    return (1 - 2 * (b & 1)).astype(jnp.bfloat16)


def _normal_clt(shape, hmat):
    """Standard normals WITHOUT transcendentals: fresh centered uniforms
    mixed along the lane axis by the +-1 Hadamard ``hmat`` in one MXU
    ``dot_general`` — ``z = (u - 1/2) @ H_n * sqrt(12 / n)``.

    The measured roofline (docs/performance.md) pinned Box-Muller's VPU
    transcendental chain as the fused kernels' single largest cost while
    the MXU idles under it; this moves normal generation onto the MXU.
    Statistics: ``Cov(z) = I`` exactly up to the bf16 rounding of the
    uniforms (~2^-18 relative) — H's columns are orthogonal and the
    scale is exact; marginals are Irwin-Hall(n) with excess kurtosis
    ``-1.2/n`` (-0.009 at n=128) and support ``+-sqrt(3n)`` (+-19.6
    sigma at n=128).  The uniform bits are FRESH every call, so
    successive draws stay exactly independent (unlike Wallace-pool
    generators).  SG-MCMC's invariant-distribution error sees the
    injected noise only through its moments (Chen et al. 2014), so the
    O(1/n) fourth-moment deficit sits far below the O(eps)
    discretization bias every sampler here already accepts.  The
    distribution is pinned on hardware by
    ``benchmarks/archive/noise_clt_tpu.py``'s gates and end-to-end by
    the bench quality gate.
    """
    c, rows, n = shape
    u = _uniform_3d((c, rows, n)) - 0.5
    flat = u.astype(jnp.bfloat16).reshape(c * rows, n)
    z = jax.lax.dot_general(
        flat, hmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return z.reshape(c, rows, n) * np.float32(np.sqrt(12.0 / n))


def _noise_hmats(noise_impl, s):
    """Resolve a ``noise_impl`` name to :func:`_block_etas`'s ``hmats``.

    Returns ``None`` for ``'box_muller'``, ``(H_2s, H_s)`` for
    ``'hadamard_clt'``; raises on anything else.  Call OUTSIDE any
    in-kernel loop: XLA does not hoist loop-invariant code out of
    ``fori_loop`` bodies, so the Hadamard constants must be built once
    per launch, not once per step.
    """
    if noise_impl == "box_muller":
        return None
    if noise_impl != "hadamard_clt":
        raise ValueError(
            "noise_impl must be 'box_muller' or 'hadamard_clt'; got "
            + repr(noise_impl))
    return (_hadamard_pm1(2 * s), _hadamard_pm1(s))


def _block_etas(c, s=None, bias_row=None, n_mats=2, hmats=None):
    """``(eta_w2, eta_vec, *eta_mats)`` for one chain block, full-width.

    The kernel's ``(C, ., s)`` slabs with ``s = 64`` occupy only HALF of
    each physical (8, 128)-lane f32 register, so per-slab generation
    wastes half the VPU's transcendental throughput (the round-2
    formulation).  One ``(C, s, 2s)`` draw runs the Box-Muller logs/trigs
    at full lane width; each PAIR of matrix-slab etas is its two static
    s-lane halves (an odd trailing slab gets its own ``(C, s, s)`` draw
    — rows are even, so Box-Muller still runs dual-output), and the tiny
    vector-rows eta is a separate draw.  ``n_mats`` counts the matrix
    slabs: ``depth - 1`` (2 for the flagship depth 3, whose draw order
    this reproduces exactly).

    No masking of the dead padding rows is needed: the SGHMC update
    multiplies noise by ``minv`` zeros there (and concatenating the
    lane-sliced halves with fresh zeros is a Mosaic landmine anyway —
    ``tpu.concatenate`` rejects operands whose non-concat lane OFFSETS
    differ, which a ``[:, :, s:2s]`` slice produces).

    With ``hmats`` (the :func:`_noise_hmats` pair), every draw routes
    through the transcendental-free MXU generator :func:`_normal_clt`
    instead of Box-Muller — same shapes, same draw layout, a different
    (still fresh-per-call) stream.
    """
    if s is None:
        s = S
    del bias_row  # dead rows are masked by minv == 0, not by the draw
    if hmats is None:
        draw = _normal_3d
    else:
        def draw(shape):
            return _normal_clt(
                shape, hmats[0] if shape[-1] == 2 * s else hmats[1])
    mat_etas = []
    for _ in range(n_mats // 2):
        eta = draw((c, s, 2 * s))
        mat_etas += [eta[:, :, 0:s], eta[:, :, s:2 * s]]
    if n_mats % 2:
        mat_etas.append(draw((c, s, s)))
    eta_vec = draw((c, VEC_ROWS, s))
    return (mat_etas[0], eta_vec) + tuple(mat_etas[1:])


S = 64        # per-chain matrix slot (both dims); fits H = 50

# Scoped VMEM budget for the whole-step kernels.  v5e has 128 MB of
# physical VMEM; the compiler's default 16 MB scoped budget is too tight
# for the double-buffered state slabs plus dot temporaries at useful
# block sizes.  100 MB admits the flagship (depth 3, H=50) at 128-chain
# blocks; the depth-4 slab set needs 113 MB there and runs at block 64
# instead (measured OOM — benchmarks/results_block_ab.json context).
VMEM_LIMIT_BYTES = 100 * 1024 * 1024
B_PAD = 24    # padded batch rows (B = 20)
BIAS_ROW = 50  # biases ride row 50 of their weight matrix (ones-lane trick)
VEC_ROWS = 8  # [w1 (n_inputs rows), b1, w4, (b4, lvb), 0...]
# w1 rows + b1 + w4 + scal must fit, AND the last row must stay free:
# the per-chain cost is written to (row BIG_ROWS-1, lane LANE_B4) of the
# theta slab, so the scal row may never be the last row
MAX_INPUTS = VEC_ROWS - 4
# The vector rows live INSIDE the first state array (rows S..S+VEC_ROWS of
# a (S+8, S) slab): XLA's memory-space assignment promotes small separate
# outputs into scoped VMEM, which OOMs at 8192 chains; matrix-shaped
# buffers stay in HBM.
BIG_ROWS = S + VEC_ROWS
ROW_W1 = S + 0
LANE_B4, LANE_LVB = 0, 1


def _vec_rows(n_inputs, s=S):
    """(row_b1, row_w4, row_scal) for a given input dimension and slot."""
    if not 1 <= n_inputs <= MAX_INPUTS:
        raise ValueError(
            "fused step supports 1..{} input features; got {}".format(
                MAX_INPUTS, n_inputs))
    row_scal = s + n_inputs + 2
    assert row_scal < s + VEC_ROWS - 1, (
        "scal row would collide with the cost row")
    return s + n_inputs, s + n_inputs + 1, row_scal


ROW_B1, ROW_W4, ROW_SCAL = _vec_rows(1)  # the flagship 1-input layout

# Wide-slot layout: S = 128 lifts the hidden width to H <= 114 (the bias
# rides row 114, mirroring the 13-row slack of the S=64 design).  Same
# kernel formulation; the slot size and bias row thread through as static
# parameters, so each (slot, n_inputs) pair is one compiled kernel.
WIDE_S = 128
WIDE_BIAS_ROW = 114


def fused_slot(h):
    """(s, bias_row) for hidden width ``h``: 64-slot up to 50, 128 to 114."""
    if h <= BIAS_ROW:
        return S, BIAS_ROW
    if h <= WIDE_BIAS_ROW:
        return WIDE_S, WIDE_BIAS_ROW
    raise ValueError(
        "fused kernels support hidden widths up to {} (got {}); use the "
        "chains-on-lanes path for wider networks".format(WIDE_BIAS_ROW, h))

LOG_MP = float(np.log(1e-6))   # log-variance prior mean (reference)
VAR_P = 0.01                   # log-variance prior variance


#  Packing ------------------------------------------------------------------

MIN_DEPTH, MAX_DEPTH = 2, 4  # hidden tanh layers the fused family packs


def fused_depth(params):
    """Number of hidden layers in a stacked dense-network pytree.

    ``w{depth+1}`` is the head; depth 2-4 is the fused family's range
    (:data:`MIN_DEPTH`/:data:`MAX_DEPTH` — one to three ``(H, H)``
    matrix slabs within the VMEM budget).  The reference's pluggable
    ``get_net`` (``/root/reference/pysgmcmc/models/bayesian_neural_
    network.py:363``) motivates the parametric range; wider topologies
    use the chains-on-lanes or pytree paths.
    """
    depth = sum(1 for k in params if k.startswith("w")) - 1
    if not MIN_DEPTH <= depth <= MAX_DEPTH:
        raise ValueError(
            "fused kernels support {}-{} hidden dense layers; got a "
            "{}-hidden-layer network (use the chains-on-lanes path)".format(
                MIN_DEPTH, MAX_DEPTH, depth))
    return depth


def pack_fused(params):
    """Stacked dense-network params -> ``(big, *mats)`` fused layout.

    ``params`` is a stacked :func:`pysgmcmc_tpu.models.architectures.
    dense_network` pytree (leaves ``(n, ...)``) with 2-4 equal-width
    hidden layers.  Returns a tuple of float32 arrays:

    - ``big: (n, S+8, S)`` — W2 in the top-left ``(H, H)``, its bias on
      row :data:`BIAS_ROW` (activations carry a constant-1 lane there, so
      the bias rides the matmul and its gradient falls out of the dW dot
      automatically), and the vector rows ``[w1, b1, head_w, (head_b,
      lvb), 0...]`` at rows ``S..S+8`` (separate small outputs would be
      promoted into scoped VMEM by XLA and OOM the kernel).
    - one ``(n, S, S)`` slab per REMAINING hidden matrix (``W3`` for the
      flagship depth 3; ``W3, W4`` at depth 4; none at depth 2), each
      with its bias on the bias row.
    """
    depth = fused_depth(params)
    head = depth + 1
    n, h, _ = params["w2"].shape
    s, bias_row = fused_slot(h)

    def mat(wkey, bkey):
        m = jnp.pad(
            jnp.asarray(params[wkey], jnp.float32),
            ((0, 0), (0, s - h), (0, s - h)))
        brow = jnp.pad(
            jnp.asarray(params[bkey], jnp.float32), ((0, 0), (0, s - h)))
        return m.at[:, bias_row, :].set(brow)

    def row(leaf):
        leaf = jnp.asarray(leaf, jnp.float32).reshape(n, -1)
        return jnp.pad(leaf, ((0, 0), (0, s - leaf.shape[1])))

    scal = jnp.concatenate(
        [jnp.reshape(params["b{}".format(head)], (n, 1)),
         jnp.reshape(params["log_variance_bias"], (n, 1))], axis=1)
    zero = jnp.zeros((n, s), jnp.float32)
    w1 = jnp.asarray(params["w1"], jnp.float32)
    w1_rows = (
        [row(w1)] if w1.ndim == 2
        else [row(w1[:, i]) for i in range(w1.shape[1])]
    )
    _vec_rows(len(w1_rows), s)  # validates the input dimension
    rows = w1_rows + [
        row(params["b1"]), row(params["w{}".format(head)]), row(scal)]
    rows += [zero] * (VEC_ROWS - len(rows))
    vec = jnp.stack(rows, axis=1)
    big = jnp.concatenate([mat("w2", "b2"), vec], axis=1)  # (n, s+8, s)
    return (big,) + tuple(
        mat("w{}".format(i), "b{}".format(i)) for i in range(3, head))


def unpack_fused(packed, h, n_inputs=1):
    """Inverse of :func:`pack_fused` -> stacked dense-network pytree.

    The depth is carried by the tuple length (``len(packed) - 1`` extra
    matrix slabs beyond ``big``'s W2)."""
    big = packed[0]
    mats = packed[1:]
    depth = 2 + len(mats)
    head = depth + 1
    n = big.shape[0]
    s = big.shape[1] - VEC_ROWS
    bias_row = fused_slot(h)[1]
    row_b1, row_w4, row_scal = _vec_rows(n_inputs, s)
    w1 = (
        big[:, s, :h] if n_inputs == 1
        else big[:, s:row_b1, :h]
    )
    out = {
        "w1": w1,
        "b1": big[:, row_b1, :h],
        "w2": big[:, :h, :h],
        "b2": big[:, bias_row, :h],
        "w{}".format(head): big[:, row_w4, :h],
        "b{}".format(head): big[:, row_scal, LANE_B4].reshape(n, 1),
        "log_variance_bias": big[:, row_scal, LANE_LVB].reshape(n, 1, 1),
    }
    for i, m in enumerate(mats):
        out["w{}".format(i + 3)] = m[:, :h, :h]
        out["b{}".format(i + 3)] = m[:, bias_row, :h]
    return out


def data_windows(x, y, batch_size):
    """Contiguous minibatch windows padded to ``B_PAD`` rows.

    Returns ``(x_win, y_win)`` of shape ``(n_windows, B_PAD)`` with
    ``x_win[w, b] = x[w + b]`` for ``b < batch_size`` and zeros beyond —
    window semantics of :func:`pysgmcmc_tpu.data_batches.batch_fn`.
    Traceable (static slices only), so it can live inside a jitted driver.
    """
    if batch_size > B_PAD:
        raise ValueError(
            "data_windows: batch_size {} exceeds the kernel's padded "
            "batch rows ({})".format(batch_size, B_PAD))
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    n, k = x.shape
    n_windows = n - batch_size + 1
    pad_rows = B_PAD - batch_size
    xw = jnp.concatenate(
        [jnp.stack([x[b:b + n_windows] for b in range(batch_size)], axis=1),
         jnp.zeros((n_windows, pad_rows, k), jnp.float32)], axis=1)
    if k == 1:
        xw = xw[:, :, 0]                      # (n_windows, B_PAD)
    yw = jnp.concatenate(
        [jnp.stack([y[b:b + n_windows] for b in range(batch_size)], axis=1),
         jnp.zeros((n_windows, pad_rows), jnp.float32)], axis=1)
    return xw, yw


def gather_batch(x_win, y_win, widx):
    """One-hot MXU gather of each chain's window.

    Returns ``x_sel`` of shape ``(n, B_PAD)`` (1-D inputs) or
    ``(n, B_PAD, k)`` and ``y_sel`` of shape ``(n, B_PAD)``."""
    n_windows = x_win.shape[0]
    onehot = jax.nn.one_hot(widx, n_windows, dtype=jnp.float32)
    if x_win.ndim == 3:
        w, b, k = x_win.shape
        x_sel = (onehot @ x_win.reshape(w, b * k)).reshape(-1, b, k)
    else:
        x_sel = onehot @ x_win
    return x_sel, onehot @ y_win


#  Kernel -------------------------------------------------------------------

def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, ((contract[0], contract[1]), batch),
        preferred_element_type=jnp.float32)


def _make_kernel_paired(batch_size, n_data, block_chains):
    """flash-SGHMC kernel variant: 2-chain paired MXU dots.

    The standard kernel's (B,64)@(64,64) batched dots contract over only
    half the MXU's 128-deep systolic array and are instance-overhead
    bound (~54 ns/dot vs ~1 ns of pure FLOP time).  This variant packs
    chain pairs into block-diagonal (128, 128) operands so every dot
    contracts the full depth and the instance count halves — trading 2x
    padded FLOPs (free) for half the per-dot overhead.  In-kernel-RNG
    noise only (no injection path); block_chains must be even.
    """
    bf16 = jnp.bfloat16
    inv_b = 1.0 / batch_size
    inv_n = 1.0 / n_data
    C = block_chains
    Cp = C // 2

    def pair_mats(m):
        # (C, S, S) -> block-diag (Cp, 2S, 2S)
        r = m.reshape(Cp, 2, S, S)
        a, b = r[:, 0], r[:, 1]
        zero = jnp.zeros_like(a)
        top = jnp.concatenate([a, zero], axis=2)
        bot = jnp.concatenate([zero, b], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    def pair_lanes(m):
        # (C, B, S) -> (Cp, B, 2S): chain pair side by side on lanes
        r = m.reshape(Cp, 2, B_PAD, S)
        return jnp.concatenate([r[:, 0], r[:, 1]], axis=2)

    def unpair_lanes(m):
        # (Cp, B, 2S) -> (C, B, S)
        return jnp.stack([m[:, :, 0:S], m[:, :, S:2 * S]],
                         axis=1).reshape(C, B_PAD, S)

    def unpair_mats(m):
        # block-diag (Cp, 2S, 2S) -> (C, S, S), discarding cross blocks
        return jnp.stack([m[:, 0:S, 0:S], m[:, S:2 * S, S:2 * S]],
                         axis=1).reshape(C, S, S)

    def kernel(int_ref, float_ref,
               tbig, tw3,
               vbig, vw3,
               mbig, mw3,
               xin_ref, y_ref,
               obig, ow3, pbig, pw3,
               s_a1, s_a2, s_a3, s_gvec):
        pltpu.prng_seed(int_ref[0], pl.program_id(0))
        eps = float_ref[0]
        eps_scaled = float_ref[1]
        mdecay = float_ref[2]
        prior_scale = float_ref[3]

        brow = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD), 1)
        bmask = (brow < batch_size).astype(jnp.float32)
        lane3p = jax.lax.broadcasted_iota(
            jnp.int32, (Cp, B_PAD, 2 * S), 2)
        bias_lane_p = (lane3p % S) == BIAS_ROW

        big = tbig[:]
        w4 = big[:, ROW_W4, :]
        scal = big[:, ROW_SCAL, :]
        b4 = scal[:, LANE_B4:LANE_B4 + 1]
        lvb = scal[:, LANE_LVB:LANE_LVB + 1]

        xin = xin_ref[:]                                     # (C, B, 2)
        y = y_ref[:]

        # paired layer-1 operand: (Cp, B, 4) lanes [xa, 1a, xb, 1b]
        xr = xin.astype(bf16).reshape(Cp, 2, B_PAD, 2)
        xinp = jnp.concatenate([xr[:, 0], xr[:, 1]], axis=2)
        w1m = big[:, ROW_W1:ROW_B1 + 1, :]                   # (C, 2, S)
        w1r = w1m.reshape(Cp, 2, 2, S)
        z14 = jnp.zeros((Cp, 2, S), jnp.float32)
        w1p = jnp.concatenate([
            jnp.concatenate([w1r[:, 0], z14], axis=2),
            jnp.concatenate([z14, w1r[:, 1]], axis=2),
        ], axis=1).astype(bf16)                              # (Cp, 4, 2S)

        w2p = pair_mats(big[:, 0:S, :]).astype(bf16)         # (Cp, 2S, 2S)
        w3p = pair_mats(tw3[:]).astype(bf16)

        # ---- forward (paired) ---------------------------------------------
        z1 = _bdot(xinp, w1p, (((2,), (1,))))                # (Cp, B, 2S)
        s_a1[:] = unpair_lanes(
            jnp.where(bias_lane_p, 1.0, jnp.tanh(z1))).astype(bf16)
        a1p = pair_lanes(s_a1[:].astype(jnp.float32)).astype(bf16)
        z2 = _bdot(a1p, w2p, (((2,), (1,))))
        s_a2[:] = unpair_lanes(
            jnp.where(bias_lane_p, 1.0, jnp.tanh(z2))).astype(bf16)
        a2p = pair_lanes(s_a2[:].astype(jnp.float32)).astype(bf16)
        z3 = _bdot(a2p, w3p, (((2,), (1,))))
        s_a3[:] = unpair_lanes(jnp.tanh(z3)).astype(bf16)
        a3f = s_a3[:].astype(jnp.float32)                    # (C, B, S)
        f_mean = jnp.sum(a3f * w4[:, None, :], axis=2) + b4

        # ---- likelihood (unpaired 2D) -------------------------------------
        e_lv = jnp.exp(lvb)
        var_inv = 1.0 / (e_lv + 1e-16)
        diff = (f_mean - y) * bmask
        mse = diff * diff
        ll = jnp.sum(
            -mse * (0.5 * var_inv) - 0.5 * lvb * bmask,
            axis=1, keepdims=True) * inv_b
        p_term = -jnp.square(lvb - LOG_MP) / (2.0 * VAR_P) \
            - 0.5 * float(np.log(VAR_P))
        cost = -(ll + p_term * inv_n)
        d_mean = diff * var_inv * inv_b
        d_lvb = -jnp.sum(
            mse * (0.5 * e_lv) * jnp.square(var_inv) - 0.5 * bmask,
            axis=1, keepdims=True) * inv_b
        d_lvb = d_lvb + (lvb - LOG_MP) / VAR_P * inv_n
        g_b4 = jnp.sum(d_mean, axis=1, keepdims=True)

        # ---- backward (paired dots) ---------------------------------------
        g_w4 = jnp.sum(a3f * d_mean[:, :, None], axis=1)
        dz3 = (d_mean[:, :, None] * w4[:, None, :]) * (1.0 - a3f * a3f)
        dz3p = pair_lanes(dz3).astype(bf16)
        g_w3 = unpair_mats(_bdot(a2p, dz3p, (((1,), (1,)))))
        da2 = unpair_lanes(_bdot(dz3p, w3p, (((2,), (2,)))))
        a2f = s_a2[:].astype(jnp.float32)
        dz2 = da2 * (1.0 - a2f * a2f)
        dz2p = pair_lanes(dz2).astype(bf16)
        g_w2 = unpair_mats(_bdot(a1p, dz2p, (((1,), (1,)))))
        da1 = unpair_lanes(_bdot(dz2p, w2p, (((2,), (2,)))))
        a1f = s_a1[:].astype(jnp.float32)
        dz1 = da1 * (1.0 - a1f * a1f)
        dz1p = pair_lanes(dz1).astype(bf16)
        g_w1p = _bdot(xinp, dz1p, (((1,), (1,))))            # (Cp, 4, 2S)
        g_w1m = jnp.stack(
            [g_w1p[:, 0:2, 0:S], g_w1p[:, 2:4, S:2 * S]],
            axis=1).reshape(C, 2, S)

        lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)
        g_scal = jnp.where(
            lane2 == LANE_B4, g_b4,
            jnp.where(lane2 == LANE_LVB, d_lvb, 0.0),
        ).astype(jnp.float32)
        s_gvec[:, 0:2, :] = g_w1m
        s_gvec[:, ROW_W4 - S, :] = g_w4
        s_gvec[:, ROW_SCAL - S, :] = g_scal
        s_gvec[:, ROW_SCAL - S + 1:VEC_ROWS, :] = jnp.zeros(
            (C, VEC_ROWS - (ROW_SCAL - S) - 1, S), jnp.float32)
        g_vec = s_gvec[:]

        etas = (
            _normal_3d((C, S, S)),
            _normal_3d((C, VEC_ROWS, S)),
            _normal_3d((C, S, S)),
        )

        def _update(theta, v, minv, grad, eta):
            v32 = v.astype(jnp.float32)
            minv = minv.astype(jnp.float32)
            g = grad + prior_scale * theta
            sigma = jnp.sqrt(jnp.maximum(
                2.0 * eps_scaled**2 * mdecay * minv - eps_scaled**4,
                1e-16))
            v_new = v32 - eps**2 * minv * g - mdecay * v32 + sigma * eta
            v_new = jnp.where(minv > 0.0, v_new, 0.0)
            return theta + v_new, v_new

        t_new, v_new = _update(
            tbig[:, 0:S, :], vbig[:, 0:S, :], mbig[:, 0:S, :],
            g_w2, etas[0])
        obig[:, 0:S, :] = t_new
        pbig[:, 0:S, :] = v_new.astype(pbig.dtype)
        t_new, v_new = _update(
            tbig[:, S:BIG_ROWS, :], vbig[:, S:BIG_ROWS, :],
            mbig[:, S:BIG_ROWS, :], g_vec, etas[1])
        obig[:, S:BIG_ROWS, :] = t_new
        pbig[:, S:BIG_ROWS, :] = v_new.astype(pbig.dtype)
        t_new, v_new = _update(tw3[:], vw3[:], mw3[:], g_w3, etas[2])
        ow3[:] = t_new
        pw3[:] = v_new.astype(pw3.dtype)

        obig[:, BIG_ROWS - 1, LANE_B4:LANE_B4 + 1] = cost

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mdecay", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "state_dtype",
                     "select_in_kernel", "pair_dots", "n_inputs",
                     "noise_impl", "interpret"),
)
def fused_bnn_step(
    theta, v, minv, x_sel, y_sel, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=64,
    state_dtype=jnp.bfloat16, select_in_kernel=False, pair_dots=False,
    n_inputs=1, noise=None, noise_impl="box_muller", interpret=False,
):
    """One fused forward+backward+update SGHMC step.

    ``theta`` is a ``(big, w3m)`` tuple from :func:`pack_fused`
    (float32); ``v``/``minv`` the same shapes in ``state_dtype``;
    ``x_sel``/``y_sel`` the gathered minibatch ``(n_chains, B_PAD)``
    (see :func:`gather_batch`); ``eps``/``seed`` traced scalars.

    Returns ``(theta', v', cost)`` with ``cost`` shaped ``(n_chains, 1)``.
    """
    if noise is not None and noise_impl != "box_muller":
        raise ValueError(
            "noise_impl selects the in-kernel PRNG generator; it does "
            "not combine with injected noise arrays")
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_step: n_chains ({}) must be divisible by "
            "block_chains ({})".format(n_chains, block_chains))
    s = tbig.shape[2]
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW

    if select_in_kernel:
        # x_sel/y_sel are the SHARED minibatch window tables from
        # :func:`data_windows`; the kernel draws each chain's window from
        # its own PRNG stream and gathers in VMEM -- no per-step selection
        # traffic at all.  Incompatible with noise injection (the PRNG is
        # only seeded on the in-kernel-noise path).
        if noise is not None:
            raise ValueError(
                "select_in_kernel does not combine with injected noise")
        if n_inputs != 1:
            raise ValueError(
                "select_in_kernel supports n_inputs=1 only; the "
                "multi-step kernels cover the multi-input case")
        n_windows = x_sel.shape[0]
        xin = jnp.asarray(x_sel, jnp.float32)
        y_sel = jnp.asarray(y_sel, jnp.float32)
    else:
        n_windows = None
        # layer-1 input lanes [x.., 1]: the constant lane carries b1
        # through the first matmul (and its gradient through the g_w1m
        # dot).  bf16: the kernel casts it for the MXU anyway, and the
        # (C, B, k+1) block pads its lanes to 128 physically
        xin = _fused_xin(x_sel, n_inputs)

    eps32 = jnp.asarray(eps, jnp.float32)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = jnp.stack([
        eps32, eps32 / jnp.sqrt(jnp.asarray(scale_grad, jnp.float32)),
        jnp.asarray(mdecay, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    if select_in_kernel:
        data_specs = [_table_spec(xin), _table_spec(y_sel)]
    else:
        data_specs = list(_batch_specs(block_chains, n_inputs))
    with_noise = noise is not None

    if pair_dots:
        if s != 64:
            raise ValueError("pair_dots supports the 64-slot layout only")
        if with_noise or select_in_kernel:
            raise ValueError(
                "pair_dots does not combine with noise injection or "
                "select_in_kernel")
        if block_chains % 2:
            raise ValueError("pair_dots requires an even block_chains")
        if n_inputs != 1:
            raise ValueError("pair_dots supports n_inputs=1 only")
        if n_extra != 1:
            raise ValueError(
                "pair_dots supports the flagship 3-hidden-layer "
                "topology only")
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_kernel_paired(
            float(batch_size), float(n_data), block_chains)
    else:
        kernel = _make_kernel_family(
            RULE_SGHMC, float(batch_size), float(n_data), with_noise,
            block_chains, n_inputs, 0, s=s, bias_row=bias_row,
            n_windows=n_windows, n_extra=n_extra, noise_impl=noise_impl)
    theta_new, v_new, _, cost = _family_call(
        RULE_SGHMC, kernel, theta, v, None, minv,
        [xin, y_sel], data_specs, noise, state_dtype, block_chains,
        interpret, False, int_scalars, float_scalars)
    return theta_new, v_new, cost


#  Multi-step kernel: k steps per launch, state resident in VMEM -------------

def _select_window_bf(c, n_windows, win_iota, xw_ref, yw_ref, n_inputs=1):
    """In-kernel minibatch window selection, shared by every multi-step
    kernel: draw a per-chain window index from the in-kernel PRNG and
    gather the (x, y) window with one masked dot per feature against the
    shared tables.  ``xw_ref`` is ``(n_windows, B_PAD)`` for 1 input or
    feature-major ``(n_inputs, n_windows, B_PAD)`` for multi-input (the
    drivers transpose :func:`data_windows` output).  Returns
    ``(xin_bf, y)`` — the bf16 ``[x.., 1]`` input lanes and the f32
    targets."""
    u = _uniform_3d((c, 8))[:, 0:1]
    widx = jnp.clip((u * n_windows).astype(jnp.int32), 0, n_windows - 1)
    onehot = (win_iota == widx).astype(jnp.float32)

    def gather(table):
        return jax.lax.dot_general(
            onehot, table, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if n_inputs == 1:
        parts = [gather(xw_ref[:])]
    else:
        parts = [gather(xw_ref[i]) for i in range(n_inputs)]
    y = gather(yw_ref[:])
    xin_bf = jnp.stack(
        parts + [jnp.ones_like(parts[0])], axis=2).astype(jnp.bfloat16)
    return xin_bf, y


def _mat_spec(block_chains, s=S):
    """Per-block ``(C, s, s)`` VMEM slab spec, blocked on the chain axis."""
    return pl.BlockSpec((block_chains, s, s), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _big_spec(block_chains, s=S):
    """Per-block ``(C, s+VEC_ROWS, s)`` VMEM slab spec (matrix + vec rows)."""
    return pl.BlockSpec(
        (block_chains, s + VEC_ROWS, s), lambda i, *_: (i, 0, 0),
        memory_space=pltpu.VMEM)


def _table_spec(arr):
    """Whole-array VMEM spec for grid-invariant shared window tables."""
    return pl.BlockSpec(tuple(arr.shape), lambda i, *_: (0,) * arr.ndim,
                        memory_space=pltpu.VMEM)


def _multistep_tables(x_win, name):
    """Normalize :func:`data_windows` x output for the multi-step kernels.

    Returns ``(n_windows, n_inputs, xw_op)`` where ``xw_op`` is the
    kernel operand: the ``(n_windows, B_PAD)`` table itself for 1 input,
    or the feature-major ``(n_inputs, n_windows, B_PAD)`` transpose for
    multi-input (so the kernel gathers each feature with one 2-D dot
    against a leading-dim slice)."""
    x_win = jnp.asarray(x_win, jnp.float32)
    if x_win.ndim == 2:
        return x_win.shape[0], 1, x_win
    if x_win.ndim == 3:
        n_inputs = x_win.shape[2]
        if not 1 <= n_inputs <= MAX_INPUTS:
            raise ValueError(
                "{}: supports 1..{} input features; got {}".format(
                    name, MAX_INPUTS, n_inputs))
        return x_win.shape[0], n_inputs, jnp.transpose(x_win, (2, 0, 1))
    raise ValueError(
        "{}: x_win must be (n_windows, B_PAD) or (n_windows, B_PAD, "
        "n_inputs) from data_windows; got shape {}".format(
            name, x_win.shape))


def _multistep_slot(tbig, name):
    """Validate and return the slot width of a packed multi-step slab."""
    s = tbig.shape[2]
    if s not in (S, WIDE_S):
        raise ValueError(
            "{}: unknown slot width {}; expected {} (H <= {}) or {} "
            "(H <= {})".format(name, s, S, BIAS_ROW, WIDE_S,
                               WIDE_BIAS_ROW))
    return s


def _multistep_scratch(block_chains, s=S, depth=3):
    """The fused kernels' standard scratch set: one bf16 activation slab
    per hidden layer + one f32 gradient-vector slab."""
    bbs = (block_chains, B_PAD, s)
    return [pltpu.VMEM(bbs, jnp.bfloat16) for _ in range(depth)] + [
        pltpu.VMEM((block_chains, VEC_ROWS, s), jnp.float32),
    ]


def _paired_scratch(block_chains, s=S, n_state_slabs=6):
    """Scratch set for the paired multi-step kernels: three PAIRED bf16
    activation slabs, the f32 gradient-vector slab, and
    ``n_state_slabs`` persistent paired (Cp, 2s, 2s) f32 state slabs
    (SGHMC: theta/v/minv for W2 and W3 = 6; momentum-free SGLD:
    theta/minv = 4)."""
    cp = block_chains // 2
    pbs = (cp, B_PAD, 2 * s)
    pms = (cp, 2 * s, 2 * s)
    return [
        pltpu.VMEM(pbs, jnp.bfloat16),
        pltpu.VMEM(pbs, jnp.bfloat16),
        pltpu.VMEM(pbs, jnp.bfloat16),
        pltpu.VMEM((block_chains, VEC_ROWS, s), jnp.float32),
    ] + [pltpu.VMEM(pms, jnp.float32) for _ in range(n_state_slabs)]


def _check_pair_dots(pair_dots, s, n_inputs, block_chains, n_group=2):
    """Validate a multi-step driver's pair_dots configuration."""
    if not pair_dots:
        return
    if s != S:
        raise ValueError("pair_dots supports the 64-slot layout only")
    if block_chains % 2:
        raise ValueError("pair_dots requires an even block_chains")
    if n_group != 2:
        raise ValueError(
            "pair_dots supports the flagship 3-hidden-layer topology "
            "only (got {} hidden layers); use pair_dots=False for other "
            "depths".format(n_group + 1))


def _pair_mats(m, cp, s):
    """(C, s, s) -> block-diagonal (Cp, 2s, 2s) chain-pair packing."""
    r = m.reshape(cp, 2, s, s)
    a, b = r[:, 0], r[:, 1]
    zero = jnp.zeros_like(a)
    top = jnp.concatenate([a, zero], axis=2)
    bot = jnp.concatenate([zero, b], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _unpair_mats(m, c, s):
    """Block-diagonal (Cp, 2s, 2s) -> (C, s, s), dropping cross blocks."""
    return jnp.stack([m[:, 0:s, 0:s], m[:, s:2 * s, s:2 * s]],
                     axis=1).reshape(c, s, s)


def _pair_lanes(m, cp):
    """(C, rows, k) -> (Cp, rows, 2k): chain pairs side by side on lanes."""
    rows, k = m.shape[1], m.shape[2]
    r = m.reshape(cp, 2, rows, k)
    return jnp.concatenate([r[:, 0], r[:, 1]], axis=2)


def _paired_fold_const(s):
    """Lane-fold constant: moves lanes s:2s down to 0:s via one 0/1
    selection dot (bitwise-exact).  Mosaic's concatenate rejects
    operands with mismatched lane offsets inside the fori_loop body
    (the round-3 landmine, docs/performance.md), so the chain-b halves
    cannot be lane-sliced and stacked directly.  Built ONCE per launch
    (outside the k-step loop — XLA does not hoist loop-invariant code
    out of while loops) and passed into :func:`_fwd_bwd_paired`."""
    rowp = jax.lax.broadcasted_iota(jnp.int32, (2 * s, s), 0)
    lanep = jax.lax.broadcasted_iota(jnp.int32, (2 * s, s), 1)
    return (rowp == lanep + s).astype(jnp.float32)


def _fwd_bwd_paired(big, w2_bf, w3_bf, xin_bf, y, bmask,
                    lane2, lane3p, bias_lane_p, first_half, p_move,
                    s_a1, s_a2, s_a3, s_gvec, inv_b, inv_n, C, s,
                    n_inputs=1):
    """Forward + heteroscedastic likelihood + backward with 2-chain
    PAIRED MXU dots — the paired-layout counterpart of :func:`_fwd_bwd`.

    ``big`` is the UNPAIRED (C, s+VEC_ROWS, s) slab (only its vector
    rows are read); ``w2_bf``/``w3_bf`` are the paired block-diagonal
    bf16 (Cp, 2s, 2s) weights; scratch activations are paired
    (Cp, B_PAD, 2s).  Every dot contracts the full 128-lane depth at
    half the instance count.  The likelihood runs 2-D on unpaired
    per-chain rows (cheap VPU work), exactly as in :func:`_fwd_bwd`.
    Returns ``(cost, g_w2p, g_vec, g_w3p)`` — the W2/W3 gradients in
    PAIRED layout (off-diagonal blocks carry cross-chain garbage that
    the caller's minv freeze must kill), the vector-rows gradient
    unpaired.  64-slot layout; 1..MAX_INPUTS input features.
    """
    bf16 = jnp.bfloat16
    Cp = C // 2
    row_b1, row_w4, row_scal = _vec_rows(n_inputs, s)
    row_w1 = s
    k1 = n_inputs + 1
    w4 = big[:, row_w4, :]
    scal = big[:, row_scal, :]
    b4 = scal[:, LANE_B4:LANE_B4 + 1]
    lvb = scal[:, LANE_LVB:LANE_LVB + 1]

    def pair_batch(r2):
        # (C, B) per-batch rows -> (Cp, B, 2s) half-broadcast.
        # NOTE: int-index + newaxis (``rr[:, 0, :, None]``) lowers to a
        # 3-D lax.gather, which Mosaic rejects ("Only 2D gather is
        # supported"); slice_in_dim keeps it a pure static slice.
        rr = r2.reshape(Cp, 2, B_PAD)
        half_a = jax.lax.slice_in_dim(rr, 0, 1, axis=1)  # (Cp, 1, B)
        half_b = jax.lax.slice_in_dim(rr, 1, 2, axis=1)
        return jnp.where(
            first_half,
            half_a.reshape(Cp, B_PAD)[:, :, None],
            half_b.reshape(Cp, B_PAD)[:, :, None])

    xinp = _pair_lanes(xin_bf, Cp)                   # (Cp, B, 2*k1)

    # paired layer-1 weights from the (unpaired) vector rows
    w1m = big[:, row_w1:row_b1 + 1, :]               # (C, k1, s)
    w1r = w1m.reshape(Cp, 2, k1, s)
    z14 = jnp.zeros((Cp, k1, s), jnp.float32)
    w1p = jnp.concatenate([
        jnp.concatenate([w1r[:, 0], z14], axis=2),
        jnp.concatenate([z14, w1r[:, 1]], axis=2),
    ], axis=1).astype(bf16)                          # (Cp, 2*k1, 2s)

    # ---- forward: every dot at full 128-lane depth ----
    z1 = _bdot(xinp, w1p, (((2,), (1,))))            # (Cp, B, 2s)
    s_a1[:] = jnp.where(bias_lane_p, 1.0, jnp.tanh(z1)).astype(bf16)
    a1 = s_a1[:]
    a1f = a1.astype(jnp.float32)
    z2 = _bdot(a1, w2_bf, (((2,), (1,))))
    s_a2[:] = jnp.where(bias_lane_p, 1.0, jnp.tanh(z2)).astype(bf16)
    a2 = s_a2[:]
    a2f = a2.astype(jnp.float32)
    z3 = _bdot(a2, w3_bf, (((2,), (1,))))
    s_a3[:] = jnp.tanh(z3).astype(bf16)
    a3f = s_a3[:].astype(jnp.float32)                # (Cp, B, 2s)

    # per-half lane sums -> unpaired (C, B) network mean
    w4p = _pair_lanes(w4[:, None, :], Cp)            # (Cp, 1, 2s)
    prod = a3f * w4p
    f_a = jnp.sum(prod[:, :, 0:s], axis=2)           # (Cp, B)
    f_b = jnp.sum(prod[:, :, s:2 * s], axis=2)
    f_mean = jnp.stack([f_a, f_b], axis=1).reshape(C, B_PAD) + b4

    # ---- likelihood + head gradients (2-D per-chain rows) ----
    e_lv = jnp.exp(lvb)
    var_inv = 1.0 / (e_lv + 1e-16)
    diff = (f_mean - y) * bmask
    mse = diff * diff
    ll = jnp.sum(
        -mse * (0.5 * var_inv) - 0.5 * lvb * bmask,
        axis=1, keepdims=True) * inv_b
    p_term = -jnp.square(lvb - LOG_MP) / (2.0 * VAR_P) \
        - 0.5 * float(np.log(VAR_P))
    cost = -(ll + p_term * inv_n)
    d_mean = diff * var_inv * inv_b
    d_lvb = -jnp.sum(
        mse * (0.5 * e_lv) * jnp.square(var_inv) - 0.5 * bmask,
        axis=1, keepdims=True) * inv_b
    d_lvb = d_lvb + (lvb - LOG_MP) / VAR_P * inv_n
    g_b4 = jnp.sum(d_mean, axis=1, keepdims=True)

    # ---- backward (paired dots; p_move = _paired_fold_const) ----
    d_mean_p = pair_batch(d_mean)                    # (Cp, B, 2s)
    g_w4p = jnp.sum(a3f * d_mean_p, axis=1)          # (Cp, 2s)
    g_w4b = jax.lax.dot_general(
        g_w4p, p_move, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Cp, s) offset-0
    g_w4 = jnp.stack([g_w4p[:, 0:s], g_w4b], axis=1).reshape(C, s)
    dz3_bf = (d_mean_p * w4p * (1.0 - a3f * a3f)).astype(bf16)
    g_w3p = _bdot(a2, dz3_bf, (((1,), (1,))))
    da2 = _bdot(dz3_bf, w3_bf, (((2,), (2,))))
    dz2_bf = (da2 * (1.0 - a2f * a2f)).astype(bf16)
    g_w2p = _bdot(a1, dz2_bf, (((1,), (1,))))
    da1 = _bdot(dz2_bf, w2_bf, (((2,), (2,))))
    dz1_bf = (da1 * (1.0 - a1f * a1f)).astype(bf16)
    g_w1p = _bdot(xinp, dz1_bf, (((1,), (1,))))      # (Cp, 2*k1, 2s)
    g_w1b3 = jax.lax.dot_general(
        g_w1p, p_move, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Cp, 2k1, s)
    g_w1m = jnp.stack(
        [g_w1p[:, 0:k1, 0:s], g_w1b3[:, k1:2 * k1, :]],
        axis=1).reshape(C, k1, s)

    g_scal = jnp.where(
        lane2 == LANE_B4, g_b4,
        jnp.where(lane2 == LANE_LVB, d_lvb, 0.0),
    ).astype(jnp.float32)
    s_gvec[:, 0:k1, :] = g_w1m
    s_gvec[:, row_w4 - s, :] = g_w4
    s_gvec[:, row_scal - s, :] = g_scal
    s_gvec[:, row_scal - s + 1:VEC_ROWS, :] = jnp.zeros(
        (C, VEC_ROWS - (row_scal - s) - 1, s), jnp.float32)
    return cost, g_w2p, s_gvec[:], g_w3p


@functools.partial(
    jax.jit,
    static_argnames=("mdecay", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "state_dtype", "k_steps",
                     "pair_dots", "noise_impl", "interpret"),
)
def fused_bnn_multistep(
    theta, v, minv, x_win, y_win, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=32,
    state_dtype=jnp.bfloat16, k_steps=1, pair_dots=False, noise_impl="box_muller", interpret=False,
):
    """``k_steps`` fused SGHMC steps in ONE kernel launch, VMEM-resident.

    ``theta``/``v``/``minv`` as in :func:`fused_bnn_step`;
    ``x_win``/``y_win`` are the SHARED window tables from
    :func:`data_windows` (each chain draws its window index from the
    in-kernel PRNG every step).  The per-chain cost of the final step is
    returned; intermediate states never leave VMEM.  1-input family,
    both slot layouts (64-slot H <= 50, 128-slot H <= 114).

    ``eps`` is a traced scalar (constant schedules) or a ``(k_steps,)``
    vector of per-step stepsizes — the kernel reads a per-step scalar
    row from SMEM, so step-varying schedules are exact (all multi-step
    family drivers accept the same).

    ``pair_dots=True`` runs the 2-chain paired-dot variant
    (:func:`_make_multistep_kernel_paired`): block-diagonal W2/W3 state
    packed once per launch so every MXU dot contracts the full 128-lane
    depth with half the instance count.  Same update semantics; the
    noise DRAW ORDER differs (one paired full-slab draw), so trajectories
    match the unpaired kernel only when the noise is degenerate (e.g.
    interpret mode's zero-bit PRNG).  64-slot layout / even
    ``block_chains`` only.

    Returns ``(theta', v', cost)``.
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    s = _multistep_slot(tbig, "fused_bnn_multistep")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_multistep: n_chains ({}) must be divisible by "
            "block_chains ({})".format(n_chains, block_chains))
    n_windows, n_inputs, xw_op = _multistep_tables(
        x_win, "fused_bnn_multistep")
    _check_pair_dots(pair_dots, s, n_inputs, block_chains,
                     n_group=len(theta))

    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    sg_sqrt = jnp.sqrt(jnp.asarray(scale_grad, jnp.float32))
    float_scalars = _per_step_table(eps, int(k_steps), lambda e: [
        e, e / sg_sqrt,
        jnp.full_like(e, mdecay), jnp.full_like(e, prior_scale)])

    if pair_dots:
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_multistep_kernel_family_paired(
            RULE_SGHMC, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), 0, n_inputs)
    else:
        kernel = _make_multistep_kernel_family(
            RULE_SGHMC, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), 0, s, bias_row, n_inputs,
            n_extra=n_extra, noise_impl=noise_impl)
    y_op = jnp.asarray(y_win, jnp.float32)
    theta_new, v_new, _, cost = _family_call(
        RULE_SGHMC, kernel, theta, v, None, minv,
        [xw_op, y_op], [_table_spec(xw_op), _table_spec(y_op)],
        None, state_dtype, block_chains, interpret, pair_dots,
        int_scalars, float_scalars)
    return theta_new, v_new, cost


#  Fused family: shared forward/backward --------------------------------------

def _fwd_bwd(big, mats, xin_bf, y, bmask, lane3, lane2,
             s_acts, s_gvec, inv_b, inv_n, n_inputs, C,
             s=S, bias_row=BIAS_ROW):
    """Forward + heteroscedastic likelihood + backward, shared by the
    fused-family kernels — parametric over the hidden depth.

    Exactly the formulation proven to compile on v5e (real layer-1
    matmul over the ``[x.., 1]`` lanes, ones-lane biases, VMEM scratch
    staging).  Operates on VALUES (``big`` + the list of extra ``(C, s,
    s)`` matrix slabs, float32) so callers can source the state from
    input refs (single-step kernels) or output refs (multi-step);
    ``mats`` is ``()`` at depth 2, ``(w3,)`` at the flagship depth 3,
    ``(w3, w4m)`` at depth 4 — a STATIC python list, so the layer chain
    unrolls at trace time (no in-kernel loop).  ``s_acts`` is one bf16
    activation scratch slab per hidden layer.  Returns
    ``(cost, g_w2, g_vec, g_mats)`` with ``g_mats`` matching ``mats``.
    """
    bf16 = jnp.bfloat16
    row_b1, row_w4, row_scal = _vec_rows(n_inputs, s)
    w4 = big[:, row_w4, :]
    scal = big[:, row_scal, :]
    b4 = scal[:, LANE_B4:LANE_B4 + 1]
    lvb = scal[:, LANE_LVB:LANE_LVB + 1]

    w1m_bf = big[:, s:row_b1 + 1, :].astype(bf16)
    z1 = _bdot(xin_bf, w1m_bf, (((2,), (1,))))
    # a1 always feeds a matrix layer (depth >= 2), so it always carries
    # the constant-1 bias lane
    s_acts[0][:] = jnp.where(
        lane3 == bias_row, 1.0, jnp.tanh(z1)).astype(bf16)
    acts = [s_acts[0][:]]

    mats_bf = [big[:, 0:s, :].astype(bf16)] + [m.astype(bf16) for m in mats]
    for j, m_bf in enumerate(mats_bf):
        z = _bdot(acts[-1], m_bf, (((2,), (1,))))
        act = jnp.tanh(z)
        if j + 1 < len(mats_bf):
            # interior layer: the constant-1 lane at bias_row rides the
            # NEXT matmul's bias row (its tanh' gradient is killed below)
            act = jnp.where(lane3 == bias_row, 1.0, act)
        s_acts[j + 1][:] = act.astype(bf16)
        acts.append(s_acts[j + 1][:])
    a_last_f = acts[-1].astype(jnp.float32)
    f_mean = jnp.sum(a_last_f * w4[:, None, :], axis=2) + b4

    e_lv = jnp.exp(lvb)
    var_inv = 1.0 / (e_lv + 1e-16)
    diff = (f_mean - y) * bmask
    mse = diff * diff
    ll = jnp.sum(
        -mse * (0.5 * var_inv) - 0.5 * lvb * bmask,
        axis=1, keepdims=True) * inv_b
    p_term = -jnp.square(lvb - LOG_MP) / (2.0 * VAR_P) \
        - 0.5 * float(np.log(VAR_P))
    cost = -(ll + p_term * inv_n)
    d_mean = diff * var_inv * inv_b
    d_lvb = -jnp.sum(
        mse * (0.5 * e_lv) * jnp.square(var_inv) - 0.5 * bmask,
        axis=1, keepdims=True) * inv_b
    d_lvb = d_lvb + (lvb - LOG_MP) / VAR_P * inv_n
    g_b4 = jnp.sum(d_mean, axis=1, keepdims=True)

    g_w4 = jnp.sum(a_last_f * d_mean[:, :, None], axis=1)
    dz_bf = ((d_mean[:, :, None] * w4[:, None, :])
             * (1.0 - a_last_f * a_last_f)).astype(bf16)
    g_mats_all = [None] * len(mats_bf)
    for j in reversed(range(len(mats_bf))):
        a_in = acts[j]
        g_mats_all[j] = _bdot(a_in, dz_bf, (((1,), (1,))))
        da = _bdot(dz_bf, mats_bf[j], (((2,), (2,))))
        a_in_f = a_in.astype(jnp.float32)
        dz_bf = (da * (1.0 - a_in_f * a_in_f)).astype(bf16)
    g_w1m = _bdot(xin_bf, dz_bf, (((1,), (1,))))

    g_scal = jnp.where(
        lane2 == LANE_B4, g_b4,
        jnp.where(lane2 == LANE_LVB, d_lvb, 0.0),
    ).astype(jnp.float32)
    s_gvec[:, 0:n_inputs + 1, :] = g_w1m
    s_gvec[:, row_w4 - s, :] = g_w4
    s_gvec[:, row_scal - s, :] = g_scal
    if row_scal - s + 1 < VEC_ROWS:
        s_gvec[:, row_scal - s + 1:VEC_ROWS, :] = jnp.zeros(
            (C, VEC_ROWS - (row_scal - s) - 1, s), jnp.float32)
    return cost, g_mats_all[0], s_gvec[:], list(g_mats_all[1:])


#  Update-rule specs: one per sampler, consumed by the kernel generators ------

class KernelRule:
    """Static per-sampler update-rule spec for the fused kernel generators.

    One rule + the three generators (:func:`_make_kernel_family`,
    :func:`_make_multistep_kernel_family`,
    :func:`_make_multistep_kernel_family_paired`) cover the whole fused
    BNN family — every sampler x {per-step, multi-step} x {unpaired,
    paired-dot} granularity.  Adding a sampler to the family means
    writing ONE update rule plus a public driver wrapper choosing its
    scalar layout; the forward/backward, window-selection, noise,
    masking, pairing and pallas_call scaffolding is shared.

    Fields:

    - ``aux``: the sampler carries a second aliased state slab set
      (momentum / preconditioner accumulator).  ``False`` only for SGLD.
    - ``minv``: masking comes from a READ-ONLY frozen mass-matrix-inverse
      operand set whose zeros freeze the padding (the ``where(minv > 0)``
      discipline of SGHMC/SGLD); otherwise static validity masks
      (:func:`_psgld_valid_masks`) are passed to the update (pSGLD,
      SGNHT, RSGHMC — samplers with no frozen phase).
    - ``xi``: a per-chain Nosé-Hoover thermostat rides a replicated
      aliased ``(C, 128)`` row; the generators collect each slab's
      kinetic energy from the updated momentum and apply
      ``xi' = xi + eps (p'Tp'/d - 1)`` with ``eps = float_ref[0]`` and
      ``1/d = float_ref[3]`` (Ding et al. 2014).
    - ``make_update(float_ref)``: unpacks the prefetched scalars and
      returns the per-slab rule
      ``update(theta, aux, grad, eta, mask, xi) -> (theta', aux')``
      (``aux``/``aux'`` are ``None`` when ``aux=False``; ``xi`` is
      ``None`` unless the rule uses it).  The rule owns the masking
      semantics — the generators only choose WHICH mask to pass
      (minv slab / static mask, unpaired / paired geometry).
    """

    def __init__(self, name, make_update, aux=True, minv=False, xi=False):
        self.name = name
        self.make_update = make_update
        self.aux = aux
        self.minv = minv
        self.xi = xi


def _sghmc_rule(float_ref):
    """SGHMC: Chen et al. momentum update with the frozen scale-adapted
    mass matrix — term order of :mod:`pysgmcmc_tpu.samplers.sghmc`
    (reference ``/root/reference/pysgmcmc/samplers/sghmc.py:211-243``)."""
    eps = float_ref[0]
    eps_scaled = float_ref[1]
    mdecay = float_ref[2]
    prior_scale = float_ref[3]

    def update(theta, v, grad, eta, minv, xi=None):
        v32 = v.astype(jnp.float32)
        minv = minv.astype(jnp.float32)
        g = grad + prior_scale * theta
        sigma = jnp.sqrt(jnp.maximum(
            2.0 * eps_scaled**2 * mdecay * minv - eps_scaled**4,
            1e-16))
        v_new = v32 - eps**2 * minv * g - mdecay * v32 + sigma * eta
        # padding slots have minv == 0 -> sigma floor 1e-8; kill even
        # that by masking on the (zero-initialized) minv itself
        v_new = jnp.where(minv > 0.0, v_new, 0.0)
        return theta + v_new, v_new

    return update


def _sgld_rule(float_ref):
    """SGLD: Welling & Teh momentum-free update with the frozen ``minv``
    (:mod:`pysgmcmc_tpu.samplers.sgld` semantics)."""
    eps = float_ref[0]
    a_coef = float_ref[1]
    a_over_sg = float_ref[2]
    prior_scale = float_ref[3]

    def update(theta, v, grad, eta, minv, xi=None):
        minv = minv.astype(jnp.float32)
        g = grad + prior_scale * theta
        sigma = jnp.sqrt(jnp.maximum(
            2.0 * eps * minv * a_over_sg, 0.0))
        delta = -eps * minv * a_coef * g + sigma * eta
        return theta + jnp.where(minv > 0.0, delta, 0.0), None

    return update


def _psgld_rule(float_ref):
    """pSGLD: RMSprop-preconditioned update, accumulator adapting every
    step (:mod:`pysgmcmc_tpu.samplers.psgld` semantics)."""
    eps = float_ref[0]
    alpha = float_ref[1]
    lam = float_ref[2]
    inv_sg = float_ref[3]
    prior_scale = float_ref[4]

    def update(theta, v, grad, eta, valid, xi=None):
        v32 = v.astype(jnp.float32)
        g = grad + prior_scale * theta
        v_new = alpha * v32 + (1.0 - alpha) * g * g
        precond = 1.0 / (lam + jnp.sqrt(jnp.maximum(v_new, 0.0)))
        sigma = jnp.sqrt(jnp.maximum(eps * precond * inv_sg, 0.0))
        delta = -0.5 * eps * precond * g + sigma * eta
        return theta + delta * valid, v_new * valid

    return update


def _sgnht_rule(float_ref):
    """SGNHT: Nosé-Hoover thermostat momentum update
    (:mod:`pysgmcmc_tpu.samplers.sgnht`, Ding et al. 2014).  ``xi`` is
    the geometry-matched broadcast of each chain's thermostat; the
    generators handle the kinetic-energy reduction and the xi update."""
    eps = float_ref[0]
    sigma = float_ref[1]
    prior_scale = float_ref[2]

    def update(theta, v, grad, eta, valid, xi=None):
        v32 = v.astype(jnp.float32)
        g = grad + prior_scale * theta
        p_new = (v32 - xi * eps * v32 - eps * g + sigma * eta) * valid
        return theta + eps * p_new, p_new

    return update


def _rsghmc_rule(float_ref):
    """Relativistic SGHMC: Lu et al. 2017 momentum update —
    log-likelihood-convention gradients and the relativistic velocity
    (one rsqrt per element on the VPU;
    :mod:`pysgmcmc_tpu.samplers.relativistic_sghmc` semantics)."""
    eps = float_ref[0]
    noise_scale = float_ref[1]
    prior_scale = float_ref[2]
    inv_mc2 = float_ref[3]
    inv_m = float_ref[4]
    d_coef = float_ref[5]

    def vel(p):
        return eps * p * inv_m * jax.lax.rsqrt(p * p * inv_mc2 + 1.0)

    def update(theta, v, grad, eta, valid, xi=None):
        p = v.astype(jnp.float32)
        loglik_g = -(grad + prior_scale * theta)
        p_new = (p + eps * loglik_g + noise_scale * eta
                 - d_coef * vel(p)) * valid
        return theta + vel(p_new) * valid, p_new

    return update


RULE_SGHMC = KernelRule("sghmc", _sghmc_rule, minv=True)
RULE_SGLD = KernelRule("sgld", _sgld_rule, aux=False, minv=True)
RULE_PSGLD = KernelRule("psgld", _psgld_rule)
RULE_SGNHT = KernelRule("sgnht", _sgnht_rule, xi=True)
RULE_RSGHMC = KernelRule("rsghmc", _rsghmc_rule)


def _slab_sumsq(p):
    """Per-chain sum of squares of a ``(C, rows, s)`` slab -> ``(C, 1)``."""
    return jnp.sum(
        jnp.sum(p * p, axis=2, keepdims=True),
        axis=1, keepdims=True)[:, 0, :]


def _half_sumsq(p, c, s):
    """Per-chain sums of squares from a paired ``(Cp, 2s, 2s)`` slab's
    diagonal row halves -> ``(C, 1)`` (off-block cells are zero via the
    paired validity mask, so summing full rows is exact)."""
    sq = p * p
    s_a = jnp.sum(
        jnp.sum(sq[:, 0:s, :], axis=2, keepdims=True),
        axis=1, keepdims=True)
    s_b = jnp.sum(
        jnp.sum(sq[:, s:2 * s, :], axis=2, keepdims=True),
        axis=1, keepdims=True)
    return jnp.stack([s_a[:, 0, :], s_b[:, 0, :]], axis=1).reshape(c, 1)


def _per_step_table(eps, k_steps, cols):
    """Build the ``(k_steps, n)`` per-step scalar table for a multi-step
    kernel.

    ``eps`` is a scalar (constant schedules — every row identical) or a
    ``(k_steps,)`` vector of per-step stepsizes; ``cols(eps_vec)``
    returns the list of ``(k_steps,)`` columns for the sampler's scalar
    layout.  The kernels read row ``t`` inside the step loop, so
    step-varying schedules are EXACT through the multi-step path (the
    round-3 drivers evaluated the schedule once per k-step segment)."""
    eps_vec = jnp.broadcast_to(
        jnp.asarray(eps, jnp.float32).reshape(-1), (k_steps,))
    return jnp.stack(cols(eps_vec), axis=1)


def _take_refs(refs):
    """Positional-ref unpacker for the generators' ``*refs`` kernels.

    ``take(n)`` pops ``n`` refs (a bare ref for ``n == 1``);
    ``take.group(n)`` always pops a LIST of ``n`` (state groups whose
    size depends on the network depth, possibly 1)."""
    refs = list(refs)

    def take(n):
        out = refs[:n]
        del refs[:n]
        return out if n > 1 else out[0]

    def group(n):
        out = refs[:n]
        del refs[:n]
        return out

    take.group = group
    return refs, take


#  The three kernel generators ------------------------------------------------

def _slab_views(refs_group, s, big_rows):
    """``[big, *mats]`` refs -> the per-slab views ``[w2, vec, *mats]``
    the update rules consume (read side: values; write side via
    :func:`_store_slabs`)."""
    big = refs_group[0]
    return [big[:, 0:s, :], big[:, s:big_rows, :]] + [
        m[:] for m in refs_group[1:]]


def _store_slabs(refs_group, values, s, big_rows, dtype=None):
    """Write per-slab ``values`` (w2, vec, *mats order) back into the
    ``[big, *mats]`` ref group."""
    cast = (lambda v: v) if dtype is None else (lambda v: v.astype(dtype))
    refs_group[0][:, 0:s, :] = cast(values[0])
    refs_group[0][:, s:big_rows, :] = cast(values[1])
    for m_ref, v in zip(refs_group[1:], values[2:]):
        m_ref[:] = cast(v)


def _make_kernel_family(rule, batch_size, n_data, with_noise, block_chains,
                        n_inputs, h, s=S, bias_row=BIAS_ROW,
                        n_windows=None, n_extra=1,
                        noise_impl="box_muller"):
    """Whole-step kernel generator for the fused BNN family.

    One fused forward + heteroscedastic likelihood + backward
    (:func:`_fwd_bwd`) + ``rule``-specific update per launch.  Ref
    layout (after the two prefetched scalar refs): theta slabs, aux
    slabs (``rule.aux``), xi row (``rule.xi``), minv slabs
    (``rule.minv``), minibatch — or the shared window tables when
    ``n_windows`` is set (the select-in-kernel path, incompatible with
    noise injection) — optional injected-noise slabs, then the outputs
    (theta, aux, xi) and the standard scratch set.  ``n_extra`` is the
    number of matrix slabs beyond ``big`` (``depth - 2``); each state
    group (theta/aux/minv/noise/out) is ``1 + n_extra`` refs."""
    inv_b = 1.0 / batch_size
    inv_n = 1.0 / n_data
    C = block_chains
    big_rows = s + VEC_ROWS
    n_group = 1 + n_extra      # refs per state group: big + extra mats
    n_slabs = 2 + n_extra      # update slabs: w2, vec rows, extra mats
    depth = 2 + n_extra

    def kernel(int_ref, float_ref, *refs):
        refs, take = _take_refs(refs)
        tg = take.group(n_group)
        vg = xi_ref = mg = ng = None
        if rule.aux:
            vg = take.group(n_group)
        if rule.xi:
            xi_ref = take(1)
        if rule.minv:
            mg = take.group(n_group)
        xin_ref, y_ref = take(2)
        if with_noise:
            ng = take.group(n_group)
        og = take.group(n_group)
        pg = xi_out = None
        if rule.aux:
            pg = take.group(n_group)
        if rule.xi:
            xi_out = take(1)
        s_acts, s_gvec = refs[:depth], refs[depth]

        if not with_noise:
            pltpu.prng_seed(int_ref[0], pl.program_id(0))
        update = rule.make_update(float_ref)

        brow = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD), 1)
        bmask = (brow < batch_size).astype(jnp.float32)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD, s), 2)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, s), 1)

        if n_windows is not None:
            # xin_ref/y_ref are the SHARED window tables: draw each
            # chain's window from the in-kernel PRNG and gather in VMEM
            win_iota = jax.lax.broadcasted_iota(
                jnp.int32, (C, n_windows), 1)
            xin_bf, y = _select_window_bf(
                C, n_windows, win_iota, xin_ref, y_ref, n_inputs)
        else:
            xin_bf = xin_ref[:].astype(jnp.bfloat16)
            y = y_ref[:]

        cost, g_w2, g_vec, g_mats = _fwd_bwd(
            tg[0][:], [m[:] for m in tg[1:]], xin_bf, y, bmask, lane3,
            lane2, s_acts, s_gvec, inv_b, inv_n, n_inputs, C, s,
            bias_row)

        if with_noise:
            etas = _slab_views(ng, s, big_rows)
        elif noise_impl == "box_muller":
            # positional call keeps the archive benchmarks' monkeypatched
            # _block_etas variants (older 4-arg signatures) working
            etas = _block_etas(C, s, bias_row, n_mats=1 + n_extra)
        else:
            etas = _block_etas(C, s, bias_row, n_mats=1 + n_extra,
                               hmats=_noise_hmats(noise_impl, s))

        if rule.minv:
            masks = _slab_views(mg, s, big_rows)
        else:
            mat_valid, vec_valid = _psgld_valid_masks(
                C, n_inputs, h, s, bias_row)
            masks = [mat_valid, vec_valid] + [mat_valid] * n_extra
        xi3 = xi_ref[:, 0:1][:, :, None] if rule.xi else None

        theta_slabs = _slab_views(tg, s, big_rows)
        aux_slabs = (
            _slab_views(vg, s, big_rows) if rule.aux
            else [None] * n_slabs)
        grads = [g_w2, g_vec] + list(g_mats)
        stats = []
        outs = []
        for i in range(n_slabs):
            t_new, a_new = update(
                theta_slabs[i], aux_slabs[i], grads[i], etas[i],
                masks[i], xi3)
            if rule.xi:
                stats.append(_slab_sumsq(a_new))
            outs.append((t_new, a_new))

        _store_slabs(og, [o[0] for o in outs], s, big_rows)
        if rule.aux:
            _store_slabs(pg, [o[1] for o in outs], s, big_rows,
                         dtype=pg[0].dtype)
        if rule.xi:
            kinetic = sum(stats) * float_ref[3]
            xi_new = xi_ref[:, 0:1] + float_ref[0] * (kinetic - 1.0)
            xi_out[:, :] = xi_new + jnp.zeros((C, 128), jnp.float32)
        # cost rides lane 0 of the last row of the f32 theta slab (bf16
        # single-lane stores are unsupported).  Self-consistent: the
        # row's aux state stays masked, its gradient is zero, the
        # forward and unpack never read it, each step overwrites it.
        og[0][:, big_rows - 1, LANE_B4:LANE_B4 + 1] = cost

    return kernel


# Ablation knob for the roofline study (benchmarks/wide_roofline_tpu.py):
# neutralizes one or more components of the multi-step kernel so their
# marginal cost can be measured on hardware (full minus ablated, same
# driver protocol).  '+'-join tokens to combine ('fwdbwd+noise');
# composites disambiguate MXU/VPU overlap, which single ablations cannot.
# Always None in production; never set by library code.  Isolated
# microbenchmarks of the components proved untrustworthy on the tunneled
# backend (walls below ~100 ms are launch-noise; see
# benchmarks/archive/wide_probe_debug.py), so the kernel measures itself.
_ABLATE = None  # None | '+'-joined 'noise'/'window'/'rulemath'/'fwdbwd'


def _ablated(token):
    return _ABLATE is not None and token in _ABLATE.split("+")


def _make_multistep_kernel_family(rule, batch_size, n_data, block_chains,
                                  n_windows, k_steps, h, s=S,
                                  bias_row=BIAS_ROW, n_inputs=1,
                                  n_extra=1, noise_impl="box_muller"):
    """Multi-step kernel generator: ``k_steps`` ``rule`` updates per
    launch with ALL aliased state (theta, aux, xi) resident in the
    output refs across a ``fori_loop`` — intermediate states never
    round-trip HBM.  The minibatch window is drawn from the in-kernel
    PRNG every step (:func:`_select_window_bf`); the per-chain cost of
    the LAST step rides the usual slab row (thinned-driver
    ``costs[-1]`` semantics).  ``n_extra`` as in
    :func:`_make_kernel_family` (``depth - 2`` matrix slabs beyond
    ``big``).

    The prefetched float scalars arrive as a ``(k_steps, n)`` PER-STEP
    table (SMEM); the loop body reads row ``t``, so step-varying
    stepsize schedules are exact — the drivers evaluate the schedule
    host-side per inner step (:func:`_per_step_table`)."""
    inv_b = 1.0 / batch_size
    inv_n = 1.0 / n_data
    C = block_chains
    big_rows = s + VEC_ROWS
    n_group = 1 + n_extra
    n_slabs = 2 + n_extra
    depth = 2 + n_extra

    def kernel(int_ref, float_ref, *refs):
        refs, take = _take_refs(refs)
        tg = take.group(n_group)
        vg = xi_ref = mg = None
        if rule.aux:
            vg = take.group(n_group)
        if rule.xi:
            xi_ref = take(1)
        if rule.minv:
            mg = take.group(n_group)
        xw_ref, yw_ref = take(2)
        og = take.group(n_group)
        pg = xi_out = None
        if rule.aux:
            pg = take.group(n_group)
        if rule.xi:
            xi_out = take(1)
        s_acts, s_gvec = refs[:depth], refs[depth]

        pltpu.prng_seed(int_ref[0], pl.program_id(0))
        n_cols = float_ref.shape[1]

        # aliased state lives in the output refs for the whole loop
        for o_ref, t_ref in zip(og, tg):
            o_ref[:] = t_ref[:]
        if rule.aux:
            for p_ref, v_ref in zip(pg, vg):
                p_ref[:] = v_ref[:]
        if rule.xi:
            xi_out[:] = xi_ref[:]

        brow = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD), 1)
        bmask = (brow < batch_size).astype(jnp.float32)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD, s), 2)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, s), 1)
        win_iota = jax.lax.broadcasted_iota(jnp.int32, (C, n_windows), 1)
        if not rule.minv:
            mat_valid, vec_valid = _psgld_valid_masks(
                C, n_inputs, h, s, bias_row)
        # hoisted: fori_loop bodies are not loop-invariant-code-motioned
        hmats = _noise_hmats(noise_impl, s)

        def body(t, carry):
            row = [float_ref[t, j] for j in range(n_cols)]
            update = rule.make_update(row)
            if _ablated("rulemath"):
                def update(theta, aux, grad, eta, mask, xi=None, _r=row):
                    return theta - _r[0] * grad + 1e-3 * eta, aux
            if _ablated("fwdbwd"):
                # constant grads: removes all dots + tanh + likelihood
                # (and the window gather they consume)
                cost = jnp.zeros((C, 1), jnp.float32)
                g_w2 = jnp.full((C, s, s), 1e-4, jnp.float32)
                g_vec = jnp.full((C, VEC_ROWS, s), 1e-4, jnp.float32)
                g_mats = [jnp.full((C, s, s), 1e-4, jnp.float32)
                          for _ in range(n_extra)]
            else:
                if _ablated("window"):
                    # pinned window 0: no per-step PRNG draw or gather
                    assert n_inputs == 1, "window ablation is 1-input only"
                    x0 = jnp.broadcast_to(xw_ref[0:1, :], (C, B_PAD))
                    xin_bf = jnp.stack(
                        [x0, jnp.ones_like(x0)], axis=2
                    ).astype(jnp.bfloat16)
                    y = jnp.broadcast_to(yw_ref[0:1, :], (C, B_PAD))
                else:
                    xin_bf, y = _select_window_bf(
                        C, n_windows, win_iota, xw_ref, yw_ref, n_inputs)

                cost, g_w2, g_vec, g_mats = _fwd_bwd(
                    og[0][:], [m[:] for m in og[1:]], xin_bf, y,
                    bmask, lane3, lane2, s_acts, s_gvec,
                    inv_b, inv_n, n_inputs, C, s, bias_row)

            if _ablated("noise"):
                etas = tuple(
                    jnp.full(shape, 0.01, jnp.float32)
                    for shape in [(C, s, s), (C, VEC_ROWS, s)]
                    + [(C, s, s)] * n_extra)
            elif hmats is None:
                # positional call keeps archive monkeypatch variants alive
                etas = _block_etas(C, s, n_mats=1 + n_extra)
            else:
                etas = _block_etas(C, s, n_mats=1 + n_extra, hmats=hmats)
            if rule.minv:
                masks = _slab_views(mg, s, big_rows)
            else:
                masks = [mat_valid, vec_valid] + [mat_valid] * n_extra
            xi3 = xi_out[:, 0:1][:, :, None] if rule.xi else None

            theta_slabs = _slab_views(og, s, big_rows)
            aux_slabs = (
                _slab_views(pg, s, big_rows) if rule.aux
                else [None] * n_slabs)
            grads = [g_w2, g_vec] + list(g_mats)
            stats = []
            outs = []
            for i in range(n_slabs):
                t_new, a_new = update(
                    theta_slabs[i], aux_slabs[i], grads[i], etas[i],
                    masks[i], xi3)
                if rule.xi:
                    stats.append(_slab_sumsq(a_new))
                outs.append((t_new, a_new))

            _store_slabs(og, [o[0] for o in outs], s, big_rows)
            if rule.aux:
                _store_slabs(pg, [o[1] for o in outs], s, big_rows,
                             dtype=pg[0].dtype)
            if rule.xi:
                kinetic = sum(stats) * row[3]
                xi_new = xi_out[:, 0:1] + row[0] * (kinetic - 1.0)
                xi_out[:, :] = xi_new + jnp.zeros((C, 128), jnp.float32)
            og[0][:, big_rows - 1, LANE_B4:LANE_B4 + 1] = cost
            return carry

        jax.lax.fori_loop(0, k_steps, body, 0)

    return kernel


def _make_multistep_kernel_family_paired(rule, batch_size, n_data,
                                         block_chains, n_windows, k_steps,
                                         h, n_inputs=1):
    """Paired-dot multi-step generator: as
    :func:`_make_multistep_kernel_family` but with the W2/W3 state
    packed ONCE per launch into persistent block-diagonal (Cp, 2s, 2s)
    scratch so every MXU dot contracts the full 128-lane depth at half
    the instance count (:func:`_fwd_bwd_paired`), and unpacked once at
    the end.  Off-diagonal discipline comes for free from the rule's own
    masking: the paired minv's zeros freeze cross-chain cells (minv
    rules), or the paired validity mask zeroes them (static-mask rules).
    The vector rows stay unpaired.  64-slot layout / even blocks."""
    inv_b = 1.0 / batch_size
    inv_n = 1.0 / n_data
    C = block_chains
    Cp = C // 2
    s = S
    big_rows = s + VEC_ROWS

    def kernel(int_ref, float_ref, *refs):
        refs, take = _take_refs(refs)
        tbig, tw3 = take(2)
        vbig = vw3 = xi_ref = mbig = mw3 = None
        if rule.aux:
            vbig, vw3 = take(2)
        if rule.xi:
            xi_ref = take(1)
        if rule.minv:
            mbig, mw3 = take(2)
        xw_ref, yw_ref = take(2)
        obig, ow3 = take(2)
        pbig = pw3 = xi_out = None
        if rule.aux:
            pbig, pw3 = take(2)
        if rule.xi:
            xi_out = take(1)
        s_a1, s_a2, s_a3, s_gvec = take(4)
        p_w2, p_w3 = take(2)
        p_v2 = p_v3 = p_m2 = p_m3 = None
        if rule.aux:
            p_v2, p_v3 = take(2)
        if rule.minv:
            p_m2, p_m3 = take(2)

        pltpu.prng_seed(int_ref[0], pl.program_id(0))
        n_cols = float_ref.shape[1]

        # vector-row state rides the output refs; W2/W3 state is PAIRED
        # in persistent scratch for the whole loop
        obig[:] = tbig[:]
        ow3[:] = tw3[:]
        p_w2[:] = _pair_mats(tbig[:, 0:s, :], Cp, s)
        p_w3[:] = _pair_mats(tw3[:], Cp, s)
        if rule.aux:
            pbig[:] = vbig[:]
            pw3[:] = vw3[:]
            p_v2[:] = _pair_mats(
                vbig[:, 0:s, :].astype(jnp.float32), Cp, s)
            p_v3[:] = _pair_mats(vw3[:].astype(jnp.float32), Cp, s)
        if rule.minv:
            p_m2[:] = _pair_mats(
                mbig[:, 0:s, :].astype(jnp.float32), Cp, s)
            p_m3[:] = _pair_mats(mw3[:].astype(jnp.float32), Cp, s)
        if rule.xi:
            xi_out[:] = xi_ref[:]

        brow = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD), 1)
        bmask = (brow < batch_size).astype(jnp.float32)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, s), 1)
        lane3p = jax.lax.broadcasted_iota(
            jnp.int32, (Cp, B_PAD, 2 * s), 2)
        bias_lane_p = (lane3p % s) == BIAS_ROW
        first_half = lane3p < s
        p_move = _paired_fold_const(s)
        win_iota = jax.lax.broadcasted_iota(jnp.int32, (C, n_windows), 1)

        if not rule.minv:
            # paired validity: diagonal blocks ∩ the usual row/lane
            # validity, in the PAIRED (Cp, 2s, 2s) geometry
            rowm = jax.lax.broadcasted_iota(
                jnp.int32, (Cp, 2 * s, 2 * s), 1)
            lanem = jax.lax.broadcasted_iota(
                jnp.int32, (Cp, 2 * s, 2 * s), 2)
            same_block = (rowm < s) == (lanem < s)
            rr = rowm % s
            ll = lanem % s
            mat_valid_p = (
                same_block & ((rr < h) | (rr == BIAS_ROW)) & (ll < h)
            ).astype(jnp.float32)
            row_first_half = rowm < s
            _, vec_valid = _psgld_valid_masks(C, n_inputs, h, s, BIAS_ROW)

        def body(t, carry):
            row = [float_ref[t, j] for j in range(n_cols)]
            update = rule.make_update(row)
            xin_bf, y = _select_window_bf(
                C, n_windows, win_iota, xw_ref, yw_ref, n_inputs)

            cost, g_w2p, g_vec, g_w3p = _fwd_bwd_paired(
                obig[:], p_w2[:].astype(jnp.bfloat16),
                p_w3[:].astype(jnp.bfloat16), xin_bf, y, bmask,
                lane2, lane3p, bias_lane_p, first_half, p_move,
                s_a1, s_a2, s_a3, s_gvec, inv_b, inv_n, C, s,
                n_inputs)

            # one full-width draw covers both paired slabs (rows are
            # even, so Box-Muller runs dual-output), plus the small
            # unpaired vector-rows draw
            eta_p = _normal_3d((Cp, 4 * s, 2 * s))
            eta_vec = _normal_3d((C, VEC_ROWS, s))

            if rule.minv:
                masks = (p_m2[:], mbig[:, s:big_rows, :], p_m3[:])
            else:
                masks = (mat_valid_p, vec_valid, mat_valid_p)
            if rule.xi:
                xi_col = xi_out[:, 0:1]
                xi3 = xi_col[:, :, None]
                xir = xi_col.reshape(Cp, 2, 1)
                xi_p = jnp.where(
                    row_first_half, xir[:, 0:1, :], xir[:, 1:2, :])
            else:
                xi3 = xi_p = None

            # paired W2 slab
            t_new, a_new = update(
                p_w2[:], p_v2[:] if rule.aux else None,
                g_w2p, eta_p[:, 0:2 * s, :], masks[0], xi_p)
            p_w2[:] = t_new
            ss_w2 = _half_sumsq(a_new, C, s) if rule.xi else None
            if rule.aux:
                p_v2[:] = a_new
            # paired W3 slab
            t_new, a_new = update(
                p_w3[:], p_v3[:] if rule.aux else None,
                g_w3p, eta_p[:, 2 * s:4 * s, :], masks[2], xi_p)
            p_w3[:] = t_new
            ss_w3 = _half_sumsq(a_new, C, s) if rule.xi else None
            if rule.aux:
                p_v3[:] = a_new
            # vector rows (unpaired, exactly the standard kernel)
            t_new, a_new = update(
                obig[:, s:big_rows, :],
                pbig[:, s:big_rows, :] if rule.aux else None,
                g_vec, eta_vec, masks[1], xi3)
            obig[:, s:big_rows, :] = t_new
            if rule.aux:
                pbig[:, s:big_rows, :] = a_new.astype(pbig.dtype)
            if rule.xi:
                ss_vec = _slab_sumsq(a_new)
                kinetic = (ss_w2 + ss_vec + ss_w3) * row[3]
                xi_new = xi_out[:, 0:1] + row[0] * (kinetic - 1.0)
                xi_out[:, :] = xi_new + jnp.zeros((C, 128), jnp.float32)
            obig[:, big_rows - 1, LANE_B4:LANE_B4 + 1] = cost
            return carry

        jax.lax.fori_loop(0, k_steps, body, 0)

        # unpack the paired state back into the (aliased) output slabs;
        # the cost-row write targets the vector-rows region, which the
        # W2 unpack does not touch
        obig[:, 0:s, :] = _unpair_mats(p_w2[:], C, s)
        ow3[:] = _unpair_mats(p_w3[:], C, s)
        if rule.aux:
            pbig[:, 0:s, :] = _unpair_mats(p_v2[:], C, s).astype(
                pbig.dtype)
            pw3[:] = _unpair_mats(p_v3[:], C, s).astype(pw3.dtype)

    return kernel


def _family_call(rule, kernel, theta, aux, xi, minv, data_ops, data_specs,
                 noise, aux_dtype, block_chains, interpret, pair_dots,
                 int_scalars, float_scalars):
    """Shared pallas_call plumbing for every fused-family driver.

    Builds operands / specs / out_shape / aliases from the rule: inputs
    are [theta, aux?, xi?, minv?, data..., noise?]; outputs
    [theta (f32), aux (``aux_dtype``)?, xi (f32)?].  theta/aux/xi alias
    their outputs 1:1; the read-only sets (minv, data, noise) do not.
    Returns ``(theta', aux', xi', cost)`` with the unused slots None."""
    tbig = theta[0]
    n_group = len(theta)
    n_chains = tbig.shape[0]
    s = tbig.shape[2]
    state_specs = [_big_spec(block_chains, s)] + [
        _mat_spec(block_chains, s)] * (n_group - 1)
    xi_spec = pl.BlockSpec(
        (block_chains, 128), lambda i, *_: (i, 0),
        memory_space=pltpu.VMEM)

    in_specs = list(state_specs)
    operands = list(theta)
    n_aliased = n_group
    if rule.aux:
        in_specs += state_specs
        operands += list(aux)
        n_aliased += n_group
    if rule.xi:
        in_specs += [xi_spec]
        operands += [xi]
        n_aliased += 1
    if rule.minv:
        in_specs += state_specs
        operands += list(minv)
    in_specs += list(data_specs)
    operands += list(data_ops)
    if noise is not None:
        in_specs += state_specs
        operands += list(noise)

    out_shape = [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta]
    out_specs = list(state_specs)
    if rule.aux:
        out_shape += [
            jax.ShapeDtypeStruct(t.shape, aux_dtype) for t in theta]
        out_specs += state_specs
    if rule.xi:
        out_shape += [jax.ShapeDtypeStruct((n_chains, 128), jnp.float32)]
        out_specs += [xi_spec]

    # the first n_aliased operands (theta, aux, xi) alias the outputs
    # 1:1 (indices offset by the 2 prefetched scalar operands)
    aliases = {i + 2: i for i in range(n_aliased)}

    if pair_dots:
        n_slabs = 2 + (2 if rule.aux else 0) + (2 if rule.minv else 0)
        scratch = _paired_scratch(block_chains, s, n_slabs)
    else:
        scratch = _multistep_scratch(block_chains, s, depth=1 + n_group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chains // block_chains,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    interpreter = pltpu.InterpretParams() if interpret else False
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        # v5e has 128 MB of physical VMEM; the compiler's default 16 MB
        # scoped budget is too tight for the double-buffered state slabs
        # plus the kernel's dot temporaries at useful block sizes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)
    theta_new = tuple(outs[0:n_group])
    cost = theta_new[0][:, s + VEC_ROWS - 1, 0:1]
    pos = n_group
    aux_new = None
    if rule.aux:
        aux_new = tuple(outs[n_group:2 * n_group])
        pos = 2 * n_group
    xi_new = outs[pos] if rule.xi else None
    return theta_new, aux_new, xi_new, cost


def _psgld_valid_masks(block_chains, n_inputs, h, s=S, bias_row=BIAS_ROW):
    """Static validity masks for the pSGLD fused update.

    pSGLD has no frozen ``minv`` whose zeros mask the padding cells, and
    unmasked padding drift would CORRUPT real outputs through the padded
    matmul columns, so validity comes from iota comparisons against the
    (static) layout: weight slabs are valid on rows 0..H-1 plus the bias
    row, lanes 0..H-1; vector rows on their own lane widths.
    """
    C = block_chains
    row3 = jax.lax.broadcasted_iota(jnp.int32, (C, s, s), 1)
    lane3s = jax.lax.broadcasted_iota(jnp.int32, (C, s, s), 2)
    mat_valid = (((row3 < h) | (row3 == bias_row)) & (lane3s < h)).astype(
        jnp.float32)
    vrow = jax.lax.broadcasted_iota(jnp.int32, (C, VEC_ROWS, s), 1)
    vlane = jax.lax.broadcasted_iota(jnp.int32, (C, VEC_ROWS, s), 2)
    scal_row = n_inputs + 2
    vec_valid = (
        ((vrow < scal_row) & (vlane < h))
        | ((vrow == scal_row) & (vlane < 2))
    ).astype(jnp.float32)
    return mat_valid, vec_valid


def _batch_specs(block_chains, n_inputs):
    """Per-block (xin, y) minibatch specs for the per-step drivers."""
    xin_spec = pl.BlockSpec(
        (block_chains, B_PAD, n_inputs + 1), lambda i, *_: (i, 0, 0),
        memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec(
        (block_chains, B_PAD), lambda i, *_: (i, 0),
        memory_space=pltpu.VMEM)
    return xin_spec, y_spec


def _fused_xin(x_sel, n_inputs):
    if n_inputs == 1:
        parts = [x_sel]
        ones_like = jnp.ones_like(x_sel)
    else:
        parts = [x_sel[:, :, i] for i in range(n_inputs)]
        ones_like = jnp.ones_like(parts[0])
    return jnp.stack(parts + [ones_like], axis=2).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("a_coef", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "n_inputs", "noise_impl", "interpret"),
)
def fused_bnn_step_sgld(
    theta, minv, x_sel, y_sel, eps, seed,
    a_coef=1.0, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=64,
    n_inputs=1, noise=None, noise_impl="box_muller", interpret=False,
):
    """One fused forward+backward+update SGLD step (flagship BNN family).

    As :func:`fused_bnn_step` but with the momentum-free SGLD update and
    no momentum state: returns ``(theta', cost)``.
    """
    if noise is not None and noise_impl != "box_muller":
        raise ValueError(
            "noise_impl selects the in-kernel PRNG generator; it does "
            "not combine with injected noise arrays")
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_step_sgld: n_chains ({}) must be divisible by "
            "block_chains ({})".format(n_chains, block_chains))
    s = _multistep_slot(tbig, "fused family step")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW

    xin = _fused_xin(x_sel, n_inputs)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = jnp.stack([
        jnp.asarray(eps, jnp.float32),
        jnp.asarray(a_coef, jnp.float32),
        jnp.asarray(a_coef / scale_grad, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    xin_spec, y_spec = _batch_specs(block_chains, n_inputs)
    kernel = _make_kernel_family(
        RULE_SGLD, float(batch_size), float(n_data), noise is not None,
        block_chains, n_inputs, 0, s=s, bias_row=bias_row,
        n_extra=n_extra, noise_impl=noise_impl)
    theta_new, _, _, cost = _family_call(
        RULE_SGLD, kernel, theta, None, None, minv,
        [xin, y_sel], [xin_spec, y_spec], noise, None, block_chains,
        interpret, False, int_scalars, float_scalars)
    return theta_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "lambda_reg", "scale_grad", "prior_scale",
                     "batch_size", "n_data", "block_chains", "state_dtype",
                     "n_inputs", "h", "noise_impl", "interpret"),
)
def fused_bnn_step_psgld(
    theta, v, x_sel, y_sel, eps, seed,
    alpha=0.99, lambda_reg=1e-5, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=64,
    state_dtype=jnp.bfloat16, n_inputs=1, h=50, noise=None,
    noise_impl="box_muller", interpret=False,
):
    """One fused forward+backward+update pSGLD step (flagship BNN family).

    As :func:`fused_bnn_step` but with the RMSprop-preconditioned pSGLD
    update; ``v`` is the preconditioner accumulator (adapts in-kernel
    every step — pSGLD has no frozen phase).  Returns
    ``(theta', v', cost)``.
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_step_psgld: n_chains ({}) must be divisible by "
            "block_chains ({})".format(n_chains, block_chains))
    s = _multistep_slot(tbig, "fused family step")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW

    xin = _fused_xin(x_sel, n_inputs)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = jnp.stack([
        jnp.asarray(eps, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(lambda_reg, jnp.float32),
        jnp.asarray(1.0 / scale_grad, jnp.float32),
        jnp.asarray(prior_scale, jnp.float32),
    ])

    xin_spec, y_spec = _batch_specs(block_chains, n_inputs)
    kernel = _make_kernel_family(
        RULE_PSGLD, float(batch_size), float(n_data), noise is not None,
        block_chains, n_inputs, int(h), s=s, bias_row=bias_row,
        n_extra=n_extra, noise_impl=noise_impl)
    theta_new, v_new, _, cost = _family_call(
        RULE_PSGLD, kernel, theta, v, None, None,
        [xin, y_sel], [xin_spec, y_spec], noise, state_dtype,
        block_chains, interpret, False, int_scalars, float_scalars)
    return theta_new, v_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("a_diff", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "state_dtype", "n_inputs",
                     "h", "noise_impl", "interpret"),
)
def fused_bnn_step_sgnht(
    theta, v, xi, x_sel, y_sel, eps, seed,
    a_diff=1.0, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=64,
    state_dtype=jnp.bfloat16, n_inputs=1, h=50, noise=None,
    noise_impl="box_muller", interpret=False,
):
    """One fused forward+backward+update SGNHT step (flagship BNN family).

    As :func:`fused_bnn_step` but with the Nosé-Hoover thermostat update
    of :mod:`pysgmcmc_tpu.samplers.sgnht`; ``xi`` is the per-chain
    thermostat replicated into a ``(n_chains, 128)`` f32 lane row (read
    back as column 0).  Returns ``(theta', v', xi', cost)``.
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_step_sgnht: n_chains ({}) must be divisible by "
            "block_chains ({})".format(n_chains, block_chains))
    if xi.shape != (n_chains, 128):
        raise ValueError(
            "fused_bnn_step_sgnht: xi must be a replicated ({}, 128) "
            "row; got {}".format(n_chains, xi.shape))
    s = _multistep_slot(tbig, "fused family step")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    # real (unpadded) parameter count: one (h+1) x h weight slab per
    # matrix layer (biases ride the ones-lane bias row) + w1/b1/head
    # vector rows + (head bias, lvb)
    n_dim = (1 + n_extra) * (h + 1) * h + (n_inputs + 2) * h + 2

    xin = _fused_xin(x_sel, n_inputs)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    eps32 = jnp.asarray(eps, jnp.float32)
    float_scalars = jnp.stack([
        eps32,
        jnp.sqrt(jnp.maximum(
            2.0 * jnp.asarray(a_diff, jnp.float32) * eps32 / scale_grad,
            0.0)),
        jnp.asarray(prior_scale, jnp.float32),
        jnp.asarray(1.0 / n_dim, jnp.float32),
    ])

    xin_spec, y_spec = _batch_specs(block_chains, n_inputs)
    kernel = _make_kernel_family(
        RULE_SGNHT, float(batch_size), float(n_data), noise is not None,
        block_chains, n_inputs, int(h), s=s, bias_row=bias_row,
        n_extra=n_extra, noise_impl=noise_impl)
    theta_new, v_new, xi_new, cost = _family_call(
        RULE_SGNHT, kernel, theta, v, xi, None,
        [xin, y_sel], [xin_spec, y_spec], noise, state_dtype,
        block_chains, interpret, False, int_scalars, float_scalars)
    return theta_new, v_new, xi_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("mass", "speed_of_light", "d_coef", "b_hat",
                     "prior_scale", "batch_size", "n_data", "block_chains",
                     "state_dtype", "n_inputs", "h", "noise_impl", "interpret"),
)
def fused_bnn_step_rsghmc(
    theta, v, x_sel, y_sel, eps, seed,
    mass=1.0, speed_of_light=1.0, d_coef=1.0, b_hat=0.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=64,
    state_dtype=jnp.bfloat16, n_inputs=1, h=50, noise=None,
    noise_impl="box_muller", interpret=False,
):
    """One fused forward+backward+update relativistic-SGHMC step.

    As :func:`fused_bnn_step` but with the relativistic momentum update of
    :mod:`pysgmcmc_tpu.samplers.relativistic_sghmc` (Lu et al. 2017);
    returns ``(theta', p', cost)``.
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_step_rsghmc: n_chains ({}) must be divisible by "
            "block_chains ({})".format(n_chains, block_chains))
    s = _multistep_slot(tbig, "fused family step")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW

    xin = _fused_xin(x_sel, n_inputs)
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    eps32 = jnp.asarray(eps, jnp.float32)
    float_scalars = jnp.stack([
        eps32,
        jnp.sqrt(jnp.maximum(
            eps32 * (2.0 * d_coef - eps32 * b_hat), 0.0)),
        jnp.asarray(prior_scale, jnp.float32),
        jnp.asarray(1.0 / (mass * mass * speed_of_light * speed_of_light),
                    jnp.float32),
        jnp.asarray(1.0 / mass, jnp.float32),
        jnp.asarray(d_coef, jnp.float32),
    ])

    xin_spec, y_spec = _batch_specs(block_chains, n_inputs)
    kernel = _make_kernel_family(
        RULE_RSGHMC, float(batch_size), float(n_data), noise is not None,
        block_chains, n_inputs, int(h), s=s, bias_row=bias_row,
        n_extra=n_extra, noise_impl=noise_impl)
    theta_new, v_new, _, cost = _family_call(
        RULE_RSGHMC, kernel, theta, v, None, None,
        [xin, y_sel], [xin_spec, y_spec], noise, state_dtype,
        block_chains, interpret, False, int_scalars, float_scalars)
    return theta_new, v_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("a_coef", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "k_steps", "pair_dots",
                     "noise_impl", "interpret"),
)
def fused_bnn_multistep_sgld(
    theta, minv, x_win, y_win, eps, seed,
    a_coef=1.0, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=32,
    k_steps=1, pair_dots=False, noise_impl="box_muller", interpret=False,
):
    """``k_steps`` fused SGLD steps in ONE kernel launch, VMEM-resident.

    As :func:`fused_bnn_multistep` but with the momentum-free SGLD
    update; returns ``(theta', cost)`` (cost of the final step).
    1-input family, both slot layouts.  ``pair_dots`` as in
    :func:`fused_bnn_multistep` (64-slot layout / even blocks).
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    s = _multistep_slot(tbig, "fused_bnn_multistep_sgld")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_multistep_sgld: n_chains ({}) must be divisible "
            "by block_chains ({})".format(n_chains, block_chains))
    n_windows, n_inputs, xw_op = _multistep_tables(
        x_win, "fused_bnn_multistep_sgld")
    _check_pair_dots(pair_dots, s, n_inputs, block_chains,
                     n_group=len(theta))

    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = _per_step_table(eps, int(k_steps), lambda e: [
        e, jnp.full_like(e, a_coef),
        jnp.full_like(e, a_coef / scale_grad),
        jnp.full_like(e, prior_scale)])

    if pair_dots:
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_multistep_kernel_family_paired(
            RULE_SGLD, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), 0, n_inputs)
    else:
        kernel = _make_multistep_kernel_family(
            RULE_SGLD, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), 0, s, bias_row, n_inputs,
            n_extra=n_extra, noise_impl=noise_impl)
    y_op = jnp.asarray(y_win, jnp.float32)
    theta_new, _, _, cost = _family_call(
        RULE_SGLD, kernel, theta, None, None, minv,
        [xw_op, y_op], [_table_spec(xw_op), _table_spec(y_op)],
        None, None, block_chains, interpret, pair_dots,
        int_scalars, float_scalars)
    return theta_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("a_diff", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "state_dtype", "k_steps",
                     "h", "pair_dots", "noise_impl", "interpret"),
)
def fused_bnn_multistep_sgnht(
    theta, v, xi, x_win, y_win, eps, seed,
    a_diff=1.0, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=32,
    state_dtype=jnp.bfloat16, k_steps=1, h=50, pair_dots=False,
    noise_impl="box_muller", interpret=False,
):
    """``k_steps`` fused SGNHT steps in ONE kernel launch, VMEM-resident.

    As :func:`fused_bnn_multistep` but with the Nosé-Hoover thermostat
    update; ``xi`` as in :func:`fused_bnn_step_sgnht`.  Returns
    ``(theta', v', xi', cost)``.  1-input family, both slot layouts.
    ``pair_dots`` as in :func:`fused_bnn_multistep` (64-slot / 1-input /
    even blocks).
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    s = _multistep_slot(tbig, "fused_bnn_multistep_sgnht")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_multistep_sgnht: n_chains ({}) must be divisible "
            "by block_chains ({})".format(n_chains, block_chains))
    if xi.shape != (n_chains, 128):
        raise ValueError(
            "fused_bnn_multistep_sgnht: xi must be a replicated "
            "({}, 128) row; got {}".format(n_chains, xi.shape))
    n_windows, n_inputs, xw_op = _multistep_tables(
        x_win, "fused_bnn_multistep_sgnht")
    _check_pair_dots(pair_dots, s, n_inputs, block_chains,
                     n_group=len(theta))
    n_dim = (1 + n_extra) * (h + 1) * h + (n_inputs + 2) * h + 2

    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = _per_step_table(eps, int(k_steps), lambda e: [
        e,
        jnp.sqrt(jnp.maximum(2.0 * a_diff * e / scale_grad, 0.0)),
        jnp.full_like(e, prior_scale),
        jnp.full_like(e, 1.0 / n_dim)])

    if pair_dots:
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_multistep_kernel_family_paired(
            RULE_SGNHT, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), int(h), n_inputs)
    else:
        kernel = _make_multistep_kernel_family(
            RULE_SGNHT, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), int(h), s, bias_row, n_inputs,
            n_extra=n_extra, noise_impl=noise_impl)
    y_op = jnp.asarray(y_win, jnp.float32)
    theta_new, v_new, xi_new, cost = _family_call(
        RULE_SGNHT, kernel, theta, v, xi, None,
        [xw_op, y_op], [_table_spec(xw_op), _table_spec(y_op)],
        None, state_dtype, block_chains, interpret, pair_dots,
        int_scalars, float_scalars)
    return theta_new, v_new, xi_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "lambda_reg", "scale_grad", "prior_scale",
                     "batch_size", "n_data", "block_chains", "k_steps",
                     "h", "pair_dots", "noise_impl", "interpret"),
)
def fused_bnn_multistep_psgld(
    theta, v, x_win, y_win, eps, seed,
    alpha=0.99, lambda_reg=1e-5, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=32,
    k_steps=1, h=50, pair_dots=False, noise_impl="box_muller", interpret=False,
):
    """``k_steps`` fused pSGLD steps in ONE kernel launch, VMEM-resident.

    As :func:`fused_bnn_multistep` but with the RMSprop-preconditioned
    pSGLD update (accumulator ``v`` stays f32 and adapts in-loop).
    Returns ``(theta', v', cost)``.  1-input family, both slot layouts.
    ``pair_dots`` as in :func:`fused_bnn_multistep`.
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    s = _multistep_slot(tbig, "fused_bnn_multistep_psgld")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_multistep_psgld: n_chains ({}) must be divisible "
            "by block_chains ({})".format(n_chains, block_chains))
    n_windows, n_inputs, xw_op = _multistep_tables(
        x_win, "fused_bnn_multistep_psgld")
    _check_pair_dots(pair_dots, s, n_inputs, block_chains,
                     n_group=len(theta))

    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = _per_step_table(eps, int(k_steps), lambda e: [
        e, jnp.full_like(e, alpha), jnp.full_like(e, lambda_reg),
        jnp.full_like(e, 1.0 / scale_grad),
        jnp.full_like(e, prior_scale)])
    if pair_dots:
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_multistep_kernel_family_paired(
            RULE_PSGLD, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), int(h), n_inputs)
    else:
        kernel = _make_multistep_kernel_family(
            RULE_PSGLD, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), int(h), s, bias_row, n_inputs,
            n_extra=n_extra, noise_impl=noise_impl)
    y_op = jnp.asarray(y_win, jnp.float32)
    theta_new, v_new, _, cost = _family_call(
        RULE_PSGLD, kernel, theta, v, None, None,
        [xw_op, y_op], [_table_spec(xw_op), _table_spec(y_op)],
        None, jnp.float32, block_chains, interpret, pair_dots,
        int_scalars, float_scalars)
    return theta_new, v_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("mass", "speed_of_light", "d_coef", "b_hat",
                     "prior_scale", "batch_size", "n_data", "block_chains",
                     "state_dtype", "k_steps", "h", "pair_dots",
                     "noise_impl", "interpret"),
)
def fused_bnn_multistep_rsghmc(
    theta, v, x_win, y_win, eps, seed,
    mass=1.0, speed_of_light=1.0, d_coef=1.0, b_hat=0.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=32,
    state_dtype=jnp.bfloat16, k_steps=1, h=50, pair_dots=False,
    noise_impl="box_muller", interpret=False,
):
    """``k_steps`` fused relativistic-SGHMC steps in ONE kernel launch.

    As :func:`fused_bnn_multistep` but with the relativistic momentum
    update of :func:`fused_bnn_step_rsghmc`.  Returns
    ``(theta', p', cost)``.  1-input family, both slot layouts.
    ``pair_dots`` as in :func:`fused_bnn_multistep`.
    """
    tbig = theta[0]
    n_extra = len(theta) - 1
    n_chains = tbig.shape[0]
    s = _multistep_slot(tbig, "fused_bnn_multistep_rsghmc")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_multistep_rsghmc: n_chains ({}) must be divisible "
            "by block_chains ({})".format(n_chains, block_chains))
    n_windows, n_inputs, xw_op = _multistep_tables(
        x_win, "fused_bnn_multistep_rsghmc")
    _check_pair_dots(pair_dots, s, n_inputs, block_chains,
                     n_group=len(theta))

    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = _per_step_table(eps, int(k_steps), lambda e: [
        e,
        jnp.sqrt(jnp.maximum(e * (2.0 * d_coef - e * b_hat), 0.0)),
        jnp.full_like(e, prior_scale),
        jnp.full_like(
            e, 1.0 / (mass * mass * speed_of_light * speed_of_light)),
        jnp.full_like(e, 1.0 / mass),
        jnp.full_like(e, d_coef)])
    if pair_dots:
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_multistep_kernel_family_paired(
            RULE_RSGHMC, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), int(h), n_inputs)
    else:
        kernel = _make_multistep_kernel_family(
            RULE_RSGHMC, float(batch_size), float(n_data), block_chains,
            n_windows, int(k_steps), int(h), s, bias_row, n_inputs,
            n_extra=n_extra, noise_impl=noise_impl)
    y_op = jnp.asarray(y_win, jnp.float32)
    theta_new, v_new, _, cost = _family_call(
        RULE_RSGHMC, kernel, theta, v, None, None,
        [xw_op, y_op], [_table_spec(xw_op), _table_spec(y_op)],
        None, state_dtype, block_chains, interpret, pair_dots,
        int_scalars, float_scalars)
    return theta_new, v_new, cost


#  Multi-step burn-in: the adaptive phase VMEM-resident too ------------------

def _sghmc_burnin_step_math(theta, v, tau, g, v_hat, grad, valid, eta,
                            eps, eps_scaled, mdecay, prior_scale):
    """One Springenberg et al. scale-adapted SGHMC burn-in update.

    Identical term ordering to
    :func:`pysgmcmc_tpu.ops.slim_update._sghmc_burnin_math` (the lanes
    burn-in kernel pinned bitwise against the pytree path): minv and the
    tau/g/v_hat EMAs all read OLD values, matching the reference's
    control-dependency chain
    (``/root/reference/pysgmcmc/samplers/sghmc.py:126-196``).  ``valid``
    masks theta/v/minv so padding cells never move (tau/g/v_hat padding
    decays from its all-ones init but is discarded at unpack)."""
    small = 1e-16
    v32 = v.astype(jnp.float32)
    gg = grad + prior_scale * theta
    sqrt_vhat = jnp.sqrt(jnp.maximum(v_hat, 0.0))
    minv = 1.0 / (sqrt_vhat + 2.0 * jnp.sign(sqrt_vhat) * small + small)
    denom = v_hat + 2.0 * jnp.sign(v_hat) * small + small
    tau_new = tau + (-g * g * tau) / denom + 1.0
    r = 1.0 / (tau + 1.0)
    g_new = g - r * g + r * gg
    v_hat_new = v_hat - r * v_hat + r * gg * gg
    sigma = jnp.sqrt(jnp.maximum(
        2.0 * eps_scaled ** 2 * mdecay * minv - eps_scaled ** 4, 1e-16))
    v_new = (v32 - eps ** 2 * minv * gg - mdecay * v32 + sigma * eta) * valid
    return theta + v_new, v_new, tau_new, g_new, v_hat_new, minv * valid


def _sgld_burnin_step_math(theta, tau, g, v_hat, grad, valid, eta,
                           eps, a_coef, sg_safe, prior_scale):
    """One SGLD burn-in update; term ordering of
    :func:`pysgmcmc_tpu.ops.slim_update._sgld_burnin_math`."""
    small = 1e-16
    gg = grad + prior_scale * theta
    sqrt_vhat = jnp.sqrt(jnp.maximum(v_hat, 0.0))
    minv = 1.0 / (sqrt_vhat + 2.0 * jnp.sign(sqrt_vhat) * small + small)
    denom = v_hat + 2.0 * jnp.sign(v_hat) * small + small
    tau_new = tau + (-g * g * tau) / denom + 1.0
    r = 1.0 / (tau + 1.0)
    g_new = g - r * g + r * gg
    v_hat_new = v_hat - r * v_hat + r * gg * gg
    sigma = jnp.sqrt(jnp.maximum(
        2.0 * eps * ((minv * a_coef) / sg_safe), 0.0))
    theta_new = theta + (-eps * minv * a_coef * gg + sigma * eta) * valid
    return theta_new, tau_new, g_new, v_hat_new, minv * valid


def _make_multistep_kernel_burnin(batch_size, n_data, block_chains,
                                  n_windows, k_steps, h, s=S,
                                  bias_row=BIAS_ROW, n_inputs=1,
                                  with_momentum=True, n_extra=1,
                                  noise_impl="box_muller"):
    """Burn-in variant of :func:`_make_multistep_kernel_family`:
    ``k_steps`` self-tuning updates per launch with theta, momentum AND
    the tau/g/v_hat adaptation statistics all resident in the aliased
    output refs — the whole adaptive phase never round-trips HBM between
    steps.  ``with_momentum=True`` is SGHMC, ``False`` is SGLD.  The
    mass-matrix inverse the FINAL step used is written to a separate
    (non-aliased) output group — the value the sampling phase freezes,
    matching :func:`pysgmcmc_tpu.parallel.packed.burnin_chain_lanes`
    semantics.  ``n_extra`` as in :func:`_make_kernel_family`.
    """
    inv_b = 1.0 / batch_size
    inv_n = 1.0 / n_data
    C = block_chains
    big_rows = s + VEC_ROWS
    n_group = 1 + n_extra
    n_slabs = 2 + n_extra
    depth = 2 + n_extra

    def kernel(int_ref, float_ref, *refs):
        refs, take = _take_refs(refs)
        tg = take.group(n_group)
        vg = take.group(n_group) if with_momentum else None
        taug = take.group(n_group)
        gg_ = take.group(n_group)
        vhg = take.group(n_group)
        xw_ref, yw_ref = take(2)
        og = take.group(n_group)
        pg = take.group(n_group) if with_momentum else None
        otaug = take.group(n_group)
        ogg = take.group(n_group)
        ovhg = take.group(n_group)
        minvg = take.group(n_group)
        s_acts, s_gvec = refs[:depth], refs[depth]
        pltpu.prng_seed(int_ref[0], pl.program_id(0))

        for dst, src in zip(og + otaug + ogg + ovhg,
                            tg + taug + gg_ + vhg):
            dst[:] = src[:]
        if with_momentum:
            for dst, src in zip(pg, vg):
                dst[:] = src[:]

        brow = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD), 1)
        bmask = (brow < batch_size).astype(jnp.float32)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD, s), 2)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, s), 1)
        win_iota = jax.lax.broadcasted_iota(jnp.int32, (C, n_windows), 1)
        mat_valid, vec_valid = _psgld_valid_masks(
            C, n_inputs, h, s, bias_row)
        masks = [mat_valid, vec_valid] + [mat_valid] * n_extra
        # hoisted: fori_loop bodies are not loop-invariant-code-motioned
        hmats = _noise_hmats(noise_impl, s)

        def body(t, carry):
            # per-step scalar row: eps, c1 (eps_scaled / a_coef),
            # c2 (mdecay / sg_safe), prior_scale
            eps = float_ref[t, 0]
            c1 = float_ref[t, 1]
            c2 = float_ref[t, 2]
            prior_scale = float_ref[t, 3]
            xin_bf, y = _select_window_bf(
                C, n_windows, win_iota, xw_ref, yw_ref, n_inputs)

            cost, g_w2, g_vec, g_mats = _fwd_bwd(
                og[0][:], [m[:] for m in og[1:]], xin_bf, y,
                bmask, lane3, lane2, s_acts, s_gvec,
                inv_b, inv_n, n_inputs, C, s, bias_row)

            if hmats is None:
                etas = _block_etas(C, s, n_mats=1 + n_extra)
            else:
                etas = _block_etas(C, s, n_mats=1 + n_extra, hmats=hmats)
            grads = [g_w2, g_vec] + list(g_mats)

            def upd(sl_t, sl_v, sl_tau, sl_g, sl_vh, grad, eta, valid):
                if with_momentum:
                    return _sghmc_burnin_step_math(
                        sl_t, sl_v, sl_tau, sl_g, sl_vh, grad, valid,
                        eta, eps, c1, c2, prior_scale)
                t_new, tau_n, g_n, vh_n, minv = _sgld_burnin_step_math(
                    sl_t, sl_tau, sl_g, sl_vh, grad, valid, eta,
                    eps, c1, c2, prior_scale)
                return t_new, None, tau_n, g_n, vh_n, minv

            theta_slabs = _slab_views(og, s, big_rows)
            v_slabs = (_slab_views(pg, s, big_rows) if with_momentum
                       else [None] * n_slabs)
            tau_slabs = _slab_views(otaug, s, big_rows)
            g_slabs = _slab_views(ogg, s, big_rows)
            vh_slabs = _slab_views(ovhg, s, big_rows)

            outs = [
                upd(theta_slabs[i], v_slabs[i], tau_slabs[i],
                    g_slabs[i], vh_slabs[i], grads[i], etas[i], masks[i])
                for i in range(n_slabs)
            ]
            _store_slabs(og, [o[0] for o in outs], s, big_rows)
            if with_momentum:
                _store_slabs(pg, [o[1] for o in outs], s, big_rows,
                             dtype=pg[0].dtype)
            _store_slabs(otaug, [o[2] for o in outs], s, big_rows)
            _store_slabs(ogg, [o[3] for o in outs], s, big_rows)
            _store_slabs(ovhg, [o[4] for o in outs], s, big_rows)
            _store_slabs(minvg, [o[5] for o in outs], s, big_rows)

            og[0][:, big_rows - 1, LANE_B4:LANE_B4 + 1] = cost
            return carry

        jax.lax.fori_loop(0, k_steps, body, 0)

    return kernel


def _make_multistep_kernel_burnin_paired(batch_size, n_data, block_chains,
                                         n_windows, k_steps, h,
                                         with_momentum=True, n_inputs=1):
    """Paired-dot variant of :func:`_make_multistep_kernel_burnin`.

    The W2/W3 slabs of EVERY burn-in state — theta, momentum, the
    tau/g/v_hat adaptation statistics and the running mass-matrix
    inverse — live in paired block-diagonal (Cp, 2s, 2s) scratch for the
    whole k-step loop (12 slabs for SGHMC, 10 for SGLD; ~12 MB per block
    at C=32, far under the VMEM budget), so the adaptive phase runs its
    dots at full 128-lane depth too.  Off-diagonal theta stays exactly
    zero via the masked update; the off-diagonal EMA cells evolve finite
    garbage exactly like the dead padding cells do in the unpaired
    kernel ("decays from init, discarded at unpack") — every EMA op is
    elementwise, so the garbage never touches the diagonal blocks.
    """
    inv_b = 1.0 / batch_size
    inv_n = 1.0 / n_data
    C = block_chains
    Cp = C // 2
    s = S
    big_rows = s + VEC_ROWS

    def kernel(int_ref, float_ref, *refs):
        if with_momentum:
            (tbig, tw3, vbig, vw3, taubig, tauw3, gbig, gw3,
             vhbig, vhw3, xw_ref, yw_ref,
             obig, ow3, pbig, pw3, otaubig, otauw3, ogbig, ogw3,
             ovhbig, ovhw3, minvbig, minvw3,
             s_a1, s_a2, s_a3, s_gvec,
             p_w2, p_w3, p_v2, p_v3, p_tau2, p_tau3, p_g2, p_g3,
             p_vh2, p_vh3, p_m2, p_m3) = refs
        else:
            (tbig, tw3, taubig, tauw3, gbig, gw3,
             vhbig, vhw3, xw_ref, yw_ref,
             obig, ow3, otaubig, otauw3, ogbig, ogw3,
             ovhbig, ovhw3, minvbig, minvw3,
             s_a1, s_a2, s_a3, s_gvec,
             p_w2, p_w3, p_tau2, p_tau3, p_g2, p_g3,
             p_vh2, p_vh3, p_m2, p_m3) = refs
            vbig = vw3 = pbig = pw3 = p_v2 = p_v3 = None
        pltpu.prng_seed(int_ref[0], pl.program_id(0))

        # vec-row state rides the output refs; W2/W3 state is paired
        obig[:] = tbig[:]
        ow3[:] = tw3[:]
        otaubig[:] = taubig[:]
        otauw3[:] = tauw3[:]
        ogbig[:] = gbig[:]
        ogw3[:] = gw3[:]
        ovhbig[:] = vhbig[:]
        ovhw3[:] = vhw3[:]
        p_w2[:] = _pair_mats(tbig[:, 0:s, :], Cp, s)
        p_w3[:] = _pair_mats(tw3[:], Cp, s)
        p_tau2[:] = _pair_mats(taubig[:, 0:s, :], Cp, s)
        p_tau3[:] = _pair_mats(tauw3[:], Cp, s)
        p_g2[:] = _pair_mats(gbig[:, 0:s, :], Cp, s)
        p_g3[:] = _pair_mats(gw3[:], Cp, s)
        p_vh2[:] = _pair_mats(vhbig[:, 0:s, :], Cp, s)
        p_vh3[:] = _pair_mats(vhw3[:], Cp, s)
        if with_momentum:
            pbig[:] = vbig[:]
            pw3[:] = vw3[:]
            p_v2[:] = _pair_mats(vbig[:, 0:s, :].astype(jnp.float32),
                                 Cp, s)
            p_v3[:] = _pair_mats(vw3[:].astype(jnp.float32), Cp, s)

        brow = jax.lax.broadcasted_iota(jnp.int32, (C, B_PAD), 1)
        bmask = (brow < batch_size).astype(jnp.float32)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, s), 1)
        lane3p = jax.lax.broadcasted_iota(jnp.int32, (Cp, B_PAD, 2 * s), 2)
        bias_lane_p = (lane3p % s) == BIAS_ROW
        first_half = lane3p < s
        p_move = _paired_fold_const(s)
        win_iota = jax.lax.broadcasted_iota(jnp.int32, (C, n_windows), 1)

        rowm = jax.lax.broadcasted_iota(
            jnp.int32, (Cp, 2 * s, 2 * s), 1)
        lanem = jax.lax.broadcasted_iota(
            jnp.int32, (Cp, 2 * s, 2 * s), 2)
        same_block = (rowm < s) == (lanem < s)
        rr = rowm % s
        ll = lanem % s
        mat_valid_p = (
            same_block & ((rr < h) | (rr == BIAS_ROW)) & (ll < h)
        ).astype(jnp.float32)
        _, vec_valid = _psgld_valid_masks(C, n_inputs, h, s, BIAS_ROW)

        def body(t, carry):
            # per-step scalar row: eps, c1 (eps_scaled / a_coef),
            # c2 (mdecay / sg_safe), prior_scale
            eps = float_ref[t, 0]
            c1 = float_ref[t, 1]
            c2 = float_ref[t, 2]
            prior_scale = float_ref[t, 3]
            xin_bf, y = _select_window_bf(
                C, n_windows, win_iota, xw_ref, yw_ref, n_inputs)

            cost, g_w2p, g_vec, g_w3p = _fwd_bwd_paired(
                obig[:], p_w2[:].astype(jnp.bfloat16),
                p_w3[:].astype(jnp.bfloat16), xin_bf, y, bmask,
                lane2, lane3p, bias_lane_p, first_half, p_move,
                s_a1, s_a2, s_a3, s_gvec, inv_b, inv_n, C, s,
                n_inputs)

            eta_p = _normal_3d((Cp, 4 * s, 2 * s))
            eta_vec = _normal_3d((C, VEC_ROWS, s))

            def upd(sl_t, sl_v, sl_tau, sl_g, sl_vh, grad, eta, valid):
                if with_momentum:
                    return _sghmc_burnin_step_math(
                        sl_t, sl_v, sl_tau, sl_g, sl_vh, grad, valid,
                        eta, eps, c1, c2, prior_scale)
                t_new, tau_n, g_n, vh_n, minv = _sgld_burnin_step_math(
                    sl_t, sl_tau, sl_g, sl_vh, grad, valid, eta,
                    eps, c1, c2, prior_scale)
                return t_new, None, tau_n, g_n, vh_n, minv

            # paired W2 slab
            t_new, v_new, tau_n, g_n, vh_n, minv = upd(
                p_w2[:], p_v2[:] if with_momentum else None,
                p_tau2[:], p_g2[:], p_vh2[:],
                g_w2p, eta_p[:, 0:2 * s, :], mat_valid_p)
            p_w2[:] = t_new
            p_tau2[:] = tau_n
            p_g2[:] = g_n
            p_vh2[:] = vh_n
            p_m2[:] = minv
            if with_momentum:
                p_v2[:] = v_new

            # vector rows (unpaired, exactly the standard kernel)
            t_new, v_new, tau_n, g_n, vh_n, minv = upd(
                obig[:, s:big_rows, :],
                pbig[:, s:big_rows, :] if with_momentum else None,
                otaubig[:, s:big_rows, :], ogbig[:, s:big_rows, :],
                ovhbig[:, s:big_rows, :], g_vec, eta_vec, vec_valid)
            obig[:, s:big_rows, :] = t_new
            otaubig[:, s:big_rows, :] = tau_n
            ogbig[:, s:big_rows, :] = g_n
            ovhbig[:, s:big_rows, :] = vh_n
            minvbig[:, s:big_rows, :] = minv
            if with_momentum:
                pbig[:, s:big_rows, :] = v_new.astype(pbig.dtype)

            # paired W3 slab
            t_new, v_new, tau_n, g_n, vh_n, minv = upd(
                p_w3[:], p_v3[:] if with_momentum else None,
                p_tau3[:], p_g3[:], p_vh3[:],
                g_w3p, eta_p[:, 2 * s:4 * s, :], mat_valid_p)
            p_w3[:] = t_new
            p_tau3[:] = tau_n
            p_g3[:] = g_n
            p_vh3[:] = vh_n
            p_m3[:] = minv
            if with_momentum:
                p_v3[:] = v_new

            obig[:, big_rows - 1, LANE_B4:LANE_B4 + 1] = cost
            return carry

        jax.lax.fori_loop(0, k_steps, body, 0)

        obig[:, 0:s, :] = _unpair_mats(p_w2[:], C, s)
        ow3[:] = _unpair_mats(p_w3[:], C, s)
        otaubig[:, 0:s, :] = _unpair_mats(p_tau2[:], C, s)
        otauw3[:] = _unpair_mats(p_tau3[:], C, s)
        ogbig[:, 0:s, :] = _unpair_mats(p_g2[:], C, s)
        ogw3[:] = _unpair_mats(p_g3[:], C, s)
        ovhbig[:, 0:s, :] = _unpair_mats(p_vh2[:], C, s)
        ovhw3[:] = _unpair_mats(p_vh3[:], C, s)
        minvbig[:, 0:s, :] = _unpair_mats(p_m2[:], C, s)
        minvw3[:] = _unpair_mats(p_m3[:], C, s)
        if with_momentum:
            pbig[:, 0:s, :] = _unpair_mats(p_v2[:], C, s).astype(
                pbig.dtype)
            pw3[:] = _unpair_mats(p_v3[:], C, s).astype(pw3.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mdecay", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "state_dtype", "k_steps",
                     "h", "pair_dots", "noise_impl", "interpret"),
)
def fused_bnn_multistep_burnin(
    theta, v, tau, g, v_hat, x_win, y_win, eps, seed,
    mdecay=0.05, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=32,
    state_dtype=jnp.bfloat16, k_steps=1, h=50, pair_dots=False,
    noise_impl="box_muller", interpret=False,
):
    """``k_steps`` fused SGHMC BURN-IN steps in ONE kernel launch.

    The whole Springenberg et al. self-tuning update — forward,
    likelihood, backward, tau/g/v_hat EMAs, mass-matrix inverse, noise,
    momentum and parameter update — runs in-kernel with every piece of
    state VMEM-resident across the loop.  Returns
    ``(theta', v', tau', g', v_hat', minv, cost)`` where ``minv`` is the
    mass-matrix inverse the final step USED (the value the sampling
    phase freezes; reference semantics
    ``/root/reference/pysgmcmc/samplers/base_classes.py:432-454``).
    """
    tbig = theta[0]
    n_group = len(theta)
    n_extra = n_group - 1
    n_chains = tbig.shape[0]
    if k_steps < 1:
        raise ValueError(
            "fused_bnn_multistep_burnin: k_steps must be >= 1 (the "
            "non-aliased minv outputs are only written inside the "
            "step loop); got {}".format(k_steps))
    s = _multistep_slot(tbig, "fused_bnn_multistep_burnin")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_multistep_burnin: n_chains ({}) must be divisible "
            "by block_chains ({})".format(n_chains, block_chains))
    n_windows, n_inputs, xw_op = _multistep_tables(
        x_win, "fused_bnn_multistep_burnin")
    _check_pair_dots(pair_dots, s, n_inputs, block_chains,
                     n_group=n_group)

    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    sg_sqrt = jnp.sqrt(jnp.asarray(scale_grad, jnp.float32))
    float_scalars = _per_step_table(eps, int(k_steps), lambda e: [
        e, e / sg_sqrt,
        jnp.full_like(e, mdecay), jnp.full_like(e, prior_scale)])

    state_specs = [_big_spec(block_chains, s)] + [
        _mat_spec(block_chains, s)] * n_extra
    in_specs = (
        state_specs * 5 + [_table_spec(xw_op), _table_spec(y_win)]
    )
    operands = (list(theta) + list(v) + list(tau) + list(g)
                + list(v_hat)
                + [xw_op, jnp.asarray(y_win, jnp.float32)])
    out_shape = (
        tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta)
        + tuple(jax.ShapeDtypeStruct(t.shape, state_dtype) for t in theta)
        + tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32)
                for t in theta) * 4
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chains // block_chains,),
        in_specs=in_specs,
        out_specs=tuple(state_specs) * 6,
        scratch_shapes=(_paired_scratch(block_chains, s, 12) if pair_dots
                        else _multistep_scratch(block_chains, s,
                                                depth=2 + n_extra)),
    )
    # theta/v/tau/g/v_hat alias their outputs; minv outputs are fresh
    aliases = {i + 2: i for i in range(5 * n_group)}
    if pair_dots:
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_multistep_kernel_burnin_paired(
            float(batch_size), float(n_data), block_chains, n_windows,
            int(k_steps), int(h), with_momentum=True,
            n_inputs=n_inputs)
    else:
        kernel = _make_multistep_kernel_burnin(
            float(batch_size), float(n_data), block_chains, n_windows,
            int(k_steps), int(h), s, bias_row, n_inputs,
            with_momentum=True, n_extra=n_extra,
            noise_impl=noise_impl)
    interpreter = pltpu.InterpretParams() if interpret else False
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)
    groups = [tuple(outs[i * n_group:(i + 1) * n_group])
              for i in range(6)]
    theta_new, v_new, tau_new, g_new, vh_new, minv_new = groups
    cost = theta_new[0][:, s + VEC_ROWS - 1, 0:1]
    return theta_new, v_new, tau_new, g_new, vh_new, minv_new, cost


@functools.partial(
    jax.jit,
    static_argnames=("a_coef", "scale_grad", "prior_scale", "batch_size",
                     "n_data", "block_chains", "k_steps", "h",
                     "pair_dots", "noise_impl", "interpret"),
)
def fused_bnn_multistep_burnin_sgld(
    theta, tau, g, v_hat, x_win, y_win, eps, seed,
    a_coef=1.0, scale_grad=1.0, prior_scale=0.0,
    batch_size=20, n_data=100, block_chains=32,
    k_steps=1, h=50, pair_dots=False, noise_impl="box_muller", interpret=False,
):
    """``k_steps`` fused SGLD BURN-IN steps in ONE kernel launch.

    As :func:`fused_bnn_multistep_burnin` but momentum-free.  Returns
    ``(theta', tau', g', v_hat', minv, cost)``.
    """
    tbig = theta[0]
    n_group = len(theta)
    n_extra = n_group - 1
    n_chains = tbig.shape[0]
    if k_steps < 1:
        raise ValueError(
            "fused_bnn_multistep_burnin_sgld: k_steps must be >= 1 (the "
            "non-aliased minv outputs are only written inside the "
            "step loop); got {}".format(k_steps))
    s = _multistep_slot(tbig, "fused_bnn_multistep_burnin_sgld")
    bias_row = BIAS_ROW if s == S else WIDE_BIAS_ROW
    if n_chains % block_chains:
        raise ValueError(
            "fused_bnn_multistep_burnin_sgld: n_chains ({}) must be "
            "divisible by block_chains ({})".format(
                n_chains, block_chains))
    n_windows, n_inputs, xw_op = _multistep_tables(
        x_win, "fused_bnn_multistep_burnin_sgld")
    _check_pair_dots(pair_dots, s, n_inputs, block_chains,
                     n_group=n_group)

    sg = jnp.asarray(scale_grad, jnp.float32)
    small = 1e-16
    sg_safe = sg + 2.0 * jnp.sign(sg) * small + small
    int_scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    float_scalars = _per_step_table(eps, int(k_steps), lambda e: [
        e, jnp.full_like(e, a_coef),
        jnp.broadcast_to(sg_safe, e.shape),
        jnp.full_like(e, prior_scale)])

    state_specs = [_big_spec(block_chains, s)] + [
        _mat_spec(block_chains, s)] * n_extra
    in_specs = (
        state_specs * 4 + [_table_spec(xw_op), _table_spec(y_win)]
    )
    operands = (list(theta) + list(tau) + list(g) + list(v_hat)
                + [xw_op, jnp.asarray(y_win, jnp.float32)])
    out_shape = tuple(
        jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta) * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chains // block_chains,),
        in_specs=in_specs,
        out_specs=tuple(state_specs) * 5,
        scratch_shapes=(_paired_scratch(block_chains, s, 10) if pair_dots
                        else _multistep_scratch(block_chains, s,
                                                depth=2 + n_extra)),
    )
    aliases = {i + 2: i for i in range(4 * n_group)}
    if pair_dots:
        if noise_impl != "box_muller":
            raise ValueError(
                "pair_dots kernels support noise_impl='box_muller' only")
        kernel = _make_multistep_kernel_burnin_paired(
            float(batch_size), float(n_data), block_chains, n_windows,
            int(k_steps), int(h), with_momentum=False,
            n_inputs=n_inputs)
    else:
        kernel = _make_multistep_kernel_burnin(
            float(batch_size), float(n_data), block_chains, n_windows,
            int(k_steps), int(h), s, bias_row, n_inputs,
            with_momentum=False, n_extra=n_extra,
            noise_impl=noise_impl)
    interpreter = pltpu.InterpretParams() if interpret else False
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpreter,
    )(int_scalars, float_scalars, *operands)
    groups = [tuple(outs[i * n_group:(i + 1) * n_group])
              for i in range(5)]
    theta_new, tau_new, g_new, vh_new, minv_new = groups
    cost = theta_new[0][:, s + VEC_ROWS - 1, 0:1]
    return theta_new, tau_new, g_new, vh_new, minv_new, cost

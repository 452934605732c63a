"""A/B two exact noise micro-optimizations on the real multi-step kernels.

The ablation roofline (benchmarks/results_wide_roofline.json) measured
Box-Muller noise generation as the single largest cost of the fused
kernels: 46% of the flagship (H=50) step, 65% of the wide (H=100) step.
Two candidate *exact* optimizations attack it, both applied here by
monkeypatching the kernel's noise helpers (they are module-global
lookups, so patched functions reach the traced kernels after
``jax.clear_caches()``):

- ``sincos``: replace the ``sin`` evaluation of the dual-output
  Box-Muller with the algebraic identity ``sin = +-sqrt(1 - cos^2)``
  (sign from the quadrant: ``sin(2*pi*u) >= 0`` iff ``u <= 1/2``) — one
  polynomial transcendental fewer per normal pair, exact up to fp
  rounding.
- ``row-shrink``: draw noise only for sublane rows ``<= bias_row``
  (rounded up to the 8-row sublane), zero-padding the dead rows that
  every update rule masks anyway — 12.5% fewer normals at s=64, 6.3%
  at s=128.

MEASURED CONCLUSION (v5e, 2026-08-19, k=200 multi-step SGHMC, 8192
chains, block=32, best of 3):

    H=50  baseline 3.156 ms/step | sincos 3.171 | row-shrink 3.166 | both 3.183
    H=100 baseline 7.249 ms/step | sincos 7.684 | row-shrink 7.430 | both 7.796

BOTH LOSE — the VPU evaluates ``sin`` about as fast as the
sqrt+compare+select chain that replaces it (and Mosaic must keep the
``cos`` register alive longer, hurting scheduling), while the shrunk
draw's odd row counts (56 of 64, 120 of 128) break the clean
full-register tiling of the ``(C, s, 2s)`` draws and cost more in
relayout than the skipped 6-12% of transcendentals save.  The shipped
kernels therefore keep the plain dual-output Box-Muller over full
slabs (``ops/fused_step.py::_normal_3d/_block_etas``).  The
distribution gate below confirms the sincos variant is statistically
sound (moments pass; it loses on speed, not correctness).

Run ON THE CHIP:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/archive/noise_ab_tpu.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from pysgmcmc_tpu.ops import fused_step
from pysgmcmc_tpu.parallel.packed import sample_chain_fused
from pysgmcmc_tpu.samplers.base import sample_chain
from bench import build_workload

K = 200
N_CHAINS = 8192

_BASE_NORMAL_3D = fused_step._normal_3d
_BASE_BLOCK_ETAS = fused_step._block_etas


def _normal_3d_sincos(shape):
    """Variant: sin from cos via +-sqrt(1-c^2) instead of a sin lowering."""
    rows = shape[-2]
    if rows % 2 == 0:
        half = shape[:-2] + (rows // 2,) + shape[-1:]
        u1 = fused_step._uniform_3d(half)
        u2 = fused_step._uniform_3d(half)
        radius = jnp.sqrt(-2.0 * jnp.log1p(-u1))
        c = jnp.cos(2.0 * jnp.pi * u2)
        s_val = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        s_val = jnp.where(u2 < 0.5, s_val, -s_val)
        return jnp.concatenate([radius * c, radius * s_val], axis=-2)
    return _BASE_NORMAL_3D(shape)


def _block_etas_rowshrink(c, s=None, bias_row=None, n_mats=2):
    """Variant: draw only ceil((bias_row+1)/8)*8 sublane rows, zero the rest.

    The kernel factories call ``_block_etas(C, s, n_mats=...)`` without a
    bias row, so infer it from the slot size (the only two slots in use).
    """
    if s is None:
        s = fused_step.S
    if bias_row is None:
        bias_row = (fused_step.BIAS_ROW if s == fused_step.S
                    else fused_step.WIDE_BIAS_ROW)
    n_rows = min(s, -(-(bias_row + 1) // 8) * 8)

    def mat_draw(width):
        eta = fused_step._normal_3d((c, n_rows, width))
        if n_rows < s:
            eta = jnp.concatenate(
                [eta, jnp.zeros((c, s - n_rows, width), jnp.float32)],
                axis=1)
        return eta

    mat_etas = []
    for _ in range(n_mats // 2):
        eta = mat_draw(2 * s)
        mat_etas += [eta[:, :, 0:s], eta[:, :, s:2 * s]]
    if n_mats % 2:
        mat_etas.append(mat_draw(s))
    eta_vec = fused_step._normal_3d((c, fused_step.VEC_ROWS, s))
    return (mat_etas[0], eta_vec) + tuple(mat_etas[1:])


CONFIGS = [
    ("baseline (sin, full rows)", _BASE_NORMAL_3D, _BASE_BLOCK_ETAS),
    ("sincos only", _normal_3d_sincos, _BASE_BLOCK_ETAS),
    ("row-shrink only", _BASE_NORMAL_3D, _block_etas_rowshrink),
    ("sincos + row-shrink", _normal_3d_sincos, _block_etas_rowshrink),
]


def _patch(normal_3d, block_etas):
    fused_step._normal_3d = normal_3d
    fused_step._block_etas = block_etas
    jax.clear_caches()


def measure(units, block, label):
    sampler, positions, select_batch, (x, y) = build_workload(
        N_CHAINS, network="dense", units=units, return_data=True)
    sampler.burn_in_steps = 100

    @jax.jit
    def warm(positions, key):
        def one(p, ck):
            k1, k2 = jax.random.split(ck)
            st = sampler.init(p, k1)
            st, _ = sample_chain(
                sampler, st, k2, 1, batch_fn=select_batch,
                keep_every=sampler.burn_in_steps + 10,
                collect_costs=False)
            return st
        return jax.vmap(one)(positions, jax.random.split(key, N_CHAINS))

    states = warm(positions, jax.random.PRNGKey(0))
    jax.block_until_ready(states)

    rows = []
    for name, normal_3d, block_etas in CONFIGS:
        _patch(normal_3d, block_etas)
        try:
            @jax.jit
            def f(states, key):
                st, _, costs = sample_chain_fused(
                    sampler, states, key, 1, x, y, batch_size=20,
                    keep_every=K, block_chains=block,
                    state_dtype=jnp.bfloat16,
                    collect_positions=False, multistep=True)
                return st, costs

            out = f(states, jax.random.PRNGKey(1))
            jax.block_until_ready(out[1])
            assert np.isfinite(np.asarray(out[1])).all(), name
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                out = f(states, jax.random.PRNGKey(2 + i))
                jax.block_until_ready(out[1])
                best = min(best, time.perf_counter() - t0)
        finally:
            _patch(_BASE_NORMAL_3D, _BASE_BLOCK_ETAS)
        ms = best / K * 1e3
        rows.append({"config": name, "ms_per_step": round(ms, 4),
                     "steps_per_sec_chip": round(N_CHAINS / ms * 1e3)})
        print("  %-28s %7.3f ms/step (%.2fM steps/s)"
              % (name, ms, N_CHAINS / ms / 1e6 * 1e3), flush=True)
    return {"label": label, "units": list(units), "k_steps": K,
            "n_chains": N_CHAINS, "block_chains": block, "rows": rows}


def distribution_gate(s, bias_row, n_mats, normal_3d, block_etas,
                      expect_dead_zero):
    """Write one raw variant draw from a real-PRNG kernel; gate moments,
    per-row coverage of the consumed rows and (for the shrunk variant)
    exact zeros beyond the sublane-rounded draw boundary."""
    C = 8
    _patch(normal_3d, block_etas)
    try:
        def kernel(seed_ref, *outs):
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
            etas = fused_step._block_etas(C, s, bias_row, n_mats=n_mats)
            for ref, val in zip(outs, etas):
                ref[:] = val

        shapes = ([jax.ShapeDtypeStruct((C, s, s), jnp.float32),
                   jax.ShapeDtypeStruct((C, fused_step.VEC_ROWS, s),
                                        jnp.float32)]
                  + [jax.ShapeDtypeStruct((C, s, s), jnp.float32)]
                  * (n_mats - 1))
        out = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=tuple(
                pl.BlockSpec(sh.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM) for sh in shapes),
            out_shape=tuple(shapes),
        )(jnp.asarray([1234], jnp.int32))
    finally:
        _patch(_BASE_NORMAL_3D, _BASE_BLOCK_ETAS)

    # the shrunk draw rounds up to the 8-row sublane: rows beyond the
    # round-up are exactly zero; everything below it is a real draw
    drawn_rows = min(s, -(-(bias_row + 1) // 8) * 8) if expect_dead_zero else s
    report = {}
    mats = [np.asarray(out[0])] + [np.asarray(m) for m in out[2:]]
    for i, eta in enumerate(mats):
        valid = eta[:, :drawn_rows, :].ravel()
        dead = eta[:, drawn_rows:, :]
        row_var = eta[:, :drawn_rows, :].var(axis=(0, 2))
        report["mat%d" % i] = {
            "mean": round(float(valid.mean()), 5),
            "var": round(float(valid.var()), 5),
            "skew": round(float(((valid - valid.mean()) ** 3).mean()
                                / valid.std() ** 3), 5),
            "kurtosis": round(float(((valid - valid.mean()) ** 4).mean()
                                    / valid.var() ** 2), 5),
            "min_row_var": round(float(row_var.min()), 5),
            "rows_beyond_draw_exactly_zero": bool((dead == 0.0).all()),
        }
        stats = report["mat%d" % i]
        assert abs(stats["mean"]) < 0.01, stats
        assert abs(stats["var"] - 1.0) < 0.02, stats
        assert abs(stats["skew"]) < 0.05, stats
        assert abs(stats["kurtosis"] - 3.0) < 0.15, stats
        assert stats["min_row_var"] > 0.8, stats
        assert stats["rows_beyond_draw_exactly_zero"], stats
    vec = np.asarray(out[1]).ravel()
    report["vec"] = {"mean": round(float(vec.mean()), 5),
                     "var": round(float(vec.var()), 5)}
    assert abs(report["vec"]["mean"]) < 0.05
    assert abs(report["vec"]["var"] - 1.0) < 0.1
    return report


def main():
    results = [measure((50, 50, 50), 32, "H=50 multi-step SGHMC"),
               measure((100, 100, 100), 32, "H=100 multi-step SGHMC")]
    print("distribution gates (variant draws are statistically sound):")
    gates = {
        "sincos_s64": distribution_gate(
            64, fused_step.BIAS_ROW, 2, _normal_3d_sincos,
            _BASE_BLOCK_ETAS, expect_dead_zero=False),
        "rowshrink_s128": distribution_gate(
            128, fused_step.WIDE_BIAS_ROW, 2, _BASE_NORMAL_3D,
            _block_etas_rowshrink, expect_dead_zero=True),
        "both_s128": distribution_gate(
            128, fused_step.WIDE_BIAS_ROW, 2, _normal_3d_sincos,
            _block_etas_rowshrink, expect_dead_zero=True),
    }
    for k, v in gates.items():
        print(" ", k, json.dumps(v))
    print(json.dumps({"results": results}, indent=1))


if __name__ == "__main__":
    main()

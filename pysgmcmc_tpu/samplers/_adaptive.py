"""Scale-adapted burn-in statistics shared by SGHMC and SGLD.

Implements the Springenberg et al. (NIPS 2016) self-tuning burn-in: per
parameter, exponential moving estimates of the gradient mean ``g`` and
uncentered second moment ``v_hat`` with a self-tuning horizon ``tau``, from
which a diagonal mass-matrix inverse ``minv = 1/sqrt(v_hat)`` is derived.

Reference semantics reproduced exactly (``/root/reference/pysgmcmc/samplers/
sghmc.py:126-196`` and ``sgld.py:117-180``), where TF control-dependency
chains enforce read-old-value-then-update ordering:

    r         = 1 / (tau + 1)                    # OLD tau   (sghmc.py:168)
    minv_new  = 1 / sqrt(v_hat)                  # OLD v_hat (sghmc.py:179-183)
    tau_new   = tau + (-g*g*tau / v_hat) + 1     # OLD g, v_hat (sghmc.py:172-176)
    g_new     = g - r*g + r*grad                 # (sghmc.py:186-190)
    v_hat_new = v_hat - r*v_hat + r*grad**2      # (sghmc.py:192-196)

(The load-bearing ``1/(tau+1)`` quirk is noted at ``sghmc.py:161-163``.)

After ``burn_in_steps`` the reference freezes ``minv`` by feeding the stored
arrays back into the graph (``base_classes.py:449-454``) while the EMA ops
keep running harmlessly.  Here the freeze is a ``jnp.where`` on the step
counter — no host involvement, fully ``vmap``/``scan`` compatible.

Examples
--------
One update with old tau = g = v_hat = 1 and grad = 2 (so r = 1/2):

>>> import jax.numpy as jnp
>>> stats = init_stats(jnp.ones(1))
>>> stats, minv = update_stats(stats, jnp.full(1, 2.0), burning_in=True)
>>> [round(float(leaf[0]), 3) for leaf in (stats.tau, stats.g, stats.v_hat)]
[1.0, 1.5, 2.5]
>>> round(float(minv[0]), 3)  # 1/sqrt(old v_hat)
1.0
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pysgmcmc_tpu.utils.numeric import safe_divide, safe_sqrt


class AdaptiveStats(NamedTuple):
    """Per-leaf burn-in statistics (same shapes as the target parameters)."""

    tau: any
    g: any
    v_hat: any
    minv: any


def init_stats(params):
    """tau = g = v_hat = 1, minv = 1/sqrt(v_hat) = 1 (cf. ``sghmc.py:126-149``)."""
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    return AdaptiveStats(tau=ones, g=ones, v_hat=ones, minv=ones)


def update_stats(stats, grads, burning_in, phase=None):
    """One burn-in EMA update; frozen (except minv tracking) after burn-in.

    Returns ``(new_stats, minv_used)`` where ``minv_used`` is the
    mass-matrix inverse the *current* step must use: the freshly computed
    ``1/sqrt(old v_hat)`` during burn-in, the frozen value afterwards —
    mirroring the reference's minv feed (``base_classes.py:432-454``).

    ``phase`` statically specializes the step when the caller knows which
    side of the burn-in boundary it is on (the scan is split there, see
    :func:`pysgmcmc_tpu.samplers.base.sample_chain`):

    - ``None``: dynamic ``jnp.where`` on ``burning_in`` (default; reference
      trajectory parity for a single scan crossing the boundary).
    - ``"burn_in"``: always-adapting — skips the frozen-minv read.
    - ``"sampling"``: fully frozen — returns ``(stats, stats.minv)``
      untouched, so the stats tensors become loop invariants and the
      sampling-phase scan carries ~half the HBM traffic of the dynamic
      step.  Positions are bitwise identical to the dynamic path (the
      post-burn-in EMA updates never influence the update; cf. the
      reference where the assign chain keeps running harmlessly while the
      frozen minv is fed).
    """
    if phase == "sampling":
        return stats, stats.minv
    if phase not in (None, "burn_in"):
        raise ValueError(
            "update_stats: phase must be None, 'burn_in' or 'sampling'; "
            "got {!r}".format(phase)
        )

    # EMA stats keep updating after burn-in in the reference too (the assign
    # chain still executes when minv is fed); they simply no longer influence
    # the update.  Keeping the same semantics costs a few fused VPU ops and
    # preserves trajectory parity.  Separate tree_maps below: XLA CSE merges
    # the shared subexpressions, so this traces to one fused elementwise pass.
    tree_map = jax.tree_util.tree_map
    if phase == "burn_in":
        # statically adapting: no frozen-minv read, no select
        minv_used = tree_map(
            lambda v_hat: safe_divide(1.0, safe_sqrt(v_hat)), stats.v_hat
        )
    else:
        minv_used = tree_map(
            lambda v_hat, frozen: jnp.where(
                burning_in, safe_divide(1.0, safe_sqrt(v_hat)), frozen
            ),
            stats.v_hat,
            stats.minv,
        )
    tau_new = tree_map(
        lambda tau, g, v_hat: tau + safe_divide(-g * g * tau, v_hat) + 1.0,
        stats.tau,
        stats.g,
        stats.v_hat,
    )
    def _g_new(tau, g, grad):
        r = 1.0 / (tau + 1.0)
        return g - r * g + r * grad

    def _v_hat_new(tau, v_hat, grad):
        r = 1.0 / (tau + 1.0)
        return v_hat - r * v_hat + r * grad * grad

    g_new = tree_map(_g_new, stats.tau, stats.g, grads)
    v_hat_new = tree_map(_v_hat_new, stats.tau, stats.v_hat, grads)

    new_stats = AdaptiveStats(tau=tau_new, g=g_new, v_hat=v_hat_new, minv=minv_used)
    return new_stats, minv_used

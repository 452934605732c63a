"""Chain-health / failure detection for sampling runs.

The reference's only failure handling is numeric *prevention*
(``safe_divide``/``safe_sqrt``/noise clipping — SURVEY.md §5); nothing
detects a diverged or stuck chain after the fact.  These helpers run on
device over ``(n_chains, n_samples, ...)`` histories and return a compact
report suitable for gating long runs (e.g. abort-and-restart from the last
checkpoint when chains diverge).

Examples
--------
>>> import numpy as np
>>> good = np.random.default_rng(0).standard_normal((2, 50, 1))
>>> health = check_chains(good)
>>> (bool(health.ok), bool(health.diverged.any()))
(True, False)
>>> costs = np.array([[1.0, 2.0, np.inf, 3.0], [1.0, 1.0, 1.0, 1.0]])
>>> divergence_step(costs).tolist()  # 4 == never diverged
[2, 4]
"""

from typing import NamedTuple

import jax.numpy as jnp


class ChainHealth(NamedTuple):
    finite_fraction: jnp.ndarray  # fraction of finite draws, per chain
    diverged: jnp.ndarray  # bool per chain: any non-finite draw
    stuck: jnp.ndarray  # bool per chain: ~zero movement in the last window
    ok: jnp.ndarray  # scalar bool: every chain finite and moving


def check_chains(positions, stuck_window=100, stuck_tol=0.0):
    """Health report for chain histories.

    Parameters
    ----------
    positions : array (n_chains, n_samples, ...) or pytree thereof
        Collected positions (as returned by ``run_chains``).
    stuck_window : int
        Trailing window length used for the stuck-chain check.
    stuck_tol : float
        A chain is "stuck" when the per-dimension std over the trailing
        window is <= this for every dimension.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(positions)
    flat = jnp.concatenate(
        [leaf.reshape(leaf.shape[0], leaf.shape[1], -1) for leaf in leaves],
        axis=2,
    )
    n_chains, n_samples = flat.shape[:2]

    finite = jnp.isfinite(flat).all(axis=2)  # (chains, samples)
    finite_fraction = finite.mean(axis=1)
    diverged = ~finite.all(axis=1)

    window = flat[:, -min(stuck_window, n_samples):, :]
    movement = jnp.nan_to_num(window, nan=0.0).std(axis=1)  # (chains, dim)
    stuck = (movement <= stuck_tol).all(axis=1) & ~diverged

    ok = (~diverged).all() & (~stuck).all()
    return ChainHealth(
        finite_fraction=finite_fraction, diverged=diverged, stuck=stuck, ok=ok
    )


def divergence_step(costs):
    """First step index at which each chain's cost became non-finite.

    ``costs``: (n_chains, n_samples).  Returns (n_chains,) int32 —
    ``n_samples`` when the chain never diverged.  Useful for bisecting which
    stepsize blew up in a sweep.
    """
    costs = jnp.asarray(costs)
    bad = ~jnp.isfinite(costs)
    never = jnp.full(costs.shape[0], costs.shape[1], dtype=jnp.int32)
    first = jnp.argmax(bad, axis=1).astype(jnp.int32)
    return jnp.where(bad.any(axis=1), first, never)

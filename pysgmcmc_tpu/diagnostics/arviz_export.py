"""ArviZ interop: export traces to the ``InferenceData`` ecosystem.

The reference interops with the wider PPL toolchain by duck-typing pymc3
and returning a real ``pymc3.backends.base.MultiTrace``
(``/root/reference/pysgmcmc/diagnostics/sample_chains.py:338-384``), so its
posteriors plug into pymc3's diagnostics and plotting.  The modern
equivalent of that ecosystem is `ArviZ <https://python.arviz.org>`_: every
major PPL (pymc, numpyro, stan, …) exchanges posteriors as
``arviz.InferenceData`` objects.

Two layers, so the conversion is testable without arviz installed:

- :func:`to_inference_dict` — pure numpy: normalizes any of this
  framework's posterior containers (:class:`~pysgmcmc_tpu.diagnostics.
  sample_chains.MultiTrace`, a single :class:`~pysgmcmc_tpu.diagnostics.
  sample_chains.PYSGMCMCTrace`, or raw ``(n_chains, n_draws, *shape)``
  pytrees as produced by :func:`pysgmcmc_tpu.parallel.chains.run_chains`)
  into the ``{group: {var: (chain, draw, *shape) array}}`` layout that
  ``arviz.from_dict`` consumes verbatim.
- :func:`to_arviz` — the thin adapter: ``arviz.from_dict(**groups)``.
  Raises a descriptive ``ImportError`` when arviz is not installed (this
  image does not ship it; the tests ``pytest.importorskip`` the adapter
  and pin the dict layout instead).

Examples
--------
>>> import numpy as np
>>> chains = {"w": np.zeros((2, 5, 3))}           # 2 chains, 5 draws
>>> d = to_inference_dict(chains)
>>> sorted(d), d["posterior"]["w"].shape
(['posterior'], (2, 5, 3))
>>> d = to_inference_dict({"w": np.zeros((2, 5))},
...                       costs=np.ones((2, 5)))
>>> d["sample_stats"]["lp"].shape                  # lp = -cost
(2, 5)
>>> float(d["sample_stats"]["lp"][0, 0])
-1.0
"""

import numpy as np


def _is_trace(obj):
    # isinstance without import-cycle gymnastics: the containers live in
    # sample_chains and are always importable here.
    from pysgmcmc_tpu.diagnostics.sample_chains import (
        MultiTrace,
        PYSGMCMCTrace,
    )

    if isinstance(obj, MultiTrace):
        return "multi"
    if isinstance(obj, PYSGMCMCTrace):
        return "single"
    return None


def _posterior_vars(chains):
    """Normalize a posterior source into ``{name: (chain, draw, *shape)}``."""
    kind = _is_trace(chains)
    if kind == "multi":
        return {
            name: np.stack(
                [np.asarray(t.get_values(name)) for t in chains.traces]
            )
            for name in chains.varnames
        }
    if kind == "single":
        return {
            name: np.asarray(chains.get_values(name))[None]
            for name in chains.varnames
        }
    if isinstance(chains, dict):
        out = {str(k): np.asarray(v) for k, v in chains.items()}
    else:
        # any other pytree (e.g. a list of leaves): enumerate like
        # PYSGMCMCTrace does for anonymous variables
        import jax

        leaves = jax.tree_util.tree_leaves(chains)
        if not leaves:
            raise ValueError("to_inference_dict: no posterior variables")
        names = (
            ["x"] if len(leaves) == 1
            else ["x_{}".format(i) for i in range(len(leaves))]
        )
        out = {n: np.asarray(v) for n, v in zip(names, leaves)}
    for name, arr in out.items():
        if arr.ndim < 2:
            raise ValueError(
                "to_inference_dict: variable '{}' has shape {}; expected "
                "(n_chains, n_draws, ...) — vmapped chain histories as "
                "returned by run_chains".format(name, arr.shape)
            )
    n_cd = {arr.shape[:2] for arr in out.values()}
    if len(n_cd) != 1:
        raise ValueError(
            "to_inference_dict: variables disagree on (n_chains, n_draws): "
            + ", ".join(
                "{}={}".format(n, a.shape[:2]) for n, a in sorted(out.items())
            )
        )
    return out


def to_inference_dict(chains, costs=None, attrs=None):
    """Posterior (+ optional sample stats) in ``arviz.from_dict`` layout.

    Parameters
    ----------
    chains : MultiTrace, PYSGMCMCTrace, or pytree
        Posterior draws.  Raw pytrees must carry ``(n_chains, n_draws,
        *shape)`` leaves (a single trace is lifted to one chain).
    costs : array, optional
        ``(n_chains, n_draws)`` per-draw costs (negative log likelihoods)
        as returned by ``sample_chain``/``run_chains``; exported negated
        as the conventional ``sample_stats.lp``.
    attrs : dict, optional
        Metadata attached under ``attrs`` (arviz stores it on the
        posterior group).

    Returns
    -------
    dict
        Keyword arguments for ``arviz.from_dict``: ``posterior`` plus
        optionally ``sample_stats`` / ``attrs``.
    """
    posterior = _posterior_vars(chains)
    out = {"posterior": posterior}
    if costs is not None:
        lp = -np.asarray(costs)
        shape = next(iter(posterior.values())).shape[:2]
        if lp.shape != shape:
            raise ValueError(
                "to_inference_dict: costs shape {} does not match the "
                "posterior's (n_chains, n_draws) {}".format(lp.shape, shape)
            )
        out["sample_stats"] = {"lp": lp}
    if attrs:
        out["attrs"] = dict(attrs)
    return out


def to_arviz(chains, costs=None, attrs=None):
    """Export draws as an ``arviz.InferenceData``.

    The modern counterpart of the reference's pymc3 ``MultiTrace`` interop
    (``sample_chains.py:338-384``): the returned object plugs directly
    into ``arviz.summary`` / ``arviz.plot_trace`` / ``arviz.ess`` and
    everything else in the ecosystem.

    Requires arviz (``pip install arviz``); raises a descriptive
    ``ImportError`` otherwise — the conversion logic itself is
    :func:`to_inference_dict` and needs only numpy.
    """
    try:
        import arviz
    except ImportError as err:
        raise ImportError(
            "to_arviz requires the optional dependency 'arviz' "
            "(pip install arviz); to consume the posterior without it, "
            "use to_inference_dict(...) which returns plain numpy arrays "
            "in the same (chain, draw, *shape) layout"
        ) from err
    return arviz.from_dict(**to_inference_dict(chains, costs, attrs))

"""High-throughput SGHMC over stacked flat chains with the Pallas kernel.

The flagship hot path for the north-star workload (8192 chains x 3-layer
BNN): sampler state lives as six ``(n_chains, dim_padded)`` float32 arrays
in HBM, gradients come from one vmapped XLA autodiff pass, and the entire
update (burn-in EMAs, noise, momentum, position) is a single fused Pallas
kernel (:mod:`pysgmcmc_tpu.ops.fused_update`) — one read and one write of
each state array per step, with in-kernel RNG so the noise tensor never
touches HBM.

Equivalent math to :class:`pysgmcmc_tpu.samplers.sghmc.SGHMCSampler`
(reference semantics ``/root/reference/pysgmcmc/samplers/sghmc.py:109-253``);
the pytree sampler remains the reference implementation and the parity
tests pin this path against it.

Examples
--------
>>> import jax.numpy as jnp
>>> fused = FusedSGHMC(lambda p: jnp.sum(p["x"] ** 2),
...                    {"x": jnp.zeros(2)}, interpret=True)
>>> state = fused.init({"x": jnp.zeros((4, 2))})
>>> state.theta.shape  # 4 chains, dim padded to the 128-lane tile
(4, 128)
>>> back = fused.unflatten_positions(state.theta)
>>> back["x"].shape
(4, 2)
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from pysgmcmc_tpu.ops.fused_update import fused_sghmc_update, pad_dim


class FusedSGHMCState(NamedTuple):
    theta: Any  # (n_chains, dim_padded)
    momentum: Any
    tau: Any
    g: Any
    v_hat: Any
    minv: Any
    step: Any  # scalar int32


class FusedSGHMC:
    """Stacked-chain SGHMC driven by the fused Pallas update kernel.

    Parameters mirror :class:`~pysgmcmc_tpu.samplers.sghmc.SGHMCSampler`;
    ``template_params`` fixes the parameter pytree structure that
    ``cost_fn`` expects for a single chain.
    """

    def __init__(
        self,
        cost_fn,
        template_params,
        stepsize=0.01,
        burn_in_steps=3000,
        mdecay=0.05,
        scale_grad=1.0,
        seed=0,
        interpret=False,
        backend="pallas",
        compute_dtype=None,
    ):
        flat, unravel = ravel_pytree(template_params)
        self.dim = int(flat.size)
        self.dim_padded = pad_dim(self.dim)
        self.unravel = unravel
        self.cost_fn = cost_fn
        self.stepsize = float(stepsize)
        self.burn_in_steps = int(burn_in_steps)
        self.mdecay = float(mdecay)
        self.scale_grad = float(scale_grad)
        self.seed = int(seed)
        self.interpret = bool(interpret)
        if backend not in ("pallas", "xla"):
            raise ValueError("FusedSGHMC: backend must be 'pallas' or 'xla'")
        # 'pallas': one-kernel update with in-kernel RNG.  'xla': the same
        # flat update math as plain jnp ops (XLA's fusion of the flat layout
        # measured slightly faster than the hand kernel on v5e; both beat
        # the per-leaf pytree path, whose leaf fragmentation costs ~20%).
        self.backend = backend
        # Run the cost function's network in this dtype (bf16 = MXU native),
        # gradients land back in f32 via the cast's transpose.
        self.compute_dtype = compute_dtype

    #  State ------------------------------------------------------------------

    def flatten_positions(self, stacked_params):
        """(n_chains, ...) pytree -> (n_chains, dim_padded) float32."""
        theta = jax.vmap(lambda p: ravel_pytree(p)[0])(stacked_params)
        theta = jnp.asarray(theta, jnp.float32)
        return jnp.pad(theta, ((0, 0), (0, self.dim_padded - self.dim)))

    def unflatten_positions(self, theta):
        """(n_chains, dim_padded) -> (n_chains, ...) pytree."""
        return jax.vmap(lambda row: self.unravel(row[: self.dim]))(theta)

    def init(self, stacked_params):
        theta = self.flatten_positions(stacked_params)
        ones = jnp.ones_like(theta)
        return FusedSGHMCState(
            theta=theta,
            momentum=jnp.zeros_like(theta),
            tau=ones,
            g=ones,
            v_hat=ones,
            minv=ones,
            step=jnp.zeros((), jnp.int32),
        )

    #  Stepping ----------------------------------------------------------------

    def _grads(self, theta, batch):
        def maybe_cast(params):
            if self.compute_dtype is None:
                return params
            return jax.tree_util.tree_map(
                lambda leaf: leaf.astype(self.compute_dtype), params
            )

        def flat_cost(row, batch):
            return self.cost_fn(maybe_cast(self.unravel(row[: self.dim])), batch)

        if batch is None:
            costs, grads = jax.vmap(
                jax.value_and_grad(lambda row: self.cost_fn(
                    maybe_cast(self.unravel(row[: self.dim]))
                ))
            )(theta)
        else:
            costs, grads = jax.vmap(
                jax.value_and_grad(flat_cost), in_axes=(0, 0)
            )(theta, batch)
        return costs, grads

    def step(self, state, batch=None, key=None):
        """Advance all chains one step.  ``batch`` has a leading chain axis.

        ``key`` is required for the 'xla' backend (host-of-scan threefry
        noise); the 'pallas' backend derives its noise from the in-kernel
        PRNG seeded by the step counter.
        """
        costs, grads = self._grads(state.theta, batch)
        burning_in = state.step < self.burn_in_steps

        if self.backend == "xla":
            if key is None:
                raise ValueError("FusedSGHMC.step: backend='xla' needs a key")
            from pysgmcmc_tpu.ops.fused_update import _update_math

            eta = jax.random.normal(key, state.theta.shape, state.theta.dtype)
            eps = jnp.asarray(self.stepsize, jnp.float32)
            eps_scaled = eps / jnp.sqrt(jnp.asarray(self.scale_grad, jnp.float32))
            theta, v, tau, g, v_hat, minv = _update_math(
                state.theta, state.momentum, state.tau, state.g,
                state.v_hat, state.minv, grads, eta,
                eps, eps_scaled, jnp.asarray(self.mdecay, jnp.float32),
                burning_in,
            )
        else:
            # Per-step seed: a distinct odd-stride sequence per step keeps
            # block seeds disjoint across steps.
            seed = jnp.asarray(self.seed, jnp.int32) + state.step * jnp.int32(
                2654435761 & 0x7FFFFFFF
            )
            theta, v, tau, g, v_hat, minv = fused_sghmc_update(
                state.theta,
                state.momentum,
                state.tau,
                state.g,
                state.v_hat,
                state.minv,
                grads,
                self.stepsize,
                burning_in,
                seed,
                mdecay=self.mdecay,
                scale_grad=self.scale_grad,
                interpret=self.interpret,
            )
        return (
            FusedSGHMCState(theta, v, tau, g, v_hat, minv, state.step + 1),
            costs,
        )

    def run(self, state, key, n_steps, batch_fn=None, per_chain_batches=True):
        """Scan ``n_steps`` fused steps; returns ``(state, final_costs)``.

        ``batch_fn`` is the pure ``(key) -> batch`` selector from
        :mod:`pysgmcmc_tpu.data_batches`; with ``per_chain_batches`` each
        chain draws its own minibatch (matching the semantics of independent
        per-chain training runs).
        """
        n_chains = state.theta.shape[0]

        def one_step(carry, _):
            state, key = carry
            key, key_batch, key_noise = jax.random.split(key, 3)
            if batch_fn is None:
                batch = None
            elif per_chain_batches:
                batch = jax.vmap(batch_fn)(jax.random.split(key_batch, n_chains))
            else:
                single = batch_fn(key_batch)
                batch = jax.tree_util.tree_map(
                    lambda leaf: jnp.broadcast_to(
                        leaf[None], (n_chains,) + leaf.shape
                    ),
                    single,
                )
            state, costs = self.step(state, batch, key=key_noise)
            return (state, key), costs

        (state, _), costs = jax.lax.scan(
            one_step, (state, key), None, length=n_steps
        )
        return state, costs[-1]

"""Stochastic Gradient Nosé-Hoover Thermostat (SGNHT).

Ding, Fang, Babbush, Chen, Skeel & Neven, "Bayesian Sampling Using
Stochastic Gradient Thermostats", NeurIPS 2014 (Algorithm 2).

A capability *addition* relative to the reference (which ships SGHMC with a
fixed momentum-decay ``mdecay`` — ``/root/reference/pysgmcmc/samplers/
sghmc.py:31-34``): SGNHT replaces the hand-tuned friction constant with a
*thermostat* variable ``xi`` that adapts itself so the kinetic temperature
``p^T p / d`` stays at 1, automatically absorbing the unknown stochastic-
gradient noise.  Per step, with stepsize ``eps`` and diffusion ``A``:

    p'   = p - xi * eps * p - eps * grad
           + sqrt(2 * A * eps / scale_grad) * eta,   eta ~ N(0, I)
    theta' = theta + eps * p'
    xi'  = xi + eps * (p'^T p' / d - 1)

``scale_grad`` follows the same minibatch noise-scaling convention as the
rest of the family (:mod:`pysgmcmc_tpu.samplers.sgld` uses
``2 eps minv A / scale_grad``), so SGNHT is drop-in interchangeable with
SGHMC/SGLD on minibatch problems.  ``xi`` is one scalar per chain (the
paper's global thermostat), initialized at ``A``; the momentum is
initialized from N(0, I) when ``init`` receives a key (the paper's
choice), and zeros otherwise.

Examples
--------
>>> import jax, jax.numpy as jnp
>>> sampler = SGNHTSampler(lambda x: 0.5 * jnp.sum(x**2),
...                        stepsize_schedule=0.1)
>>> state = sampler.init(jnp.zeros(3), jax.random.PRNGKey(0))
>>> float(state.xi)  # thermostat starts at the diffusion constant A
1.0
>>> state, info = sampler.step(state, jax.random.PRNGKey(1))
>>> int(state.step)
1
>>> state.momentum.shape
(3,)
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pysgmcmc_tpu.samplers.base import MCMCSampler, SamplerInfo
from pysgmcmc_tpu.utils.pytree import normal_like_tree, tree_cast, tree_zeros_like


class SGNHTState(NamedTuple):
    position: Any
    momentum: Any
    xi: Any  # per-chain scalar thermostat
    step: Any
    schedule_state: Any


def _tree_dim(tree):
    return sum(leaf.size for leaf in jax.tree_util.tree_leaves(tree))


class SGNHTSampler(MCMCSampler):
    """SGHMC with a self-adapting Nosé-Hoover friction thermostat.

    Parameters
    ----------
    a_diff : float
        Diffusion constant ``A`` (the paper's injected-noise strength and
        the thermostat's initial value), default 1.0.
    scale_grad : float
        Gradient/noise scale (usually the dataset size), default 1.0.
    """

    def __init__(
        self,
        cost_fn,
        stepsize_schedule=0.01,
        a_diff=1.0,
        scale_grad=1.0,
        dtype=jnp.float32,
        gaussian_prior_scale=0.0,
        noise_bits=None,
    ):
        super().__init__(cost_fn, stepsize_schedule, dtype)
        if a_diff <= 0.0:
            raise ValueError("SGNHTSampler: a_diff must be > 0")
        self.a_diff = float(a_diff)
        self.scale_grad = float(scale_grad)
        self.noise_bits = noise_bits
        # analytic isotropic-Gaussian-prior fold, as in SGHMC/SGLD:
        # grad += scale * theta instead of differentiating the prior term
        self.gaussian_prior_scale = float(gaussian_prior_scale)

    def init(self, params, key=None):
        params = tree_cast(params, self.dtype)
        momentum = (
            normal_like_tree(key, params)
            if key is not None
            else tree_zeros_like(params)
        )
        return SGNHTState(
            position=params,
            momentum=momentum,
            xi=jnp.asarray(self.a_diff, self.dtype),
            step=jnp.zeros((), jnp.int32),
            schedule_state=self.stepsize_schedule.init(),
        )

    def step(self, state, key, batch=None, noise=None, phase=None):
        """One SGNHT step.  ``phase`` is accepted for driver uniformity and
        ignored: the thermostat adapts continuously, so there is no burn-in
        boundary to specialize on.  ``noise`` optionally injects the
        standard-normal draw (kernel-parity tests)."""
        del phase
        eps = self._stepsize(state)
        cost, grads = self._cost_and_grad(state.position, batch)
        if self.gaussian_prior_scale:
            scale = jnp.asarray(self.gaussian_prior_scale, self.dtype)
            grads = jax.tree_util.tree_map(
                lambda g, theta: g + scale * theta, grads, state.position
            )
        if noise is None:
            noise = normal_like_tree(
                key, state.position, bits_impl=self.noise_bits
            )

        sigma = jnp.sqrt(
            2.0 * self.a_diff * eps
            / jnp.asarray(self.scale_grad, self.dtype)
        )

        def momentum_leaf(p, grad, eta):
            return p - state.xi * eps * p - eps * grad + sigma * eta

        momentum = jax.tree_util.tree_map(
            momentum_leaf, state.momentum, grads, noise
        )
        position = jax.tree_util.tree_map(
            lambda theta, p: theta + eps * p, state.position, momentum
        )
        sumsq = sum(
            jnp.sum(jnp.square(p))
            for p in jax.tree_util.tree_leaves(momentum)
        )
        d = _tree_dim(state.position)
        xi = state.xi + eps * (sumsq / d - 1.0)

        new_state = SGNHTState(
            position=position,
            momentum=momentum,
            xi=xi,
            step=state.step + 1,
            schedule_state=self.stepsize_schedule.update(
                state.schedule_state, cost=cost
            ),
        )
        return new_state, SamplerInfo(cost=cost, stepsize=eps)

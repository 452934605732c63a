"""Preconditioned SGLD (pSGLD) — RMSprop-adaptive Langevin dynamics.

Li, Chen, Carlson & Carin, "Preconditioned Stochastic Gradient Langevin
Dynamics for Deep Neural Networks", AAAI 2016.

A capability *addition* relative to the reference (which ships only the
Springenberg burn-in adaptation): instead of freezing a mass matrix after a
burn-in phase, pSGLD continuously adapts a diagonal RMSprop preconditioner

    v_t   = alpha * v_{t-1} + (1 - alpha) * grad^2
    G_t   = 1 / (lambda + sqrt(v_t))
    theta = theta - (eps/2) * G_t * grad
            + N(0, eps * G_t / scale_grad)

Noise scaling follows the same ``scale_grad`` convention as
:class:`~pysgmcmc_tpu.samplers.sgld.SGLDSampler` so the two are drop-in
interchangeable on minibatch problems.

Examples
--------
>>> import jax, jax.numpy as jnp
>>> sampler = PSGLDSampler(lambda x: 0.5 * jnp.sum(x**2),
...                        stepsize_schedule=0.01)
>>> state = sampler.init(jnp.zeros(2))
>>> state, info = sampler.step(state, jax.random.PRNGKey(0))
>>> int(state.step)
1
>>> bool((state.v >= 0).all())  # RMSprop accumulator
True
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pysgmcmc_tpu.samplers.base import MCMCSampler, SamplerInfo
from pysgmcmc_tpu.utils.numeric import safe_sqrt
from pysgmcmc_tpu.utils.pytree import normal_like_tree, tree_cast, tree_zeros_like


class PSGLDState(NamedTuple):
    position: Any
    v: Any  # RMSprop second-moment accumulator
    step: Any
    schedule_state: Any


class PSGLDSampler(MCMCSampler):
    """RMSprop-preconditioned SGLD.

    Parameters
    ----------
    alpha : float
        Second-moment decay, default 0.99.
    lambda_reg : float
        Preconditioner regularizer, default 1e-5.
    scale_grad : float
        Gradient/noise scale (usually the dataset size), default 1.0.
    """

    def __init__(
        self,
        cost_fn,
        stepsize_schedule=0.001,
        alpha=0.99,
        lambda_reg=1e-5,
        scale_grad=1.0,
        dtype=jnp.float32,
        gaussian_prior_scale=0.0,
    ):
        super().__init__(cost_fn, stepsize_schedule, dtype)
        if not 0.0 <= alpha < 1.0:
            raise ValueError("PSGLDSampler: alpha must be in [0, 1)")
        self.alpha = float(alpha)
        self.lambda_reg = float(lambda_reg)
        self.scale_grad = float(scale_grad)
        # analytic isotropic-Gaussian-prior fold, as in SGHMC/SGLD:
        # grad += scale * theta instead of differentiating the prior term
        self.gaussian_prior_scale = float(gaussian_prior_scale)

    def init(self, params, key=None):
        params = tree_cast(params, self.dtype)
        return PSGLDState(
            position=params,
            v=tree_zeros_like(params),
            step=jnp.zeros((), jnp.int32),
            schedule_state=self.stepsize_schedule.init(),
        )

    def step(self, state, key, batch=None, noise=None, phase=None):
        """One pSGLD step.  ``phase`` is accepted for driver uniformity and
        ignored: the RMSprop preconditioner adapts continuously, so there is
        no burn-in boundary to specialize on."""
        del phase
        eps = self._stepsize(state)
        cost, grads = self._cost_and_grad(state.position, batch)
        if self.gaussian_prior_scale:
            scale = jnp.asarray(self.gaussian_prior_scale, self.dtype)
            grads = jax.tree_util.tree_map(
                lambda g, theta: g + scale * theta, grads, state.position
            )
        if noise is None:
            noise = normal_like_tree(key, state.position)

        def v_new_leaf(v, grad):
            return self.alpha * v + (1.0 - self.alpha) * grad * grad

        v_new = jax.tree_util.tree_map(v_new_leaf, state.v, grads)

        def update_leaf(theta, v, grad, eta):
            precond = 1.0 / (self.lambda_reg + safe_sqrt(v))
            sigma = safe_sqrt(eps * precond / self.scale_grad)
            return theta - 0.5 * eps * precond * grad + sigma * eta

        position = jax.tree_util.tree_map(
            update_leaf, state.position, v_new, grads, noise
        )
        new_state = PSGLDState(
            position=position,
            v=v_new,
            step=state.step + 1,
            schedule_state=self.stepsize_schedule.update(
                state.schedule_state, cost=cost
            ),
        )
        return new_state, SamplerInfo(cost=cost, stepsize=eps)

"""Stein Variational Gradient Descent over a particle ensemble.

TPU-native redesign of the reference SVGD sampler
(``/root/reference/pysgmcmc/samplers/svgd.py:13-195``), after Liu & Wang,
NIPS 2016.  The ensemble is a stacked ``(n_particles, ...)`` pytree; the
per-particle cost is evaluated with ``vmap`` (replacing ``tf.map_fn``,
``svgd.py:87-88``), and the RBF kernel with median-heuristic bandwidth runs
on the MXU (:mod:`pysgmcmc_tpu.ops.pairwise`) instead of the reference's
O(n^2) Python-loop ``pdist`` (``tensor_utils.py:405-409``).

Update (Adagrad-scaled, cf. ``svgd.py:121-144``):

    phi_i  = (1/n) * (sum_j K_ji * grad_logp(x_j) + sum_j grad_{x_j} K_ji)
    hist   = alpha * hist + (1 - alpha) * phi^2
    x_i   += eps * phi_i / (fudge + sqrt(hist))

Note on sign: ``cost_fn`` is a *negative* log likelihood, so
``grad_logp = -grad cost``.  The reference applies the kernel-gradient
(repulsion) term with the opposite sign to Liu & Wang's published algorithm
(``svgd.py:125-128,140-144`` descends ``(K grad_cost + grad_K)/n``, i.e. its
repulsion is attractive).  This implementation follows the paper — particles
repel — which is the behavior SVGD's convergence guarantees require.

The reference's known interface wart — particles had to be a flat list of
scalars, making SVGD unusable with the BNN (``svgd.py:7-10`` XXX) — is fixed:
particles are any pytree with a leading particle axis; kernel geometry is
computed on per-particle raveled vectors.

Examples
--------
>>> import jax, jax.numpy as jnp
>>> sampler = SVGDSampler(lambda x: 0.5 * jnp.sum(x**2))
>>> particles = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
>>> state = sampler.init(particles)
>>> state, info = sampler.step(state, jax.random.PRNGKey(1))
>>> state.position.shape
(8, 2)
>>> info.cost.shape  # one cost per particle
(8,)
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pysgmcmc_tpu.ops.pairwise import svgd_kernel
from pysgmcmc_tpu.samplers.base import MCMCSampler, SamplerInfo
from pysgmcmc_tpu.utils.pytree import tree_cast


class SVGDState(NamedTuple):
    position: Any  # pytree with leading particle axis
    historical_grad: Any  # same structure, Adagrad accumulator
    step: Any
    schedule_state: Any


def _ravel_particles(particles):
    """(n, ...) pytree -> (n, total_dim) matrix + unravel function."""
    leaves = jax.tree_util.tree_leaves(particles)
    n = leaves[0].shape[0]
    flat = jnp.concatenate(
        [leaf.reshape(n, -1) for leaf in leaves], axis=1
    )

    treedef = jax.tree_util.tree_structure(particles)
    shapes = [leaf.shape for leaf in leaves]

    def unravel(matrix):
        out, offset = [], 0
        for shape in shapes:
            size = 1
            for dim in shape[1:]:
                size *= dim
            out.append(matrix[:, offset:offset + size].reshape(shape))
            offset += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unravel


class SVGDSampler(MCMCSampler):
    """SVGD with RBF kernel, median bandwidth, and Adagrad stepsizes.

    Parameters (defaults match the reference, ``svgd.py:23-26``):

    - ``stepsize_schedule``: default constant 0.1
    - ``alpha``: Adagrad decay, default 0.9
    - ``fudge_factor``: Adagrad epsilon, default 1e-6

    ``cost_fn`` takes a *single* particle (optionally with a batch) and is
    vmapped over the ensemble.
    """

    def __init__(
        self,
        cost_fn,
        stepsize_schedule=0.1,
        alpha=0.9,
        fudge_factor=1e-6,
        dtype=jnp.float32,
        kernel_impl="dense",
        bandwidth_subsample=4096,
        streaming_tile=512,
        streaming_interpret=False,
    ):
        if not isinstance(alpha, (int, float)):
            raise ValueError("SVGDSampler: alpha must be a number")
        if not isinstance(fudge_factor, (int, float)):
            raise ValueError("SVGDSampler: fudge_factor must be a number")
        if kernel_impl not in ("dense", "streaming"):
            raise ValueError(
                "SVGDSampler: kernel_impl must be 'dense' or 'streaming'"
            )
        super().__init__(cost_fn, stepsize_schedule, dtype)
        self.alpha = float(alpha)
        self.fudge_factor = float(fudge_factor)
        # 'dense' materializes the kernel matrix (one MXU Gram matmul) —
        # right up to ~32k particles.  'streaming' uses the flash-style
        # Pallas kernel (ops/svgd_streaming.py): O(n d) memory, validated
        # to 131k particles; the median bandwidth is then estimated from a
        # *uniformly random* subsample of `bandwidth_subsample` particles
        # drawn fresh each step from the step key (exact when
        # n <= bandwidth_subsample), so an ordered ensemble carries no bias.
        self.kernel_impl = kernel_impl
        self.bandwidth_subsample = int(bandwidth_subsample)
        self.streaming_tile = int(streaming_tile)
        self.streaming_interpret = bool(streaming_interpret)

    def init(self, particles, key=None):
        if isinstance(particles, (list, tuple)):
            particles = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *particles
            )
        particles = tree_cast(particles, self.dtype)
        return SVGDState(
            position=particles,
            historical_grad=jax.tree_util.tree_map(jnp.zeros_like, particles),
            step=jnp.zeros((), jnp.int32),
            schedule_state=self.stepsize_schedule.init(),
        )

    def step(self, state, key, batch=None, phase=None):
        """One SVGD transport step.  ``phase`` is accepted for driver
        uniformity and ignored (no burn-in adaptation to specialize)."""
        del phase
        eps = self._stepsize(state)

        if batch is None:
            per_particle = jax.vmap(jax.value_and_grad(self.cost_fn))
            costs, grads = per_particle(state.position)
        else:
            per_particle = jax.vmap(
                jax.value_and_grad(self.cost_fn), in_axes=(0, None)
            )
            costs, grads = per_particle(state.position, batch)

        flat_particles, unravel = _ravel_particles(state.position)
        flat_grads, _ = _ravel_particles(grads)
        n = flat_particles.shape[0]

        if self.kernel_impl == "streaming":
            from pysgmcmc_tpu.ops.pairwise import (
                median_bandwidth,
                squared_distance_matrix,
            )
            from pysgmcmc_tpu.ops.svgd_streaming import svgd_phi_streaming

            if n <= self.bandwidth_subsample:
                sub = flat_particles
            else:
                idx = jax.random.randint(
                    jax.random.fold_in(key, 1),
                    (self.bandwidth_subsample,), 0, n,
                )
                sub = flat_particles[idx]
            h = median_bandwidth(squared_distance_matrix(sub), n)
            phi = svgd_phi_streaming(
                flat_particles, flat_grads, h,
                tile=min(self.streaming_tile, n),
                interpret=self.streaming_interpret,
            )
        else:
            kernel, grad_kernel = svgd_kernel(flat_particles)
            # grad_logp = -grad_cost; repulsion per Liu & Wang (2016).
            phi = (
                jnp.dot(
                    kernel, -flat_grads,
                    preferred_element_type=flat_grads.dtype,
                )
                + grad_kernel
            ) / n

        flat_hist, _ = _ravel_particles(state.historical_grad)
        hist_new = self.alpha * flat_hist + (1.0 - self.alpha) * phi**2
        adjusted = phi / (self.fudge_factor + jnp.sqrt(hist_new))
        new_flat = flat_particles + eps * adjusted

        new_state = SVGDState(
            position=unravel(new_flat),
            historical_grad=unravel(hist_new),
            step=state.step + 1,
            schedule_state=self.stepsize_schedule.update(
                state.schedule_state, cost=costs
            ),
        )
        return new_state, SamplerInfo(cost=costs, stepsize=eps)

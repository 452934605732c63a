"""Bayesian linear regression — the conjugate model family.

A second model family beyond the reference's single BNN: Gaussian linear
regression with a Gaussian weight prior,

    y | w ~ N(X w, 1/beta)      w ~ N(0, I/alpha)

whose posterior is available in closed form:

    Sigma = (alpha I + beta X^T X)^{-1}      mu = beta Sigma X^T y

Because the exact posterior is known, this model doubles as an end-to-end
*statistical correctness instrument* for every sampler in the framework:
``tests/models/test_bayesian_linear_regression.py`` checks that sampled
posteriors match the analytic mean and covariance — validation the
reference (whose only model is the non-conjugate BNN) cannot perform.

Training follows the same design as the BNN: minibatch NLL + prior as the
cost, the whole run as one compiled scan, predictions via the vmapped
sample ensemble.

Examples
--------
Closed-form posterior used as ground truth by the tests:

>>> import numpy as np
>>> X = np.array([[1.0], [2.0], [3.0]])
>>> y = 2.0 * X[:, 0]
>>> mean, cov = exact_posterior(X, y, alpha=1.0, beta=100.0)
>>> round(float(mean[0]), 2)  # shrunk slightly toward the prior
2.0
>>> cov.shape
(1, 1)
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn
from pysgmcmc_tpu.models.base_model import BaseModel
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.sampling import Sampler
from pysgmcmc_tpu.stepsize_schedules import (
    ConstantStepsizeSchedule,
    StepsizeSchedule,
)


def exact_posterior(X, y, alpha=1.0, beta=25.0):
    """Closed-form posterior ``(mean, covariance)`` of the weights."""
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64).reshape(-1)
    d = X.shape[1]
    precision = alpha * np.eye(d) + beta * X.T @ X
    covariance = np.linalg.inv(precision)
    mean = beta * covariance @ X.T @ y
    return mean, covariance


class BayesianLinearRegression(BaseModel):
    """Linear regression trained by SG-MCMC posterior sampling.

    Parameters
    ----------
    alpha : float
        Weight prior precision, default 1.0.
    beta : float
        Observation noise precision, default 25.0.
    Other parameters mirror :class:`BayesianNeuralNetwork` (sampler choice,
    batch size, thinning, burn-in, seed).
    """

    def __init__(
        self,
        alpha=1.0,
        beta=25.0,
        sampling_method=Sampler.SGHMC,
        batch_size=20,
        stepsize_schedule=None,
        n_nets=100,
        burn_in_steps=1000,
        sample_steps=10,
        seed=0,
        dtype=jnp.float32,
        **sampler_kwargs,
    ):
        super().__init__()
        if not Sampler.is_supported(sampling_method):
            raise ValueError(
                "BayesianLinearRegression: unsupported sampling_method "
                "{!r}".format(sampling_method)
            )
        if stepsize_schedule is None:
            stepsize_schedule = ConstantStepsizeSchedule(1e-2)
        if not isinstance(stepsize_schedule, StepsizeSchedule):
            stepsize_schedule = ConstantStepsizeSchedule(float(stepsize_schedule))
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.sampling_method = sampling_method
        self.batch_size = int(batch_size)
        self.stepsize_schedule = stepsize_schedule
        self.n_nets = int(n_nets)
        self.burn_in_steps = int(burn_in_steps)
        self.sample_steps = int(sample_steps)
        self.seed = int(seed)
        self.dtype = dtype
        self.sampler_kwargs = sampler_kwargs
        self.samples = None
        self.is_trained = False

    def _cost_fn(self, n_datapoints):
        """Minibatch-unbiased negative log posterior (up to a constant).

        Scaled by 1/batch like the BNN so ``scale_grad = N`` applies:
        cost = (beta/2) * mean_batch (y - Xw)^2 + (alpha/(2N)) ||w||^2.
        """

        def cost(w, batch):
            xb, yb = batch
            residual = yb[:, 0] - xb @ w
            data_term = 0.5 * self.beta * jnp.mean(residual**2)
            prior_term = 0.5 * self.alpha * jnp.sum(w**2) / n_datapoints
            return data_term + prior_term

        return cost

    @BaseModel._check_shapes_train
    def train(self, X, y, *args, **kwargs):
        self.X, self.y = X, y
        x_dev = jnp.asarray(X, self.dtype)
        y_dev = jnp.asarray(y, self.dtype)
        n_datapoints, n_dims = X.shape

        cost_fn = self._cost_fn(n_datapoints)
        kwargs_s = dict(self.sampler_kwargs)
        kwargs_s.update(
            cost_fn=cost_fn,
            stepsize_schedule=self.stepsize_schedule,
            dtype=self.dtype,
        )
        if Sampler.is_burn_in_mcmc(self.sampling_method):
            kwargs_s.setdefault("scale_grad", float(n_datapoints))
            kwargs_s.setdefault("burn_in_steps", self.burn_in_steps)
        elif self.sampling_method == Sampler.PSGLD:
            kwargs_s.setdefault("scale_grad", float(n_datapoints))
        sampler = Sampler.get_sampler(self.sampling_method, **kwargs_s)

        select_batch = make_batch_fn(x_dev, y_dev, self.batch_size)
        key = jax.random.PRNGKey(self.seed)
        key_init, key_burn, key_sample = jax.random.split(key, 3)

        @jax.jit
        def run(w0):
            state = sampler.init(w0, key_init)
            if self.burn_in_steps > 0:
                state, _ = sample_chain(
                    sampler, state, key_burn, 1,
                    batch_fn=select_batch, keep_every=self.burn_in_steps,
                    collect_costs=False,
                )
            _, samples, costs = sample_chain(
                sampler, state, key_sample, self.n_nets,
                batch_fn=select_batch, keep_every=self.sample_steps,
            )
            return samples, costs

        self.samples, _ = run(jnp.zeros(n_dims, self.dtype))
        self.is_trained = True

    @BaseModel._check_shapes_predict
    def predict(self, X_test, *args, **kwargs):
        if not self.is_trained:
            raise ValueError(
                "Calling predict() before train() is not supported"
            )
        x_dev = jnp.asarray(X_test, self.dtype)
        preds = x_dev @ jnp.asarray(self.samples).T  # (N, n_nets)
        mean = np.asarray(jnp.mean(preds, axis=1))
        variance = np.asarray(jnp.var(preds, axis=1)) + 1.0 / self.beta
        return mean, variance

    def exact_posterior(self):
        """Analytic ``(mean, covariance)`` for the trained data."""
        return exact_posterior(self.X, self.y, self.alpha, self.beta)

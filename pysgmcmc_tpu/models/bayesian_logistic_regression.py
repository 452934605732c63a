"""Bayesian logistic regression — the classification model family.

Extends the framework beyond the reference's regression-only scope: binary
classification with a Gaussian weight prior,

    p(y=1 | x, w) = sigmoid(x^T w)        w ~ N(0, I/alpha)

trained by SG-MCMC over the minibatch-unbiased negative log posterior and
predicting with the full posterior ensemble (mean probability + epistemic
uncertainty), the same design as the other models: one compiled scan for
training, one vmap for prediction.

Examples
--------
>>> model = BayesianLogisticRegression(n_nets=2, n_iters=200,
...                                    burn_in_steps=10)
>>> model.is_trained
False
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


class BayesianLogisticRegression(BaseModel):
    """Binary classifier trained by SG-MCMC posterior sampling.

    Parameters
    ----------
    alpha : float
        Weight prior precision, default 1.0.
    fit_intercept : bool
        Append a bias feature, default True.
    Other parameters mirror :class:`BayesianNeuralNetwork`.
    """

    def __init__(
        self,
        alpha=1.0,
        fit_intercept=True,
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
                "BayesianLogisticRegression: unsupported sampling_method "
                "{!r}".format(sampling_method)
            )
        if stepsize_schedule is None:
            stepsize_schedule = ConstantStepsizeSchedule(1e-2)
        if not isinstance(stepsize_schedule, StepsizeSchedule):
            stepsize_schedule = ConstantStepsizeSchedule(float(stepsize_schedule))
        self.alpha = float(alpha)
        self.fit_intercept = bool(fit_intercept)
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

    def _design(self, X):
        X = np.asarray(X, np.float64)
        if self.fit_intercept:
            X = np.concatenate([X, np.ones((X.shape[0], 1))], axis=1)
        return X

    @BaseModel._check_shapes_train
    def train(self, X, y, *args, **kwargs):
        """``y`` must be binary in {0, 1}."""
        y_arr = np.asarray(y)
        if not np.isin(y_arr, (0, 1)).all():
            raise ValueError(
                "BayesianLogisticRegression.train: y must be binary {0, 1}"
            )
        self.X, self.y = X, y
        design = self._design(X)
        n_datapoints, n_dims = design.shape
        x_dev = jnp.asarray(design, self.dtype)
        y_dev = jnp.asarray(y_arr, self.dtype)

        def cost_fn(w, batch):
            xb, yb = batch
            logits = xb @ w
            # minibatch-unbiased: mean BCE + prior/(N)
            bce = jnp.mean(
                jnp.maximum(logits, 0.0)
                - logits * yb[:, 0]
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            prior = 0.5 * self.alpha * jnp.sum(w**2) / n_datapoints
            return bce + prior

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
        """Posterior mean probability of class 1 and its epistemic variance."""
        if not self.is_trained:
            raise ValueError(
                "Calling predict() before train() is not supported"
            )
        design = jnp.asarray(self._design(X_test), self.dtype)
        probs = jax.nn.sigmoid(design @ jnp.asarray(self.samples).T)
        mean = np.asarray(jnp.mean(probs, axis=1))
        variance = np.asarray(jnp.var(probs, axis=1))
        return mean, variance

    def predict_class(self, X_test, threshold=0.5):
        mean, _ = self.predict(X_test)
        return (mean >= threshold).astype(np.int32)

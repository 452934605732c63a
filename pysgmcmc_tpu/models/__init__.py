from pysgmcmc_tpu.models.architectures import default_network
from pysgmcmc_tpu.models.bayesian_linear_regression import (
    BayesianLinearRegression,
    exact_posterior,
)
from pysgmcmc_tpu.models.bayesian_logistic_regression import (
    BayesianLogisticRegression,
)
from pysgmcmc_tpu.models.base_model import (
    BaseModel,
    zero_mean_unit_var_normalization,
    zero_mean_unit_var_unnormalization,
    zero_one_normalization,
    zero_one_unnormalization,
)
from pysgmcmc_tpu.models.bayesian_neural_network import (
    BayesianNeuralNetwork,
    log_variance_prior_log_like,
    weight_prior_log_like,
)

__all__ = [
    "BaseModel",
    "BayesianNeuralNetwork",
    "BayesianLinearRegression",
    "BayesianLogisticRegression",
    "exact_posterior",
    "default_network",
    "log_variance_prior_log_like",
    "weight_prior_log_like",
    "zero_mean_unit_var_normalization",
    "zero_mean_unit_var_unnormalization",
    "zero_one_normalization",
    "zero_one_unnormalization",
]

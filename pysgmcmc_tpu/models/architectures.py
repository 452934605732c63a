"""Network architectures for Bayesian neural networks.

The default is the reference's 3x50-tanh heteroscedastic regression net
(``/root/reference/pysgmcmc/models/bayesian_neural_network.py:28-69``):
three 50-unit tanh layers, a linear mean head, and a *learned* log-variance
output bias initialized to ``log(1e-3)`` concatenated as the second output
column.  He-normal (fan-in, truncated normal) weight init, zero biases.

Networks are ``(init_fn, apply_fn)`` pairs over plain dict pytrees — no
framework dependency, so the same params flow through samplers, Pallas
kernels, and ``vmap`` ensembles untouched.  Matmuls use
``preferred_element_type`` so the MXU accumulates in float32 even under
bfloat16 params.

Examples
--------
>>> import jax, jax.numpy as jnp
>>> init, apply = default_network(n_inputs=1)
>>> params = init(jax.random.PRNGKey(0))
>>> out = apply(params, jnp.zeros((5, 1)))
>>> out.shape  # column 0: mean, column 1: log predictive variance
(5, 2)
"""

import jax
import jax.numpy as jnp
import numpy as np


def default_network(n_inputs, units=(50, 50, 50), dtype=jnp.float32):
    """The reference BNN architecture as an ``(init, apply)`` pair.

    ``apply(params, x)`` returns an ``(N, 2)`` array: column 0 the predicted
    mean, column 1 the (input-independent, learned) log predictive variance
    — mirroring ``get_default_net``'s concat output
    (``bayesian_neural_network.py:58-69``).
    """
    he_normal = jax.nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal"
    )
    layer_sizes = [n_inputs, *units, 1]

    def init(key):
        params = {}
        keys = jax.random.split(key, len(layer_sizes) - 1)
        for i, (fan_in, fan_out) in enumerate(
            zip(layer_sizes[:-1], layer_sizes[1:])
        ):
            params["w{}".format(i + 1)] = he_normal(
                keys[i], (fan_in, fan_out), dtype
            )
            params["b{}".format(i + 1)] = jnp.zeros((fan_out,), dtype)
        params["log_variance_bias"] = jnp.full(
            (1, 1), np.log(1e-3), dtype=dtype
        )
        return params

    n_layers = len(layer_sizes) - 1

    def apply(params, x):
        h = jnp.asarray(x, dtype)
        for i in range(1, n_layers):
            h = jnp.tanh(
                jnp.dot(h, params["w{}".format(i)], preferred_element_type=dtype)
                + params["b{}".format(i)]
            )
        mean = (
            jnp.dot(h, params["w{}".format(n_layers)], preferred_element_type=dtype)
            + params["b{}".format(n_layers)]
        )
        log_var = jnp.broadcast_to(
            params["log_variance_bias"][0, 0], mean.shape
        )
        return jnp.concatenate([mean, log_var], axis=1)

    return init, apply

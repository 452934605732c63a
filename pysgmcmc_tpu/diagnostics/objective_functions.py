"""Benchmark target densities and synthetic objective functions.

Capability-parity counterpart of
``/root/reference/pysgmcmc/diagnostics/objective_functions.py``.  Every
function is written in ``jax.numpy`` so a single definition serves both
host-side numpy evaluation and traced use as a sampler cost function (the
reference needs dual numpy/TF code paths for this, e.g. the Gaussian mixture
at ``objective_functions.py:62-85``).
"""

import functools

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp


def to_negative_log_likelihood(log_likelihood_function):
    """Negate a log likelihood callable (cf. ``objective_functions.py:7-45``).

    Examples
    --------
    >>> import numpy as np
    >>> log_likelihood = lambda a, b: np.log(a + b)
    >>> negative_log_likelihood = to_negative_log_likelihood(log_likelihood)
    >>> input_a, input_b = 4, 5
    >>> ll = log_likelihood(input_a, input_b)
    >>> nll = negative_log_likelihood(input_a, input_b)
    >>> np.allclose(-ll, nll)
    True
    >>> log_likelihood.__name__ == negative_log_likelihood.__name__
    True
    """

    @functools.wraps(log_likelihood_function)
    def negative_log_likelihood(*args, **kwargs):
        return -log_likelihood_function(*args, **kwargs)

    return negative_log_likelihood


def banana_log_likelihood(x):
    """Banana-shaped 2D density from the Relativistic Monte Carlo paper.

    Examples
    --------
    >>> import numpy as np
    >>> optimum, f_opt = (0, 10), 0.0
    >>> np.allclose(banana_log_likelihood(optimum), f_opt)
    True
    """
    return -0.5 * (0.01 * x[0] ** 2 + (x[1] + 0.1 * x[0] ** 2 - 10) ** 2)


def gaussian_mixture_model_log_likelihood(
    x, mu=(-5, 0, 5), var=(1.0, 1.0, 1.0), weights=(1.0 / 3, 1.0 / 3, 1.0 / 3)
):
    """Log density of a 1D Gaussian mixture at ``x``.

    Accepts scalars, length-1 sequences, and traced values alike — a single
    jnp code path replaces the reference's numpy/TF split
    (``objective_functions.py:62-85``).
    """
    assert len(mu) == len(var) == len(weights)

    if isinstance(x, (list, tuple)):
        assert len(x) == 1
        x = x[0]
    x = jnp.asarray(x)
    if x.ndim > 0 and x.shape[-1] == 1:
        x = jnp.squeeze(x, axis=-1)

    mu = jnp.asarray(mu, dtype=x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else None)
    var = jnp.asarray(var, dtype=mu.dtype)
    weights = jnp.asarray(weights, dtype=mu.dtype)

    log_components = (
        jnp.log(weights)
        - 0.5 * jnp.log(2.0 * jnp.pi * var)
        - 0.5 * (x[..., None] - mu) ** 2 / var
    )
    return logsumexp(log_components, axis=-1)


def gmm1_log_likelihood(x):
    """Equal-variance 3-component mixture (cf. ``objective_functions.py:89-90``)."""
    return gaussian_mixture_model_log_likelihood(x)


def gmm2_log_likelihood(x):
    """Mixture with variances ``(2, 0.5, 2)`` (cf. ``objective_functions.py:93-94``)."""
    return gaussian_mixture_model_log_likelihood(x, var=(1.0 / 0.5, 0.5, 1.0 / 0.5))


def gmm3_log_likelihood(x):
    """Mixture with variances ``(1/0.3, 0.3, 1/0.3)`` (cf. ``objective_functions.py:97-98``)."""
    return gaussian_mixture_model_log_likelihood(x, var=(1.0 / 0.3, 0.3, 1.0 / 0.3))


def sinc(x):
    """``sinc(10x - 5)`` summed over features — the BNN regression target.

    (cf. ``objective_functions.py:101-102``)
    """
    x = jnp.asarray(x)
    return jnp.sum(jnp.sinc(x * 10 - 5), axis=1)


#  HPOlib synthetic suite (cf. ``objective_functions.py:107-315``) ----------


def bohachevski(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima, f_opt = [[0.0, 0.0]], 0.0
    >>> np.allclose([bohachevski(optimum) for optimum in optima], f_opt,
    ...             atol=1e-6)
    True
    """
    y = 0.7 + x[0] ** 2 + 2.0 * x[1] ** 2
    y = y - 0.3 * jnp.cos(3.0 * jnp.pi * x[0])
    y = y - 0.4 * jnp.cos(4.0 * jnp.pi * x[1])
    return y


def branin(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima = [[-np.pi, 12.275], [np.pi, 2.275], [9.42478, 2.475]]
    >>> f_opt = 0.39788735773
    >>> np.allclose([branin(optimum) for optimum in optima], f_opt)
    True
    """
    y = (x[1] - (5.1 / (4 * jnp.pi**2)) * x[0] ** 2 + 5 * x[0] / jnp.pi - 6) ** 2
    y = y + 10 * (1 - 1 / (8 * jnp.pi)) * jnp.cos(x[0]) + 10
    return y


def camelback(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima = [[0.0898, -0.7126], [-0.0898, 0.7126]]
    >>> f_opt = -1.03162842
    >>> np.allclose([camelback(optimum) for optimum in optima], f_opt, atol=1e-5)
    True
    """
    return (
        (4 - 2.1 * (x[0] ** 2) + ((x[0] ** 4) / 3)) * (x[0] ** 2)
        + x[0] * x[1]
        + (-4 + 4 * (x[1] ** 2)) * (x[1] ** 2)
    )


def goldstein_price(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima, f_opt = [[0.0, -1.0]], 3.0
    >>> np.allclose([goldstein_price(optimum) for optimum in optima], f_opt)
    True
    """
    a = 1 + (x[0] + x[1] + 1) ** 2 * (
        19 - 14 * x[0] + 3 * x[0] ** 2 - 14 * x[1] + 6 * x[0] * x[1] + 3 * x[1] ** 2
    )
    b = 30 + (2 * x[0] - 3 * x[1]) ** 2 * (
        18 - 32 * x[0] + 12 * x[0] ** 2 + 48 * x[1] - 36 * x[0] * x[1] + 27 * x[1] ** 2
    )
    return a * b


_HARTMANN3_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])
_HARTMANN3_A = np.array(
    [[3.0, 10.0, 30.0], [0.1, 10.0, 35.0], [3.0, 10.0, 30.0], [0.1, 10.0, 35.0]]
)
_HARTMANN3_P = 0.0001 * np.array(
    [[3689, 1170, 2673], [4699, 4387, 7470], [1090, 8732, 5547], [381, 5743, 8828]]
)


def hartmann3(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima = [[0.114614, 0.555649, 0.852547]]
    >>> f_opt = -3.8627795317627736
    >>> np.allclose([hartmann3(optimum) for optimum in optima], f_opt, atol=1e-5)
    True
    """
    x = jnp.asarray(x)
    inner = jnp.sum(_HARTMANN3_A * (x[None, :] - _HARTMANN3_P) ** 2, axis=1)
    return -jnp.sum(_HARTMANN3_ALPHA * jnp.exp(-inner))


_HARTMANN6_ALPHA = np.array([1.00, 1.20, 3.00, 3.20])
_HARTMANN6_A = np.array(
    [
        [10.00, 3.00, 17.00, 3.50, 1.70, 8.00],
        [0.05, 10.00, 17.00, 0.10, 8.00, 14.00],
        [3.00, 3.50, 1.70, 10.00, 17.00, 8.00],
        [17.00, 8.00, 0.05, 10.00, 0.10, 14.00],
    ]
)
_HARTMANN6_P = 0.0001 * np.array(
    [
        [1312, 1696, 5569, 124, 8283, 5886],
        [2329, 4135, 8307, 3736, 1004, 9991],
        [2348, 1451, 3522, 2883, 3047, 6650],
        [4047, 8828, 8732, 5743, 1091, 381],
    ]
)


def hartmann6(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima = [[0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573]]
    >>> f_opt = -3.322368011391339
    >>> np.allclose([hartmann6(optimum) for optimum in optima], f_opt, atol=1e-5)
    True
    """
    x = jnp.asarray(x)
    inner = jnp.sum(_HARTMANN6_A * (x[None, :] - _HARTMANN6_P) ** 2, axis=1)
    return -jnp.sum(_HARTMANN6_ALPHA * jnp.exp(-inner))


def levy(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima, f_opt = [[1.0]], 0.0
    >>> np.allclose([levy(optimum) for optimum in optima], f_opt)
    True
    """
    z = 1 + ((x[0] - 1.0) / 4.0)
    s = jnp.sin(jnp.pi * z) ** 2
    return s + ((z - 1) ** 2) * (1 + jnp.sin(2 * jnp.pi * z) ** 2)


def rosenbrock(x):
    """
    Examples
    --------
    >>> import numpy as np
    >>> optima, f_opt = [[1, 1]], 0.0
    >>> np.allclose([rosenbrock(optimum) for optimum in optima], f_opt)
    True
    """
    y = 0.0
    for i in range(len(x) - 1):
        y += 100 * (x[i + 1] - x[i] ** 2) ** 2
        y += (x[i] - 1) ** 2
    return y


def sin_one(x):
    """One-dimensional sin function (Kawaguchi et al., NIPS 2015).

    Examples
    --------
    >>> import numpy as np
    >>> optima = [[0.6330131633013163]]
    >>> f_opt = 0.042926342433644127
    >>> np.allclose([sin_one(optimum) for optimum in optima], f_opt)
    True
    """
    return 0.5 * jnp.sin(13 * x[0]) * jnp.sin(27 * x[0]) + 0.5


def sin_two(x):
    """Two-dimensional sin function (Kawaguchi et al., NIPS 2015).

    Examples
    --------
    >>> import numpy as np
    >>> optima = [[0.6330131633013163, 0.6330131633013163]]
    >>> f_opt = 0.042926342433644127 ** 2
    >>> np.allclose([sin_two(optimum) for optimum in optima], f_opt)
    True
    """
    return (0.5 * jnp.sin(13 * x[0]) * jnp.sin(27 * x[0]) + 0.5) * (
        0.5 * jnp.sin(13 * x[1]) * jnp.sin(27 * x[1]) + 0.5
    )

"""On-device minibatch selection.

The reference feeds minibatches through ``tf.Session.run`` feed-dicts built by
host-side numpy generators (``/root/reference/pysgmcmc/data_batches.py``): a
seeded RNG picks a random *contiguous window* of the dataset each step
(``data_batches.py:118-129``) or additionally shuffles within the window
(``:132-206``).  A host round trip per step would dominate TPU step time, so
here the dataset lives in HBM and the window start is computed from the PRNG
key *inside* the jitted scan — the same index arithmetic
(``start = randint(0, n - batch + 1)``), but fused into the step.

Two layers are provided:

- ``batch_fn`` / ``shuffled_batch_fn``: pure ``(key) -> (x_batch, y_batch)``
  functions for use inside ``lax.scan`` (the TPU-native path).
- ``generate_batches`` / ``generate_shuffled_batches``: infinite host-side
  generators with the reference's signature shape for API parity; they yield
  ``(x_batch, y_batch)`` numpy-compatible arrays instead of feed-dicts
  (there are no placeholders in JAX).

Examples
--------
>>> import jax, jax.numpy as jnp
>>> x = jnp.arange(10.0).reshape(10, 1)
>>> y = jnp.arange(10.0)
>>> select = batch_fn(x, y, batch_size=4)
>>> xb, yb = select(jax.random.PRNGKey(0))
>>> (xb.shape, yb.shape)
((4, 1), (4, 1))
>>> bool((xb[1:, 0] - xb[:-1, 0] == 1.0).all())  # contiguous window
True
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np


def _effective_batch_size(n_examples, batch_size):
    """Shrink the batch to the dataset size, mirroring ``data_batches.py:107-116``."""
    effective = min(batch_size, n_examples)
    if effective != batch_size:
        logging.error(
            "Not enough datapoints to form a minibatch. Batchsize was set to %s",
            effective,
        )
    return effective


# Above this many elements in the precomputed windows tensor, fall back to
# dynamic_slice selection (fast single-chain; becomes a gather under vmap).
_WINDOWS_ELEMENT_BUDGET = 1 << 22


def batch_fn(x, y, batch_size=20):
    """Return a pure ``(key) -> (x_batch, y_batch)`` minibatch selector.

    Selects a random contiguous window ``[start, start + batch_size)`` with
    ``start ~ U{0, ..., n - batch_size}`` — identical index arithmetic to the
    reference (``data_batches.py:118-123``), but evaluated on device from a
    threefry key so the whole sampling run never leaves XLA.

    ``y`` batches are returned with shape ``(batch_size, 1)`` to match the
    reference's reshape (``data_batches.py:123-127``).

    TPU note: for small datasets the selector materializes all contiguous
    windows once and picks one with a one-hot *matmul*.  Under ``vmap``
    (thousands of chains, each drawing its own window) this lowers to one
    MXU matmul; the naive ``dynamic_slice`` formulation would lower to an
    XLA gather, which serializes on TPU (measured 5x slower on the whole
    8192-chain BNN step).  Large datasets fall back to ``dynamic_slice``.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n_examples = x.shape[0]
    batch_size = _effective_batch_size(n_examples, batch_size)
    n_windows = n_examples - batch_size + 1

    x_feature_size = int(np.prod(x.shape[1:], dtype=np.int64)) if x.ndim > 1 else 1
    windows_elements = n_windows * batch_size * (x_feature_size + 1)
    use_onehot = (
        windows_elements <= _WINDOWS_ELEMENT_BUDGET
        and jnp.issubdtype(x.dtype, jnp.floating)
        and jnp.issubdtype(y.dtype, jnp.floating)
    )

    if use_onehot:
        x_windows = jnp.stack(
            [x[i:i + batch_size].reshape(-1) for i in range(n_windows)]
        )  # (n_windows, batch*feat)
        y_windows = jnp.stack(
            [y[i:i + batch_size].reshape(-1) for i in range(n_windows)]
        )
        x_batch_shape = (batch_size,) + x.shape[1:]

        def select(key):
            start = jax.random.randint(key, (), 0, n_windows)
            onehot = (jnp.arange(n_windows) == start).astype(x.dtype)
            x_batch = (onehot @ x_windows).reshape(x_batch_shape)
            y_batch = (onehot.astype(y.dtype) @ y_windows).reshape(-1, 1)
            return x_batch, y_batch

        return select

    def select(key):
        start = jax.random.randint(key, (), 0, n_windows)
        x_batch = jax.lax.dynamic_slice_in_dim(x, start, batch_size, axis=0)
        y_batch = jax.lax.dynamic_slice_in_dim(y, start, batch_size, axis=0)
        return x_batch, y_batch.reshape(-1, 1)

    return select


def shuffled_batch_fn(x, y, batch_size=20):
    """Like :func:`batch_fn` but with an in-window permutation per batch.

    TPU-native analog of ``generate_shuffled_batches``
    (``data_batches.py:132-206``): the same permutation is applied to ``x``
    and ``y`` so datapoints stay aligned with their labels.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n_examples = x.shape[0]
    batch_size = _effective_batch_size(n_examples, batch_size)

    def select(key):
        key_start, key_perm = jax.random.split(key)
        start = jax.random.randint(key_start, (), 0, n_examples - batch_size + 1)
        perm = jax.random.permutation(key_perm, batch_size)
        x_batch = jax.lax.dynamic_slice_in_dim(x, start, batch_size, axis=0)[perm]
        y_batch = jax.lax.dynamic_slice_in_dim(y, start, batch_size, axis=0)[perm]
        return x_batch, y_batch.reshape(-1, 1)

    return select


def generate_batches(x, y, batch_size=20, seed=None):
    """Infinite host-side generator of ``(x_batch, y_batch)`` minibatches.

    API-parity counterpart of ``data_batches.py:10-129``.  Yields arrays
    instead of feed-dicts.  Batch extraction is seed-deterministic: two
    generators built with the same seed yield identical batch streams
    (cf. ``tests/test_data_batches.py:177-209`` in the reference).
    """
    assert isinstance(batch_size, int), "generate_batches: batch size must be an integer."
    assert batch_size > 0, "generate_batches: batch size must be greater than zero."
    assert seed is None or isinstance(seed, int), (
        "generate_batches: seed must be an integer or `None`"
    )
    assert y.shape[0] == x.shape[0], "Not exactly one label per datapoint!"

    n_examples = x.shape[0]
    if seed is None:
        seed = np.random.randint(1, 100000)

    batch_size = _effective_batch_size(n_examples, batch_size)

    key = jax.random.PRNGKey(seed)
    while True:
        key, subkey = jax.random.split(key)
        start = int(jax.random.randint(subkey, (), 0, n_examples - batch_size + 1))
        yield x[start:start + batch_size], y[start:start + batch_size].reshape(-1, 1)


def generate_shuffled_batches(x, y, batch_size=20, seed=None):
    """Infinite host-side generator of shuffled minibatches.

    API-parity counterpart of ``data_batches.py:132-206``: same windows as
    :func:`generate_batches` for the same seed, with an identical permutation
    applied to ``x`` and ``y``.
    """
    if seed is None:
        seed = np.random.randint(1, 100000)

    key = jax.random.PRNGKey(seed ^ 0x5EED5)
    for x_batch, y_batch in generate_batches(x, y, batch_size=batch_size, seed=seed):
        key, subkey = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(subkey, x_batch.shape[0]))
        yield x_batch[perm], y_batch[perm]

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

from pysgmcmc_tpu.data_batches import (
    batch_fn,
    generate_batches,
    generate_shuffled_batches,
    shuffled_batch_fn,
)


def _data(n=100, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, (n, d))
    y = rng.choice([0.0, 1.0], n)
    return x, y


def test_batch_shapes():
    x, y = _data()
    gen = generate_batches(x, y, batch_size=20, seed=1)
    xb, yb = next(gen)
    assert xb.shape == (20, 3)
    assert yb.shape == (20, 1)


def test_seeded_streams_identical():
    """Same seed -> identical batch streams (reference
    ``test_data_batches.py:177-209``)."""
    x, y = _data()
    gen1 = generate_batches(x, y, batch_size=10, seed=7)
    gen2 = generate_batches(x, y, batch_size=10, seed=7)
    for _ in range(5):
        (x1, y1), (x2, y2) = next(gen1), next(gen2)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)


def test_batch_larger_than_dataset_shrinks():
    """batch_size > n shrinks to n with an error log (reference
    ``data_batches.py:107-116``)."""
    x, y = _data(n=8)
    gen = generate_batches(x, y, batch_size=50, seed=0)
    xb, yb = next(gen)
    assert xb.shape == (8, 3)


def test_batch_equals_dataset():
    x, y = _data(n=20)
    gen = generate_batches(x, y, batch_size=20, seed=0)
    xb, _ = next(gen)
    np.testing.assert_array_equal(xb, x)


def test_on_device_batch_fn_matches_window_semantics():
    """Windows are contiguous and labels stay aligned with datapoints."""
    x = np.arange(50, dtype=np.float32).reshape(50, 1)
    y = np.arange(50, dtype=np.float32)
    select = batch_fn(x, y, batch_size=10)
    for i in range(5):
        xb, yb = select(jax.random.PRNGKey(i))
        xb, yb = np.asarray(xb), np.asarray(yb)
        start = xb[0, 0]
        np.testing.assert_array_equal(xb[:, 0], start + np.arange(10))
        np.testing.assert_array_equal(yb[:, 0], xb[:, 0])  # aligned


def test_shuffled_batch_fn_keeps_alignment():
    x = np.arange(50, dtype=np.float32).reshape(50, 1)
    y = np.arange(50, dtype=np.float32)
    select = shuffled_batch_fn(x, y, batch_size=10)
    xb, yb = select(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(xb)[:, 0], np.asarray(yb)[:, 0])
    # and actually shuffled (overwhelmingly likely)
    assert not np.all(np.diff(np.asarray(xb)[:, 0]) == 1)


def test_shuffled_generator_alignment():
    x, y = _data()
    gen = generate_shuffled_batches(x, y, batch_size=10, seed=5)
    lookup = {tuple(row): label for row, label in zip(x, y)}
    for _ in range(3):
        xb, yb = next(gen)
        for row, label in zip(xb, yb[:, 0]):
            assert lookup[tuple(row)] == label


if HAS_HYPOTHESIS:

    @settings(max_examples=20, deadline=None)
    @given(
        batch_size=st.integers(min_value=1, max_value=150),
        n=st.integers(min_value=1, max_value=120),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_property_shapes(batch_size, n, seed):
        """Shape invariants under arbitrary batch/dataset sizes (reference
        hypothesis suite, ``test_data_batches.py:128-174``)."""
        x, y = _data(n=n)
        gen = generate_batches(x, y, batch_size=batch_size, seed=seed)
        xb, yb = next(gen)
        effective = min(batch_size, n)
        assert xb.shape == (effective, 3)
        assert yb.shape == (effective, 1)

    @settings(max_examples=10, deadline=None)
    @given(seed=st.integers(min_value=0, max_value=2**31 - 1))
    def test_property_device_fn_deterministic(seed):
        x, y = _data(n=30)
        select = batch_fn(x, y, batch_size=4)
        xb1, _ = select(jax.random.PRNGKey(seed))
        xb2, _ = select(jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(np.asarray(xb1), np.asarray(xb2))


def test_invalid_inputs():
    x, y = _data()
    with pytest.raises(AssertionError):
        next(generate_batches(x, y, batch_size=0))
    with pytest.raises(AssertionError):
        next(generate_batches(x, y, batch_size=1.5))
    with pytest.raises(AssertionError):
        next(generate_batches(x, y[:10], batch_size=5))

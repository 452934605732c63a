import numpy as np
import pytest

from pysgmcmc_tpu.utils.sample_store import SampleStore


def test_basic_append_get():
    with SampleStore(capacity=10, width=3) as store:
        rows = np.arange(12, dtype=np.float32).reshape(4, 3)
        store.append(rows)
        assert len(store) == 4
        assert store.total_appended == 4
        np.testing.assert_array_equal(store.asarray(), rows)
        np.testing.assert_array_equal(store.get(1, 2), rows[1:3])


def test_ring_overwrite_semantics():
    """Deque-maxlen behavior: only the newest `capacity` rows survive."""
    with SampleStore(capacity=5, width=2) as store:
        for i in range(9):  # 9 single-row appends into capacity 5
            store.append(np.full((1, 2), float(i), dtype=np.float32))
        assert len(store) == 5
        assert store.total_appended == 9
        np.testing.assert_array_equal(
            store.asarray()[:, 0], np.asarray([4, 5, 6, 7, 8], np.float32)
        )


def test_bulk_append_larger_than_capacity():
    with SampleStore(capacity=4, width=1) as store:
        store.append(np.arange(10, dtype=np.float32).reshape(10, 1))
        np.testing.assert_array_equal(
            store.asarray()[:, 0], np.asarray([6, 7, 8, 9], np.float32)
        )


def test_wraparound_split_append():
    with SampleStore(capacity=6, width=1) as store:
        store.append(np.arange(4, dtype=np.float32).reshape(4, 1))
        store.append(np.arange(4, 9, dtype=np.float32).reshape(5, 1))  # wraps
        np.testing.assert_array_equal(
            store.asarray()[:, 0], np.asarray([3, 4, 5, 6, 7, 8], np.float32)
        )


def test_file_backed(tmp_path):
    path = tmp_path / "ring.bin"
    with SampleStore(capacity=8, width=2, path=str(path)) as store:
        store.append(np.ones((3, 2), dtype=np.float32))
        assert path.exists()
        assert len(store) == 3


def test_width_mismatch():
    with SampleStore(capacity=4, width=3) as store:
        with pytest.raises(ValueError):
            store.append(np.zeros((2, 5), dtype=np.float32))


def test_stream_from_sampler():
    """End-to-end: stream scan segments into the native store."""
    import jax
    import jax.numpy as jnp

    from pysgmcmc_tpu.samplers.base import sample_chain
    from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler

    sampler = SGHMCSampler(lambda x: 0.5 * jnp.sum(x**2), burn_in_steps=5)
    state = sampler.init(jnp.zeros(3))
    key = jax.random.PRNGKey(0)
    with SampleStore(capacity=50, width=3) as store:
        for _ in range(4):  # 4 segments x 20 draws, capacity 50
            key, sub = jax.random.split(key)
            state, positions, _ = sample_chain(sampler, state, sub, 20)
            store.append(np.asarray(positions))
        assert store.total_appended == 80
        assert len(store) == 50
        history = store.asarray()
        assert history.shape == (50, 3)
        assert np.isfinite(history).all()

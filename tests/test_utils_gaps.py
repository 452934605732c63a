"""Direct unit tests for small utility surfaces the rest of the suite
only exercises incidentally (found via ``ci/run_tests.sh cov``):
pytree helpers, the checkpoint npz fallback, the profiler context, and
the ``BaseModel`` convenience methods (reference
``models/base_model.py:30-137``)."""

import glob
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.models.base_model import (
    BaseModel,
    zero_one_normalization,
    zero_one_unnormalization,
)
from pysgmcmc_tpu.utils import checkpoint as checkpoint_mod
from pysgmcmc_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from pysgmcmc_tpu.utils.profiling import StepTimer, log_progress, trace
from pysgmcmc_tpu.utils.pytree import (
    normal_like_tree,
    tree_ones_like,
    tree_zeros_like,
)


#  pytree helpers -----------------------------------------------------------


def test_tree_ones_and_zeros_like():
    tree = {"a": jnp.zeros((2, 3)), "b": jnp.arange(4, dtype=jnp.int32)}
    ones = tree_ones_like(tree)
    zeros = tree_zeros_like(tree, dtype=jnp.float32)
    assert bool((ones["a"] == 1.0).all()) and ones["a"].dtype == jnp.float32
    assert bool((ones["b"] == 1).all()) and ones["b"].dtype == jnp.int32
    assert zeros["b"].dtype == jnp.float32
    assert bool((zeros["b"] == 0.0).all())


def test_normal_like_tree_rbg_bits():
    tree = {"w": jnp.zeros((3, 5)), "b": jnp.zeros((7,))}
    key = jax.random.PRNGKey(42)
    draw1 = normal_like_tree(key, tree, bits_impl="rbg")
    draw2 = normal_like_tree(key, tree, bits_impl="rbg")
    default = normal_like_tree(key, tree)
    for name in tree:
        assert draw1[name].shape == tree[name].shape
        # deterministic in (key, shape, impl)
        np.testing.assert_array_equal(
            np.asarray(draw1[name]), np.asarray(draw2[name])
        )
        # a different bit generator produces a different stream
        assert not np.array_equal(
            np.asarray(draw1[name]), np.asarray(default[name])
        )
    # plausibly standard normal
    flat = np.concatenate(
        [np.asarray(draw1[n]).ravel() for n in tree])
    assert abs(flat.mean()) < 1.0 and 0.3 < flat.std() < 3.0


#  checkpoint npz fallback ---------------------------------------------------


def test_checkpoint_npz_fallback_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(checkpoint_mod, "_HAS_ORBAX", False)
    tree = {
        "theta": jnp.arange(6.0).reshape(2, 3),
        "key": jax.random.PRNGKey(7),
        "step": jnp.asarray(11, jnp.int32),
    }
    path = os.fspath(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    like = {
        "theta": jnp.zeros((2, 3)),
        "key": jax.random.PRNGKey(0),
        "step": jnp.asarray(0, jnp.int32),
    }
    restored = restore_checkpoint(path, like=like)
    np.testing.assert_array_equal(
        np.asarray(restored["theta"]), np.asarray(tree["theta"]))
    assert int(restored["step"]) == 11
    # the PRNG key round-trips to an identical stream
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(restored["key"], (4,))),
        np.asarray(jax.random.uniform(tree["key"], (4,))),
    )


def test_checkpoint_npz_fallback_requires_like(tmp_path, monkeypatch):
    monkeypatch.setattr(checkpoint_mod, "_HAS_ORBAX", False)
    path = os.fspath(tmp_path / "ckpt")
    save_checkpoint(path, {"x": jnp.zeros(2)})
    with pytest.raises(ValueError):
        restore_checkpoint(path)


#  profiling -----------------------------------------------------------------


def test_trace_writes_profile(tmp_path):
    with trace(tmp_path):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # jax.profiler writes plugins/profile/<run>/*.xplane.pb under log_dir
    assert glob.glob(os.fspath(tmp_path) + "/**/*.xplane.pb", recursive=True)


def test_step_timer_and_log_progress(caplog):
    timer = StepTimer()
    elapsed = timer.measure(lambda: jnp.ones(4) + 1.0, n_warmup=1, n_repeats=2)
    assert elapsed > 0.0
    with caplog.at_level(logging.INFO):
        log_progress(0, 1.25, start_time=0.0)
        log_progress(1, 1.25, start_time=0.0)          # not a log step
        log_progress(512, 0.5, start_time=0.0, n_samples=3)
    messages = [r.getMessage() for r in caplog.records]
    assert len(messages) == 2
    assert "NLL = 1.2500e+00" in messages[0]
    assert "Samples = 3" in messages[1]


#  BaseModel conveniences ----------------------------------------------------


class _RecordingModel(BaseModel):
    def __init__(self):
        self.X = np.zeros((2, 1))
        self.y = np.asarray([3.0, 1.0])
        self.trained_with = None

    def train(self, X, y):
        self.trained_with = (X, y)
        self.X, self.y = X, y

    def predict(self, X_test):
        return np.zeros(len(X_test)), np.ones(len(X_test))


def test_update_appends_and_retrains():
    model = _RecordingModel()
    model.update(np.asarray([[5.0]]), np.asarray([0.5]))
    X, y = model.trained_with
    assert X.shape == (3, 1) and y.shape == (3,)
    assert y[-1] == 0.5


def test_get_incumbent_and_json_data():
    model = _RecordingModel()
    x_best, y_best = model.get_incumbent()
    assert y_best == 1.0 and x_best.shape == (1,)
    data = model.get_json_data()
    assert data["X"] == [[0.0], [0.0]] and data["y"] == [3.0, 1.0]


def test_zero_one_normalization_roundtrip():
    X = np.asarray([[0.0, 2.0], [4.0, 6.0], [2.0, 4.0]])
    X_norm, lower, upper = zero_one_normalization(X)
    assert X_norm.min() == 0.0 and X_norm.max() == 1.0
    np.testing.assert_allclose(
        zero_one_unnormalization(X_norm, lower, upper), X)

"""Checkpoint / resume for sampler state and collected posteriors.

The reference has no checkpointing at all — its posterior "state" is an
in-memory deque of weight snapshots
(``/root/reference/pysgmcmc/models/bayesian_neural_network.py:290``) and a
crashed run loses everything.  Here any sampler state (an arbitrary pytree:
position, momentum, burn-in statistics, step counter, schedule state) plus
collected samples and PRNG keys round-trip through orbax, so long chains
resume exactly where they stopped — bit-for-bit, because the PRNG key is
part of the state.

Usage::

    save_checkpoint(path, {"state": state, "key": key, "samples": samples})
    restored = restore_checkpoint(path, like={"state": state, ...})

Examples
--------
>>> import os, tempfile
>>> import numpy as np, jax.numpy as jnp
>>> path = os.path.join(tempfile.mkdtemp(), "ckpt")
>>> save_checkpoint(path, {"x": jnp.ones(2)})
>>> bool(np.allclose(restore_checkpoint(path)["x"], 1.0))
True
"""

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    _HAS_ORBAX = False


def _is_key(x):
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _encode_keys(tree):
    """Typed PRNG keys -> raw uint32 key data (orbax-serializable)."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.random.key_data(leaf) if _is_key(leaf) else leaf,
        tree,
        is_leaf=_is_key,
    )


def save_checkpoint(path, tree, force=True):
    """Save a pytree checkpoint to directory ``path``."""
    path = os.path.abspath(os.fspath(path))
    tree = _encode_keys(tree)
    if _HAS_ORBAX:
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, jax.tree_util.tree_map(np.asarray, tree),
                          force=force)
    else:  # flat npz fallback
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "checkpoint.npz"),
            *[np.asarray(leaf) for leaf in leaves],
        )


def restore_checkpoint(path, like=None):
    """Restore a pytree checkpoint from ``path``.

    ``like`` (optional) provides the target structure/dtypes; typed PRNG
    keys in ``like`` are re-wrapped from their stored raw key data.
    """
    path = os.path.abspath(os.fspath(path))
    if _HAS_ORBAX:
        checkpointer = ocp.PyTreeCheckpointer()
        if like is not None:
            target = jax.tree_util.tree_map(
                np.asarray, _encode_keys(like), is_leaf=_is_key
            )
            restored = checkpointer.restore(path, item=target)
        else:
            restored = checkpointer.restore(path)
    else:
        if like is None:
            raise ValueError("npz fallback restore requires `like`")
        data = np.load(os.path.join(path, "checkpoint.npz"))
        leaves = [data[k] for k in data.files]
        restored = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(_encode_keys(like)), leaves
        )
    if like is None:
        return restored

    def rewrap(like_leaf, stored):
        if _is_key(like_leaf):
            impl = jax.random.key_impl(like_leaf)
            return jax.random.wrap_key_data(
                jax.numpy.asarray(stored), impl=impl
            )
        return jax.numpy.asarray(stored, like_leaf.dtype).reshape(
            jax.numpy.shape(like_leaf)
        )

    return jax.tree_util.tree_map(rewrap, like, restored, is_leaf=_is_key)

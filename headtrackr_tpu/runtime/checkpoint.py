"""Checkpoint / resume for tracker state.

The reference has no checkpointing — all state lives in JS closures
(SURVEY §5).  Here per-stream state is an explicit pytree, so serving state
(N streams mid-track: mode, model histograms, search windows, smoother, FOV
caches) round-trips through a flat .npz.  A BatchedTracker can be stopped and
resumed, or its streams migrated to another chip count, without re-detection.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..models import facetracker as ft

__all__ = ["save_state", "load_state", "save_tracker", "load_tracker"]

_FIELDS = None


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_state(path, state):
    """Write a TrackerState pytree (single or batched) to ``path`` (.npz)."""
    leaves, _ = _flatten(state)
    np.savez_compressed(path, n_leaves=np.int32(len(leaves)),
                        **{f"leaf_{i}": np.asarray(v)
                           for i, v in enumerate(leaves)})


def load_state(path, like=None):
    """Load a TrackerState from ``path``.  ``like``: template state (defaults
    to a fresh single-stream state) providing the tree structure."""
    if like is None:
        like = ft.init_state()
    d = np.load(path)
    n = int(d["n_leaves"])
    leaves = [jnp.asarray(d[f"leaf_{i}"]) for i in range(n)]
    _, treedef = _flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_tracker(path, bt):
    """Checkpoint a BatchedTracker's streams (state + host mode mirror)."""
    modes = bt.modes  # drains pending sync
    leaves, _ = _flatten(bt.state)
    np.savez_compressed(path, n_leaves=np.int32(len(leaves)),
                        host_modes=modes,
                        **{f"leaf_{i}": np.asarray(v)
                           for i, v in enumerate(leaves)})


def load_tracker(path, bt):
    """Restore a checkpoint into an existing BatchedTracker (same n_streams)."""
    d = np.load(path)
    n = int(d["n_leaves"])
    leaves = [jnp.asarray(d[f"leaf_{i}"]) for i in range(n)]
    _, treedef = _flatten(bt.state)
    bt.state = jax.tree_util.tree_unflatten(treedef, leaves)
    bt._modes = np.array(d["host_modes"])
    bt._pending_modes = None
    return bt

"""Checkpoint / resume for tracker state.

The reference has no checkpointing — all state lives in JS closures
(SURVEY §5).  Here per-stream state is an explicit pytree, so serving state
(N streams mid-track: mode, model histograms, search windows, smoother, FOV
caches) round-trips through a flat .npz.  A BatchedTracker can be stopped and
resumed, or its streams migrated to another chip count, without re-detection
(load_tracker re-applies the target tracker's sharding; mesh -> single-device
and mesh -> different-mesh migration is tested in
tests/test_checkpoint.py::test_checkpoint_mesh_migration).

Format (v2): leaves are keyed by their TrackerState field paths
(``state/cs/model_hist`` …), alongside a format version and shape metadata,
and loading validates paths/shapes/dtypes against the target — a checkpoint
from a different n_streams, frame geometry, or state schema fails loudly
instead of silently unflattening mismatched leaves.  v1 positional ``leaf_i``
checkpoints are still readable (structure validated by leaf count only).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..models import facetracker as ft

__all__ = ["save_state", "load_state", "save_tracker", "load_tracker"]

FORMAT_VERSION = 2

# Leaves addable without breaking old checkpoints: absent paths default to
# zeros of the template leaf (state/pend_age is ephemeral scheduler state —
# a resumed tracker just restarts its wait counters; the sparse-model
# descriptor defaults to all-zero counts -> zero backprojection weights, so
# an old checkpoint resumed into a sparseHist config loses track on the
# first tick and cleanly redetects, rebuilding the descriptor at handoff).
_OPTIONAL_PATHS = {"state/pend_age", "state/cs/model_bins",
                   "state/cs/model_counts", "state/cs/model_overflow",
                   "state/cs/band_dirty"}
# Non-zero defaults for absent optional leaves.  band_dirty defaults DIRTY
# (true): a pre-audit checkpoint resumed into an audited bandHist config was
# never content-audited, so its streams are conservatively served by the
# reference-exact full-frame fallback until their next relock re-audits.
_OPTIONAL_DEFAULTS = {"state/cs/band_dirty": 1}


def _keyed_leaves(state):
    """[(path_string, leaf)] in tree order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    out = []
    for path, leaf in flat:
        name = "state" + "".join(
            f"/{getattr(p, 'name', getattr(p, 'idx', getattr(p, 'key', '?')))}"
            for p in path)
        out.append((name, leaf))
    return out


def _save(path, state, extra):
    keyed = _keyed_leaves(state)
    names = [k for k, _ in keyed]
    assert len(set(names)) == len(names), "duplicate leaf paths"
    np.savez_compressed(
        path, __format__=np.int32(FORMAT_VERSION),
        __paths__=np.asarray(names),
        **{k: np.asarray(v) for k, v in keyed}, **extra)


def _load(path, like):
    d = np.load(path)
    if "__format__" not in d:  # v1 positional fallback
        n = int(d["n_leaves"])
        leaves = [jnp.asarray(d[f"leaf_{i}"]) for i in range(n)]
        _, treedef = jax.tree_util.tree_flatten(like)
        if treedef.num_leaves != n:
            raise ValueError(
                f"v1 checkpoint has {n} leaves, target state has "
                f"{treedef.num_leaves} — incompatible schema")
        return jax.tree_util.tree_unflatten(treedef, leaves), d
    want = _keyed_leaves(like)
    have = set(np.asarray(d["__paths__"]).tolist())
    missing = [k for k, _ in want if k not in have and k not in _OPTIONAL_PATHS]
    extra = have - {k for k, _ in want}
    if missing or extra:
        raise ValueError(
            f"checkpoint schema mismatch: missing {missing}, "
            f"unknown {sorted(extra)}")
    leaves = []
    for k, tmpl in want:
        if k not in have:  # optional leaf absent in an older checkpoint
            leaves.append(jnp.full(np.shape(tmpl),
                                   _OPTIONAL_DEFAULTS.get(k, 0),
                                   np.asarray(tmpl).dtype))
            continue
        v = d[k]
        tshape = tuple(np.shape(tmpl))
        if tuple(v.shape) != tshape:
            raise ValueError(
                f"checkpoint leaf {k!r} has shape {tuple(v.shape)}, "
                f"target expects {tshape} (different n_streams or frame "
                f"geometry?)")
        tdtype = np.asarray(tmpl).dtype if not hasattr(tmpl, "dtype") \
            else tmpl.dtype
        if v.dtype != tdtype:
            raise ValueError(
                f"checkpoint leaf {k!r} has dtype {v.dtype}, "
                f"target expects {tdtype}")
        leaves.append(jnp.asarray(v))
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves), d


def save_state(path, state):
    """Write a TrackerState pytree (single or batched) to ``path`` (.npz)."""
    _save(path, state, {})


def load_state(path, like=None):
    """Load a TrackerState from ``path``.  ``like``: template state providing
    the tree structure AND the expected leaf shapes/dtypes (defaults to a
    fresh single-stream state)."""
    if like is None:
        like = ft.init_state()
    state, _ = _load(path, like)
    return state


def save_tracker(path, bt):
    """Checkpoint a BatchedTracker's streams (state + host mode mirror)."""
    modes = bt.modes  # drains pending sync
    _save(path, bt.state, dict(host_modes=modes,
                               n_streams=np.int32(bt.n),
                               frame_shape=np.asarray(bt.frame_shape)))


def load_tracker(path, bt):
    """Restore a checkpoint into an existing BatchedTracker (same n_streams
    and frame shape — validated).  The target tracker's device placement is
    re-applied explicitly: a mesh tracker gets its stream-axis sharding, a
    single-device tracker gets plain placement — so checkpoints MIGRATE
    across chip counts (save on an 8-device mesh, restore on 1 device or a
    different mesh size; the state schema is placement-independent).  Without
    this device_put the host arrays would only be re-placed incidentally by
    the next jit's in_shardings."""
    state, d = _load(path, bt.state)
    if "n_streams" in d and int(d["n_streams"]) != bt.n:
        raise ValueError(f"checkpoint has {int(d['n_streams'])} streams, "
                         f"tracker has {bt.n}")
    if "frame_shape" in d and tuple(d["frame_shape"]) != tuple(bt.frame_shape):
        raise ValueError(
            f"checkpoint frame shape {tuple(d['frame_shape'])} != "
            f"tracker {tuple(bt.frame_shape)}")
    if bt.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        state = jax.device_put(state, NamedSharding(bt.mesh, P("streams")))
    else:
        state = jax.device_put(state)
    bt.state = state
    bt._modes = np.array(d["host_modes"])
    bt._pending_modes = None
    return bt

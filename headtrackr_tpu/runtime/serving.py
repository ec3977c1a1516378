"""Batched multi-stream serving: N cameras on one chip (or a mesh of chips).

The reference runs one Tracker per camera in one JS thread.  Here per-stream
state is a pytree, so N streams are a stacked state and a vmapped step — no
cross-stream communication exists in the algorithm, so scaling is pure data
parallelism over a 1-D device mesh (SURVEY §2 checklist).

Dispatch policy (host scheduler):
  - any stream in WB or VJ mode  -> vmapped "full" step (pays the detector)
  - every stream tracking (CS)   -> vmapped "track" fast path
Modes live on device; the host reads back a tiny mode vector each tick to pick
the next step function.  Both functions are compiled once.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cascade import frontalface
from ..config import TrackerConfig
from ..models import facetracker as ft

__all__ = ["BatchedTracker", "make_batched_steps"]


def make_batched_steps(cascade, config, frame_shape, mesh=None, donate=True):
    """Returns (step_full, step_track): jitted vmapped step functions.

    With a mesh, state and frames are sharded over the leading (stream) axis on
    mesh axis 'streams'; XLA partitions the step SPMD over ICI with no
    collectives in the hot path.
    """
    full = jax.vmap(ft.make_step(cascade, config, frame_shape, "full"))
    track = jax.vmap(ft.make_step(cascade, config, frame_shape, "track"))
    kw = dict(donate_argnums=0) if donate else {}
    if mesh is None:
        return jax.jit(full, **kw), jax.jit(track, **kw)
    shard = NamedSharding(mesh, P("streams"))
    return (jax.jit(full, in_shardings=(shard, shard), **kw),
            jax.jit(track, in_shardings=(shard, shard), **kw))


class BatchedTracker:
    """Serve N independent streams with one device program per tick."""

    def __init__(self, n_streams, frame_shape=(240, 320), params=None,
                 cascade=None, mesh=None, **kw):
        merged = dict(params or {})
        merged.update(kw)
        self.config = TrackerConfig(**merged)
        self.n = n_streams
        self.frame_shape = frame_shape
        self.cascade = cascade if cascade is not None else frontalface()
        self.mesh = mesh
        self._step_full, self._step_track = make_batched_steps(
            self.cascade, self.config, frame_shape, mesh)
        state1 = ft.init_state(self.config.whitebalancing)
        self.state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), state1)
        if mesh is not None:
            shard = NamedSharding(mesh, P("streams"))
            self.state = jax.device_put(self.state, shard)
        self._modes = np.full((n_streams,), ft.MODE_WB if
                              self.config.whitebalancing else ft.MODE_VJ,
                              np.int32)

    def reset_stream(self, i):
        """Re-initialize one stream (new camera connects)."""
        s1 = ft.init_state(self.config.whitebalancing)
        self.state = jax.tree_util.tree_map(
            lambda buf, v: buf.at[i].set(v), self.state, s1)
        self._modes[i] = int(s1.mode)

    def step(self, frames):
        """frames: (N, H, W, 3) u8.  Returns StepOutput batch (device arrays).

        Picks the camshift fast path when every stream is tracking.
        """
        frames = jnp.asarray(frames)
        all_cs = bool((self._modes == ft.MODE_CS).all())
        fn = self._step_track if all_cs else self._step_full
        self.state, out = fn(self.state, frames)
        self._modes = np.array(self.state.mode)  # writable host copy
        return out

    @property
    def modes(self):
        return self._modes.copy()

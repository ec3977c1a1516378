"""Device-mesh utilities for multi-chip stream-parallel serving.

The tracking algorithm has no cross-stream communication (SURVEY §2), so the
distributed story is a 1-D mesh with the stream batch sharded over it: XLA
compiles the vmapped step SPMD; the only traffic on ICI is incidental (none in
the hot path), and host<->device transfer is the per-chip frame slice.

Usage:
    mesh = stream_mesh()                       # all local devices, axis "streams"
    bt = BatchedTracker(256, mesh=mesh)        # state + frames sharded
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stream_mesh", "shard_streams"]


def stream_mesh(devices=None, axis_name="streams"):
    """1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_streams(tree, mesh, axis_name="streams"):
    """Place a stream-batched pytree with its leading axis sharded on the mesh."""
    shard = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, shard)

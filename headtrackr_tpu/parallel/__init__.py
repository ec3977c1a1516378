from .mesh import stream_mesh, shard_streams

__all__ = ["stream_mesh", "shard_streams"]

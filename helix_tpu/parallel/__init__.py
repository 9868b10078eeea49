"""Multi-chip scale-out: sharded search over a device mesh."""

from .sharded import ShardedVectorSearch, make_mesh  # noqa: F401

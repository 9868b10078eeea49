"""Multi-chip scale-out: sharded search + graph traversal over a device mesh."""

from .build import ShardedKMeans  # noqa: F401
from .graph import ShardedGraph  # noqa: F401
from .sharded import ShardedVectorSearch, make_mesh  # noqa: F401

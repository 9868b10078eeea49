"""Multi-chip scale-out: sharded search over a device mesh."""

from .build import ShardedKMeans  # noqa: F401
from .sharded import ShardedVectorSearch, make_mesh  # noqa: F401

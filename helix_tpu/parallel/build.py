"""Sharded index construction: data-parallel k-means over the mesh.

The engine's "training step" is index construction (BASELINE config[1]).
This shards it the way the search path shards serving: data rows are
partitioned across the ``shard`` axis, each device assigns its rows to
the replicated centroids and accumulates local sums/counts, and a
``psum`` over ICI produces the next centroid set — the classic
data-parallel update (gradients -> cluster sums).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ShardedKMeans:
    """Compiled sharded k-means step over a fixed mesh."""

    def __init__(self, mesh: Mesh, n_clusters: int, bf16: bool | None = None):
        self.mesh = mesh
        self.n_clusters = n_clusters
        self.bf16 = bf16 if bf16 is not None else jax.default_backend() == "tpu"
        self._step = self._build()

    def _build(self):
        mesh = self.mesh
        n_clusters = self.n_clusters
        bf16 = self.bf16

        def shard_fn(data, valid, centroids):
            # data [rows_local, D]; valid [rows_local]; centroids [C, D]
            if bf16:
                sims = jnp.dot(
                    data.astype(jnp.bfloat16),
                    centroids.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                sims = jnp.dot(data, centroids.T)
            assign = jnp.argmax(sims, axis=1).astype(jnp.int32)
            weights = valid.astype(jnp.float32)
            sums = jax.ops.segment_sum(
                data * weights[:, None], assign, num_segments=n_clusters
            )
            counts = jax.ops.segment_sum(
                weights[:, None], assign, num_segments=n_clusters
            )
            # ICI all-reduce of the partial statistics.
            sums = jax.lax.psum(sums, "shard")
            counts = jax.lax.psum(counts, "shard")
            fresh = sums / jnp.maximum(counts, 1.0)
            fresh = jnp.where(counts > 0, fresh, centroids)
            norms = jnp.linalg.norm(fresh, axis=1, keepdims=True)
            return fresh / jnp.maximum(norms, 1e-9)

        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("shard", None), P("shard"), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(mapped)

    def shard_arrays(self, data: np.ndarray) -> tuple[jax.Array, jax.Array]:
        n_shard = self.mesh.shape["shard"]
        n, d = data.shape
        rows = -(-n // n_shard)
        rows = ((rows + 7) // 8) * 8
        total = rows * n_shard
        padded = np.zeros((total, d), data.dtype)
        padded[:n] = data
        valid = np.zeros(total, bool)
        valid[:n] = True
        xs = jax.device_put(padded, NamedSharding(self.mesh, P("shard", None)))
        vs = jax.device_put(valid, NamedSharding(self.mesh, P("shard")))
        return xs, vs

    def fit(
        self, data: np.ndarray, iters: int = 8, seed: int = 0
    ) -> np.ndarray:
        data = np.asarray(data, np.float32)
        norms = np.linalg.norm(data, axis=1, keepdims=True)
        data = data / np.maximum(norms, 1e-9)
        rng = np.random.default_rng(seed)
        centroids = jnp.asarray(
            data[rng.choice(len(data), self.n_clusters, replace=False)]
        )
        xs, valid = self.shard_arrays(data)
        for _ in range(iters):
            centroids = self._step(xs, valid, centroids)
        return np.asarray(centroids)

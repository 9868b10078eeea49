"""IVF (inverted-file) ANN index: on-device k-means build + probed search.

The scale-out ANN tier above the exact scan: where the reference engine's
HNSW bounds work per query by walking a neighbor graph
(``m``/``ef_construction``/``ef_search`` tunables, reference
``helix-cli/src/config.rs:191-201``), this index bounds it by probing the
``nprobe`` nearest coarse cells — the formulation that maps onto the MXU:

- **build** = spherical k-means, entirely matmuls: chunked
  assign (``argmax(data @ centroids^T)``) + ``segment_sum`` centroid
  update under ``lax.scan``; then a stable counting-sort groups rows by
  cell (the "bulk batched insert" path of BASELINE config[1])
- **search** = two matmuls + gathers: query x centroids for the probe
  list, then a padded gather of the probed cells' rows scored against
  the query batch

Tunable mapping from the reference's knobs: ``ef_search`` scales
``nprobe`` (cells probed), ``ef_construction`` scales k-means iterations.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters", "chunk"))
def kmeans_fit(
    data: jax.Array,          # [N, D] float32 (pre-normalized for cosine)
    init: jax.Array,          # [C, D] initial centroids
    *,
    n_clusters: int,
    iters: int,
    chunk: int = 131072,
) -> tuple[jax.Array, jax.Array]:
    """Spherical k-means.  Returns (centroids [C, D], assign [N])."""
    n, d = data.shape
    data16 = data.astype(jnp.bfloat16)
    from .distance import pick_chunk

    chunk = pick_chunk(n, min(chunk, n))
    starts = jnp.arange(n // chunk, dtype=jnp.int32) * chunk

    def assign_all(centroids):
        c16 = centroids.astype(jnp.bfloat16)

        def body(_, start):
            block = jax.lax.dynamic_slice_in_dim(data16, start, chunk, axis=0)
            sims = jnp.dot(block, c16.T, preferred_element_type=jnp.float32)
            return None, jnp.argmax(sims, axis=1).astype(jnp.int32)

        _, parts = jax.lax.scan(body, None, starts)
        return parts.reshape(n)

    def step(centroids, _):
        assign = assign_all(centroids)
        sums = jax.ops.segment_sum(data, assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(
            jnp.ones((n, 1), jnp.float32), assign, num_segments=n_clusters
        )
        fresh = sums / jnp.maximum(counts, 1.0)
        # Keep empty cells at their previous position.
        fresh = jnp.where(counts > 0, fresh, centroids)
        norms = jnp.linalg.norm(fresh, axis=1, keepdims=True)
        fresh = fresh / jnp.maximum(norms, 1e-9)
        return fresh, None

    centroids, _ = jax.lax.scan(step, init, None, length=iters)
    return centroids, assign_all(centroids)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "pad"))
def ivf_search(
    packed: jax.Array,        # [N, D] rows grouped by cell (f32)
    centroids: jax.Array,     # [C, D]
    cell_rows: jax.Array,     # [C, M] row indices into packed (pad = N)
    qs: jax.Array,            # [B, D]
    *,
    k: int,
    nprobe: int,
    pad: int,                 # M
) -> tuple[jax.Array, jax.Array]:
    """Probed search.  Returns (cosine distances [B,k], packed-row idx)."""
    n = packed.shape[0]
    b = qs.shape[0]
    cscores = jnp.dot(
        qs.astype(jnp.bfloat16), centroids.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    _, probes = jax.lax.top_k(cscores, nprobe)        # [B, nprobe]
    cand = cell_rows[probes].reshape(b, nprobe * pad)  # [B, nprobe*M]
    valid = cand < n
    safe = jnp.where(valid, cand, 0)
    vectors = jnp.take(packed, safe, axis=0)           # [B, nprobe*M, D]
    sims = jnp.einsum(
        "bmd,bd->bm", vectors, qs, preferred_element_type=jnp.float32
    )
    sims = jnp.where(valid, sims, -jnp.inf)
    best_s, pos = jax.lax.top_k(sims, k)
    best_rows = jnp.take_along_axis(cand, pos, axis=1)
    return 1.0 - best_s, best_rows


class IVFIndex:
    """Built index: packed rows, centroids, cell table, id mapping."""

    def __init__(
        self,
        packed: jax.Array,
        centroids: jax.Array,
        cell_rows: jax.Array,
        row_to_original: np.ndarray,
        pad: int,
        build_seconds: float,
    ):
        self.packed = packed
        self.centroids = centroids
        self.cell_rows = cell_rows
        self.row_to_original = row_to_original
        self.pad = pad
        self.build_seconds = build_seconds

    @staticmethod
    def build(
        data: np.ndarray,
        n_clusters: int | None = None,
        iters: int = 8,
        seed: int = 0,
        normalize: bool = True,
    ) -> "IVFIndex":
        import time

        start = time.perf_counter()
        data = np.asarray(data, np.float32)
        if normalize:
            norms = np.linalg.norm(data, axis=1, keepdims=True)
            data = data / np.maximum(norms, 1e-9)
        n = len(data)
        if n_clusters is None:
            n_clusters = max(16, int(4 * math.sqrt(n)))
        n_clusters = min(n_clusters, n)
        rng = np.random.default_rng(seed)
        init = data[rng.choice(n, n_clusters, replace=False)]

        device_data = jnp.asarray(data)
        centroids, assign = kmeans_fit(
            device_data, jnp.asarray(init),
            n_clusters=n_clusters, iters=iters,
        )
        assign_h = np.asarray(assign)

        order = np.argsort(assign_h, kind="stable")
        packed_h = data[order]
        counts = np.bincount(assign_h, minlength=n_clusters)
        indptr = np.concatenate(([0], np.cumsum(counts)))
        pad = max(1, int(counts.max()))
        cell_rows = np.full((n_clusters, pad), n, np.int64)
        rows = np.arange(n)
        ranks = rows - indptr[assign_h[order]]
        cell_rows[assign_h[order], ranks] = rows
        index = IVFIndex(
            jnp.asarray(packed_h),
            centroids,
            jnp.asarray(cell_rows),
            order,
            pad,
            0.0,
        )
        jax.block_until_ready(index.packed)
        index.build_seconds = time.perf_counter() - start
        return index

    def search(
        self, queries: np.ndarray, k: int, nprobe: int = 16,
        normalize: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (distances [B,k], original row indices [B,k])."""
        queries = np.asarray(queries, np.float32)
        if normalize:
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-9)
        nprobe = min(nprobe, self.centroids.shape[0])
        dists, rows = ivf_search(
            self.packed, self.centroids, self.cell_rows,
            jnp.asarray(queries), k=k, nprobe=nprobe, pad=self.pad,
        )
        rows_h = np.asarray(rows)
        return np.asarray(dists), self.row_to_original[rows_h]

"""Graph-based ANN: k-NN graph build + batched beam search.

The structural analog of the reference engine's HNSW core
(``m``/``ef_construction``/``ef_search`` tunables, reference
``helix-cli/src/config.rs:191-201``), re-designed for the MXU instead of
pointer chasing:

- **Build**: spherical k-means coarse clustering (reused from the IVF
  tier), then per-cluster *local joins* — each cluster's members are
  scored against the members of its ``adjacent`` nearest clusters with
  one batched matmul, and the top-``degree`` rows become the node's
  neighbors.  Flat single-layer graph (CAGRA-style): the hierarchy of
  HNSW exists to find good entry points, which the centroid table
  provides directly.  ``degree`` plays the role of HNSW's ``2*m``.
- **Search**: batched best-first beam over the padded neighbor table:
  every iteration expands the whole beam (gather neighbor ids ->
  gather vectors -> one einsum of distances), merges candidates with a
  sort-based dedup, and keeps the best ``ef`` — all static shapes under
  ``lax.fori_loop``-free unrolled iterations.  ``ef`` maps from the
  reference's ``ef_search``.

Scale positioning (measured reasoning, see ops/distance.py): at <=1M
rows the exact single-shot scan is faster on TPU than any index; this
graph tier exists for corpora where the full-matrix scan stops fitting
the time/HBM budget, and for build-time parity (BASELINE config[1]).
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "iters", "rerank")
)
def beam_search(
    data16: jax.Array,        # [N, D] bfloat16 (padded rows score -inf via mask)
    data32: jax.Array,        # [N, D] float32 (exact re-rank)
    neighbors: jax.Array,     # [N, degree] int32, pad = N
    entries: jax.Array,       # [B, E] int32 entry rows per query
    qs: jax.Array,            # [B, D] float32
    n_valid: jax.Array,
    *,
    k: int,
    ef: int = 64,
    iters: int = 8,
    rerank: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Batched beam search; returns (dists [B,k], row ids [B,k]) ascending."""
    n, _ = data16.shape
    b, e = entries.shape
    degree = neighbors.shape[1]
    qs16 = qs.astype(jnp.bfloat16)

    def score(ids):
        # ids [B, M] -> cosine sims [B, M]; invalid rows -> -inf
        safe = jnp.clip(ids, 0, n - 1)
        vectors = jnp.take(data16, safe, axis=0)           # [B, M, D]
        sims = jnp.einsum(
            "bmd,bd->bm", vectors, qs16, preferred_element_type=jnp.float32
        )
        valid = (ids >= 0) & (ids < n_valid)
        return jnp.where(valid, sims, -jnp.inf)

    def dedup_penalize(ids, sims):
        """Set duplicate ids' sims to -inf, keeping each id's best sim.

        Two-pass stable lexsort — first by descending sim, then stably by
        id — groups equal ids with the best sim first, without needing a
        wide composite key (x64 is disabled in this runtime).
        """
        order1 = jnp.argsort(-sims, axis=1, stable=True)
        ids1 = jnp.take_along_axis(ids, order1, axis=1)
        order2 = jnp.argsort(ids1, axis=1, stable=True)
        order = jnp.take_along_axis(order1, order2, axis=1)
        sorted_ids = jnp.take_along_axis(ids, order, axis=1)
        dup = jnp.concatenate(
            [
                jnp.zeros((b, 1), bool),
                sorted_ids[:, 1:] == sorted_ids[:, :-1],
            ],
            axis=1,
        )
        # Scatter the dup mask back to original positions.
        inverse = jnp.argsort(order, axis=1)
        dup_orig = jnp.take_along_axis(dup, inverse, axis=1)
        return jnp.where(dup_orig, -jnp.inf, sims)

    beam_ids = jnp.concatenate(
        [entries, jnp.full((b, ef - e), -1, jnp.int32)], axis=1
    ) if e < ef else entries[:, :ef]
    beam_sims = score(beam_ids)

    for _ in range(iters):
        cand_ids = jnp.take(
            neighbors, jnp.clip(beam_ids, 0, n - 1), axis=0
        ).reshape(b, ef * degree)
        cand_ids = jnp.where(beam_ids.max(axis=1, keepdims=True) >= 0, cand_ids, -1)
        cand_sims = score(cand_ids)
        merged_ids = jnp.concatenate([beam_ids, cand_ids], axis=1)
        merged_sims = jnp.concatenate([beam_sims, cand_sims], axis=1)
        merged_sims = dedup_penalize(merged_ids, merged_sims)
        beam_sims, pos = jax.lax.top_k(merged_sims, ef)
        beam_ids = jnp.take_along_axis(merged_ids, pos, axis=1)

    if rerank:
        safe = jnp.clip(beam_ids, 0, n - 1)
        exact = jnp.einsum(
            "bmd,bd->bm", jnp.take(data32, safe, axis=0), qs,
            preferred_element_type=jnp.float32,
        )
        exact = jnp.where(jnp.isfinite(beam_sims), exact, -jnp.inf)
        beam_sims, pos = jax.lax.top_k(exact, k)
        beam_ids = jnp.take_along_axis(beam_ids, pos, axis=1)
    else:
        beam_sims, pos = jax.lax.top_k(beam_sims, k)
        beam_ids = jnp.take_along_axis(beam_ids, pos, axis=1)
    return 1.0 - beam_sims, beam_ids


class BeamIndex:
    """Built graph index over a normalized matrix."""

    def __init__(
        self,
        data32: jax.Array,
        data16: jax.Array,
        neighbors: jax.Array,
        centroids: jax.Array,
        cell_rows: jax.Array,
        n: int,
        build_seconds: float,
    ):
        self.data32 = data32
        self.data16 = data16
        self.neighbors = neighbors
        self.centroids = centroids
        self.cell_rows = cell_rows
        self.n = n
        self.build_seconds = build_seconds

    @staticmethod
    def build(
        data: np.ndarray,
        degree: int = 32,
        n_clusters: int | None = None,
        kmeans_iters: int = 6,
        adjacent: int = 4,
        seed: int = 0,
    ) -> "BeamIndex":
        """Bulk build: k-means + per-cluster local joins (all matmuls)."""
        from .ivf import kmeans_fit

        start = time.perf_counter()
        data = np.asarray(data, np.float32)
        norms = np.linalg.norm(data, axis=1, keepdims=True)
        data = data / np.maximum(norms, 1e-9)
        n, d = data.shape
        if n_clusters is None:
            n_clusters = max(8, int(2 * math.sqrt(n)))
        n_clusters = min(n_clusters, n)
        rng = np.random.default_rng(seed)
        init = data[rng.choice(n, n_clusters, replace=False)]
        device_data = jnp.asarray(data)
        centroids, assign = kmeans_fit(
            device_data, jnp.asarray(init),
            n_clusters=n_clusters, iters=kmeans_iters,
        )
        assign_h = np.asarray(assign)

        counts = np.bincount(assign_h, minlength=n_clusters)
        order = np.argsort(assign_h, kind="stable")
        indptr = np.concatenate(([0], np.cumsum(counts)))
        pad = max(1, int(counts.max()))
        cell_rows = np.full((n_clusters, pad), n, np.int64)
        ranks = np.arange(n) - indptr[assign_h[order]]
        cell_rows[assign_h[order], ranks] = order

        # Adjacent clusters by centroid similarity (incl. self).
        cent = np.asarray(centroids)
        csims = cent @ cent.T
        adj = np.argsort(-csims, axis=1)[:, :adjacent]        # [C, A]

        neighbors = np.full((n, degree), n, np.int32)
        # Process clusters in chunks sized to bound the local-join slab.
        slab_budget = 64 * 1024 * 1024  # float32 elements per chunk slab
        pool_width = adjacent * pad
        chunk = max(1, int(slab_budget // max(1, pad * pool_width)))
        padded_data = np.zeros((n + 1, d), np.float32)
        padded_data[:n] = data
        for start_c in range(0, n_clusters, chunk):
            cs = slice(start_c, min(start_c + chunk, n_clusters))
            members = cell_rows[cs]                           # [Cc, M]
            pool = cell_rows[adj[cs]].reshape(
                members.shape[0], pool_width
            )                                                  # [Cc, A*M]
            mv = padded_data[members]                          # [Cc, M, D]
            pv = padded_data[pool]                             # [Cc, A*M, D]
            sims = np.einsum("cmd,cnd->cmn", mv, pv)           # [Cc, M, A*M]
            # Mask pads and self-edges (broadcasted where, not fancy-index).
            invalid = (
                (members[:, :, None] >= n)
                | (pool[:, None, :] >= n)
                | (pool[:, None, :] == members[:, :, None])
            )
            sims = np.where(invalid, -np.inf, sims)
            deg_eff = min(degree, pool_width)
            top = np.argpartition(-sims, deg_eff - 1, axis=2)[:, :, :deg_eff]
            top_rows = np.take_along_axis(
                np.broadcast_to(pool[:, None, :], sims.shape), top, axis=2
            )
            top_sims = np.take_along_axis(sims, top, axis=2)
            top_rows[~np.isfinite(top_sims)] = n
            flat_members = members.reshape(-1)
            keep = flat_members < n
            neighbors[flat_members[keep], :deg_eff] = top_rows.reshape(
                -1, deg_eff
            )[keep]

        index = BeamIndex(
            device_data,
            device_data.astype(jnp.bfloat16),
            jnp.asarray(neighbors),
            centroids,
            jnp.asarray(cell_rows),
            n,
            0.0,
        )
        jax.block_until_ready(index.neighbors)
        index.build_seconds = time.perf_counter() - start
        return index

    def entry_points(self, qs: np.ndarray, n_entries: int = 8) -> jax.Array:
        """Entry rows: first member of each query's nearest clusters."""
        cent = self.centroids
        sims = jnp.dot(
            jnp.asarray(qs, jnp.float32), cent.T,
            preferred_element_type=jnp.float32,
        )
        n_entries = min(n_entries, cent.shape[0])
        _, probes = jax.lax.top_k(sims, n_entries)            # [B, E]
        return self.cell_rows[probes, 0].astype(jnp.int32)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        ef: int = 64,
        iters: int = 8,
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries, np.float32)
        norms = np.linalg.norm(queries, axis=1, keepdims=True)
        queries = queries / np.maximum(norms, 1e-9)
        entries = self.entry_points(queries, n_entries=min(8, ef))
        dists, ids = beam_search(
            self.data16, self.data32, self.neighbors, entries,
            jnp.asarray(queries), jnp.int32(self.n),
            k=k, ef=ef, iters=iters,
        )
        return np.asarray(dists), np.asarray(ids, np.int64)

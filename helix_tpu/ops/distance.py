"""MXU-tiled batched distance + top-k.

The exact-search core (and the recall oracle for the ANN index): scores a
query batch against the packed vector matrix with an MXU matmul, scanning
over column chunks with a running top-k merge so the full ``[B, N]`` score
matrix never materializes in HBM (HBM traffic = one pass over the matrix
per query batch).

This replaces the reference engine's CPU HNSW distance evaluations
(HelixDB vector search contract: ``sdks/rust/src/dsl.rs:129-155`` — top-k,
ascending ``$distance``).  Design notes:

- matmul in bfloat16 with float32 accumulation by default on TPU (MXU
  native); ``precision="f32"`` for exact CPU tests
- similarity is maximized internally (cosine: dot of normalized vectors;
  l2: ``-|x-q|^2``); distances returned ascending
- padded/invalid columns are masked to -inf before the merge
- static shapes: ``k`` and chunk size are compile-time constants; the
  chunk scan is a ``lax.scan`` (no dynamic shapes under jit)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_chunk(n: int, target: int) -> int:
    """Largest divisor of ``n`` that is <= target.

    The chunk scan uses ``dynamic_slice`` over row blocks; XLA *clamps*
    out-of-bounds slice starts, so a chunk that does not divide N silently
    re-reads shifted rows under mislabeled column indices.  Chunk sizes
    must therefore divide the (static) row count exactly.
    """
    if n <= target:
        return n
    for c in range(target, 0, -1):
        if n % c == 0:
            return c
    return n


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "metric", "bf16", "rerank")
)
def topk_scores(
    xs: jax.Array,          # [N, D] packed vectors (rows >= n_valid are junk)
    qs: jax.Array,          # [B, D] query batch
    n_valid: jax.Array,     # scalar int32: number of valid rows in xs
    sq_norms: jax.Array,    # [N] squared norms of xs rows (used for l2)
    *,
    k: int,
    chunk: int = 131072,
    metric: str = "cosine",
    bf16: bool = True,
    rerank: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Top-k most-similar rows of ``xs`` for each query.

    Returns ``(neg_similarity_as_distance [B, k], indices [B, k])`` with
    distances ascending.  For cosine, inputs must be pre-normalized and
    distance = 1 - dot; for l2, distance = |x|^2 - 2 x.q + |q|^2.

    With ``bf16``, the full-matrix scan runs on the MXU in bfloat16 (the
    fast path) which shuffles ranks among near-ties (~0.4% relative sim
    error).  The ``rerank`` multiplier fixes this: the scan keeps
    ``rerank*k`` candidates, then a tiny exact float32 pass re-scores just
    those rows and selects the final k (measured on clustered SIFT-shaped
    data: recall@10 0.62 without re-ranking, ~1.0 with).
    """
    n, d = xs.shape
    b = qs.shape[0]
    chunk = pick_chunk(n, min(chunk, n))
    num_chunks = n // chunk
    k_scan = min(max(k, rerank * k if (bf16 and rerank > 1) else k), n)

    if bf16:
        xs_c = xs.astype(jnp.bfloat16)
        qs_c = qs.astype(jnp.bfloat16)
    else:
        xs_c = xs
        qs_c = qs

    col_base = jnp.arange(chunk, dtype=jnp.int32)

    def score_chunk(start):
        block = jax.lax.dynamic_slice_in_dim(xs_c, start, chunk, axis=0)
        sims = jnp.dot(
            qs_c, block.T, preferred_element_type=jnp.float32
        )  # [B, chunk]
        cols = start + col_base
        if metric == "l2":
            sq = jax.lax.dynamic_slice_in_dim(sq_norms, start, chunk, axis=0)
            # similarity = -(|x|^2 - 2 x.q); |q|^2 added at the end.
            sims = 2.0 * sims - sq[None, :]
        valid = cols < n_valid
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
        return sims, cols

    def body(carry, start):
        best_s, best_i = carry
        sims, cols = score_chunk(start)
        if bf16:
            # TPU-optimized partial-reduce top-k over the chunk (exact
            # sort-based top_k over 100k+ columns dominates the scan
            # otherwise); the f32 re-rank below restores exact order.
            s_chunk, i_local = jax.lax.approx_max_k(
                sims, k_scan, recall_target=0.99
            )
        else:
            s_chunk, i_local = jax.lax.top_k(sims, k_scan)
        i_chunk = cols[i_local]
        cat_s = jnp.concatenate([best_s, s_chunk], axis=1)
        cat_i = jnp.concatenate([best_i, i_chunk], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k_scan)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((b, k_scan), -jnp.inf, jnp.float32),
        jnp.zeros((b, k_scan), jnp.int32),
    )
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (best_s, best_i), _ = jax.lax.scan(body, init, starts)

    if k_scan > k:
        # Exact float32 re-rank of the candidate set: [B, k_scan, D] gather
        # + einsum — negligible next to the full scan.
        cand = jnp.take(xs, best_i, axis=0)              # [B, k_scan, D]
        qs32 = qs.astype(jnp.float32)
        exact = jnp.einsum(
            "bkd,bd->bk", cand.astype(jnp.float32), qs32,
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            cand_sq = jnp.take(sq_norms, best_i, axis=0)
            exact = 2.0 * exact - cand_sq
        exact = jnp.where(jnp.isfinite(best_s), exact, -jnp.inf)
        best_s, pos = jax.lax.top_k(exact, k)
        best_i = jnp.take_along_axis(best_i, pos, axis=1)

    if metric == "cosine":
        dists = 1.0 - best_s
    else:
        q_sq = jnp.sum(qs.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        dists = -best_s + q_sq
    return dists, best_i


class PackedMatrix:
    """Host-managed packed vector matrix with a cached device copy.

    Rows are appended host-side (amortized growth); the device copy is
    refreshed only when stale (epoch check) so repeated searches never
    re-upload.  Rows are padded to MXU-friendly multiples.
    """

    ROW_PAD = 512
    DIM_PAD = 128

    def __init__(self, dim: int, metric: str = "cosine"):
        self.dim = dim
        self.metric = metric
        self.dim_pad = _round_up(max(dim, 1), self.DIM_PAD)
        self.capacity = self.ROW_PAD
        self.data = np.zeros((self.capacity, self.dim_pad), np.float32)
        self.sq_norms = np.zeros(self.capacity, np.float32)
        self.n = 0
        self.version = 0
        self._device: tuple[int, jax.Array, jax.Array] | None = None

    def append(self, vec: np.ndarray) -> int:
        if self.n == self.capacity:
            self.capacity *= 2
            grown = np.zeros((self.capacity, self.dim_pad), np.float32)
            grown[: self.n] = self.data[: self.n]
            self.data = grown
            sq = np.zeros(self.capacity, np.float32)
            sq[: self.n] = self.sq_norms[: self.n]
            self.sq_norms = sq
        row = np.zeros(self.dim_pad, np.float32)
        row[: self.dim] = vec
        if self.metric == "cosine":
            norm = float(np.linalg.norm(row))
            if norm > 0:
                row /= norm
        self.data[self.n] = row
        self.sq_norms[self.n] = float(np.dot(row, row))
        pos = self.n
        self.n += 1
        self.version += 1
        return pos

    def overwrite(self, pos: int, vec: np.ndarray | None) -> None:
        """Replace a row (None zeroes it; paired with external tombstoning)."""
        row = np.zeros(self.dim_pad, np.float32)
        if vec is not None:
            row[: self.dim] = vec
            if self.metric == "cosine":
                norm = float(np.linalg.norm(row))
                if norm > 0:
                    row /= norm
        self.data[pos] = row
        self.sq_norms[pos] = float(np.dot(row, row))
        self.version += 1

    def device_arrays(self) -> tuple[jax.Array, jax.Array]:
        n_rows = _round_up(max(self.n, 1), self.ROW_PAD)
        cached = self._device
        if cached is not None and cached[0] == self.version:
            return cached[1], cached[2]
        xs = jnp.asarray(self.data[:n_rows])
        sq = jnp.asarray(self.sq_norms[:n_rows])
        self._device = (self.version, xs, sq)
        return xs, sq

    def prepare_query(self, q: np.ndarray) -> np.ndarray:
        out = np.zeros(self.dim_pad, np.float32)
        out[: self.dim] = q
        if self.metric == "cosine":
            norm = float(np.linalg.norm(out))
            if norm > 0:
                out /= norm
        return out


def search_packed(
    matrix: PackedMatrix,
    queries: np.ndarray,      # [B, dim] raw queries
    k: int,
    valid_mask: np.ndarray | None = None,   # [n] bool over live rows
    *,
    use_device: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k over a packed matrix.

    Returns ``(dists [B, k'], positions [B, k'])`` with ``k' <= k`` columns,
    distances ascending; invalid rows excluded.  Small partitions run
    host-side (device round-trip would dominate); large ones run the
    jitted chunked kernel.
    """
    if matrix.n == 0:
        b = queries.shape[0]
        return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int64)
    qs = np.stack([matrix.prepare_query(q) for q in queries])
    n_live = (
        int(valid_mask[: matrix.n].sum()) if valid_mask is not None else matrix.n
    )
    k_eff = min(k, n_live)
    if k_eff == 0:
        b = queries.shape[0]
        return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int64)

    if use_device is None:
        use_device = matrix.n >= 4096
    if not use_device:
        data = matrix.data[: matrix.n]
        if matrix.metric == "cosine":
            sims = qs @ data.T
            dists = 1.0 - sims
        else:
            dists = (
                matrix.sq_norms[: matrix.n][None, :]
                - 2.0 * (qs @ data.T)
                + np.sum(qs * qs, axis=1, keepdims=True)
            )
        if valid_mask is not None:
            dists = np.where(valid_mask[: matrix.n][None, :], dists, np.inf)
        part = np.argpartition(dists, k_eff - 1, axis=1)[:, :k_eff]
        part_d = np.take_along_axis(dists, part, axis=1)
        order = np.argsort(part_d, axis=1, kind="stable")
        idx = np.take_along_axis(part, order, axis=1)
        return np.take_along_axis(dists, idx, axis=1).astype(np.float32), idx.astype(np.int64)

    xs, sq = matrix.device_arrays()
    n_valid = matrix.n
    if valid_mask is not None and valid_mask[: matrix.n].sum() < matrix.n:
        # Tombstoned rows: zeroed rows score poorly for cosine but must be
        # hard-masked; push them out by overwriting sq_norm/no — instead we
        # post-filter by requesting extra candidates.
        extra = int(matrix.n - valid_mask[: matrix.n].sum())
        k_query = min(matrix.n, k_eff + extra)
    else:
        k_query = k_eff
    dists, idx = topk_scores(
        xs,
        jnp.asarray(qs),
        jnp.int32(n_valid),
        sq,
        k=int(k_query),
        metric=matrix.metric,
        bf16=jax.default_backend() == "tpu",
    )
    dists = np.asarray(dists)
    idx = np.asarray(idx, np.int64)
    if valid_mask is not None:
        out_d = np.full((dists.shape[0], k_eff), np.inf, np.float32)
        out_i = np.zeros((dists.shape[0], k_eff), np.int64)
        for row in range(dists.shape[0]):
            cols = [j for j in range(idx.shape[1]) if valid_mask[idx[row, j]]][:k_eff]
            out_d[row, : len(cols)] = dists[row, cols]
            out_i[row, : len(cols)] = idx[row, cols]
        return out_d, out_i
    return dists[:, :k_eff], idx[:, :k_eff]

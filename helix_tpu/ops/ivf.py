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
    # Pad rows to a chunk multiple instead of hunting for a divisor of
    # n: a prime-ish n would otherwise degenerate the chunk to 1 and
    # turn the scan into n single-row matmuls.  Padded rows are
    # all-zero; their count weight is zero so they never move a
    # centroid.
    chunk = min(chunk, n)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        data = jnp.concatenate(
            [data, jnp.zeros((n_pad - n, d), data.dtype)]
        )
    weights = (jnp.arange(n_pad) < n).astype(jnp.float32)[:, None]
    data16 = data.astype(jnp.bfloat16)
    starts = jnp.arange(n_pad // chunk, dtype=jnp.int32) * chunk

    def assign_all(centroids):
        c16 = centroids.astype(jnp.bfloat16)

        def body(_, start):
            block = jax.lax.dynamic_slice_in_dim(data16, start, chunk, axis=0)
            sims = jnp.dot(block, c16.T, preferred_element_type=jnp.float32)
            return None, jnp.argmax(sims, axis=1).astype(jnp.int32)

        _, parts = jax.lax.scan(body, None, starts)
        return parts.reshape(n_pad)

    def step(centroids, _):
        assign = assign_all(centroids)
        sums = jax.ops.segment_sum(data, assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(
            weights, assign, num_segments=n_clusters
        )
        fresh = sums / jnp.maximum(counts, 1.0)
        # Keep empty cells at their previous position.
        fresh = jnp.where(counts > 0, fresh, centroids)
        norms = jnp.linalg.norm(fresh, axis=1, keepdims=True)
        fresh = fresh / jnp.maximum(norms, 1e-9)
        return fresh, None

    centroids, _ = jax.lax.scan(step, init, None, length=iters)
    return centroids, assign_all(centroids)[:n]


@jax.jit
def _assign_rows(x, c):
    """Nearest-centroid assignment for one row chunk (build path)."""
    return jnp.argmax(
        jnp.einsum("nd,cd->nc", x, c, preferred_element_type=jnp.float32),
        axis=1,
    )


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
    # HIGHEST precision: the TPU default truncates f32 matmuls to bf16,
    # which shuffles near-tie ranks (score_block pays f32 for the same
    # reason — measured recall 0.953 -> ~1.0)
    sims = jnp.einsum(
        "bmd,bd->bm", vectors, qs, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sims = jnp.where(valid, sims, -jnp.inf)
    best_s, pos = jax.lax.top_k(sims, min(k, sims.shape[1]))
    best_rows = jnp.take_along_axis(cand, pos, axis=1)
    # rows selected from padding (fewer than k valid candidates in the
    # probed cells) carry the sentinel index n — emit -1 so callers can
    # strip them instead of indexing out of bounds
    best_rows = jnp.where(jnp.isfinite(best_s), best_rows, -1)
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
        # -1 marks short rows (< k candidates in the probed cells);
        # keep the sentinel through the id mapping for callers to strip
        valid = rows_h >= 0
        mapped = np.where(
            valid, self.row_to_original[np.where(valid, rows_h, 0)], -1
        )
        return np.asarray(dists), mapped


@functools.partial(jax.jit, static_argnames=("nprobe",))
def probe_cells(
    centroids: jax.Array,     # [C, D]
    qs: jax.Array,            # [B, D] normalized queries
    *,
    nprobe: int,
) -> jax.Array:
    """Top-``nprobe`` coarse cells per query: one [B, C] matmul."""
    sims = jnp.einsum(
        "cd,bd->bc", centroids, qs, preferred_element_type=jnp.float32
    )
    _, cells = jax.lax.top_k(sims, nprobe)
    return cells


@functools.partial(jax.jit, static_argnames=("k",))
def score_block(
    block: jax.Array,         # [M, D] candidate rows (union of probed cells)
    qs: jax.Array,            # [B, D]
    n_valid: jax.Array,       # scalar: valid rows in block
    *,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact cosine top-k of the query batch against a streamed block."""
    # HIGHEST precision: the candidate set is small relative to the
    # corpus, so paying f32 MXU passes here buys back the recall that
    # bf16 rank-shuffles near ties would cost (measured: 0.953 -> ~1.0)
    sims = jnp.einsum(
        "md,bd->bm", block, qs,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cols = jnp.arange(block.shape[0], dtype=jnp.int32)
    sims = jnp.where((cols < n_valid)[None, :], sims, -jnp.inf)
    best_s, pos = jax.lax.top_k(sims, k)
    return 1.0 - best_s, pos


class ProbeRouter:
    """Measured per-unit-cost routing between the two scoring paths of
    the beyond-HBM tier (same philosophy as the engine's
    ``TraversalRouter``: route on measurement, not backend identity).

    - **device** (union-stream): cost scales with the H2D bytes of the
      probed-cell union — the right path when the chip is colocated
      (PCIe/HBM-rate streaming) and batches are dense.
    - **host** (probed re-rank): cost scales with per-query candidate
      incidences — the right path when the link is thin (this dev
      tunnel moves ~25 MB/s) or probe lists barely overlap.

    The router keeps an EWMA of each path's measured cost *per unit of
    its own work* (seconds per union row / per incidence), predicts
    both costs for the batch at hand, and picks the cheaper; every
    64th decision re-samples the loser so a stale estimate can flip
    the route back.  ``HELIX_IVF_BACKEND=device|host`` forces a path.
    """

    EXPLORE_EVERY = 64
    ALPHA = 0.3

    def __init__(self):
        self.rate: dict[str, float] = {}   # seconds per work unit
        self.runs: dict[str, int] = {"device": 0, "host": 0}
        self.decisions = 0

    def choose(self, device_units: float, host_units: float) -> str:
        import os

        mode = os.environ.get("HELIX_IVF_BACKEND", "auto")
        if mode in ("device", "host"):
            return mode
        for path in ("host", "device"):  # bootstrap: one sample each
            if path not in self.rate:
                return path
        self.decisions += 1
        pred = {
            "device": self.rate["device"] * max(device_units, 1.0),
            "host": self.rate["host"] * max(host_units, 1.0),
        }
        best = min(pred, key=pred.get)
        if self.decisions % self.EXPLORE_EVERY == 0:
            worst = max(pred, key=pred.get)
            if worst != best:
                return worst
        return best

    def record(self, path: str, elapsed_s: float, units: float) -> None:
        self.runs[path] = self.runs.get(path, 0) + 1
        if self.runs[path] == 1 and path == "device":
            return  # warm-up: XLA compile dominates the first run
        per_unit = elapsed_s / max(units, 1.0)
        prev = self.rate.get(path)
        self.rate[path] = (
            per_unit if prev is None
            else prev + self.ALPHA * (per_unit - prev)
        )


class HostIVFIndex:
    """Beyond-HBM IVF tier: the packed corpus stays in HOST memory;
    the device holds only the coarse centroids.

    Per search batch: (1) one device matmul probes the ``nprobe``
    nearest cells per query; (2) scoring routes by measured cost
    (``ProbeRouter``) between two paths:

    - **union-stream (device)**: the host gathers the UNION of probed
      cells into one contiguous block (cells are contiguous after the
      build's counting sort, so this is range concatenation, not
      scatter-gather); the block streams H2D once and every query
      exact-scans it on the MXU.  Scoring the union instead of
      per-query probe lists only ADDS candidates, so recall is >=
      classical IVF at the same nprobe.
    - **probed re-rank (host)**: classical IVF — each query scores only
      its own probed cells' rows, through the native row-sorted
      re-rank kernel (``native/rerank.cpp``).  ~1000x fewer FLOPs than
      the union scan at typical batch diversity and zero H2D, so it
      wins whenever the host<->device link is the bottleneck.

    Build scales past HBM too: k-means fits on a device-resident SAMPLE
    (``sample_cap`` rows), then assignment streams the full corpus
    through the device in chunks.

    Reference knob mapping (helix-cli/src/config.rs:191-201):
    ``ef_search`` ~ nprobe, ``ef_construction`` ~ k-means iterations.
    """

    #: cap on bytes of candidate block resident in HBM per streamed
    #: chunk — the union can exceed device memory at the corpus scales
    #: this tier exists for
    STREAM_BYTES = 1 << 30

    def __init__(
        self,
        packed: np.ndarray,            # [N, D] host, cell-sorted, normalized
        centroids: jax.Array,          # [C, D] device
        indptr: np.ndarray,            # [C+1] cell boundaries in packed
        row_to_original: np.ndarray,   # packed row -> original row
        build_seconds: float,
    ):
        self.packed = packed
        self.centroids = centroids
        self.indptr = indptr
        self.row_to_original = row_to_original
        self.build_seconds = build_seconds
        self.n = len(packed)
        # observability (advertised cost model): defined from birth and
        # refreshed per search, including early-return empty searches
        self.last_block_rows = 0
        self.last_streamed_bytes = 0
        self.last_path = None
        self.router = ProbeRouter()
        # cosine-only tier: the re-rank kernel never reads sq_norms
        self._sq_unused = np.zeros(1, np.float32)

    @staticmethod
    def build(
        data: np.ndarray,
        n_clusters: int | None = None,
        iters: int = 8,
        seed: int = 0,
        normalize: bool = True,
        sample_cap: int = 2_000_000,
        assign_chunk: int = 1_000_000,
    ) -> "HostIVFIndex":
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

        # fit on a device-resident sample; the full corpus never needs
        # to be HBM-resident at once
        sample = (
            data if n <= sample_cap
            else data[rng.choice(n, sample_cap, replace=False)]
        )
        init = sample[rng.choice(len(sample), n_clusters, replace=False)]
        centroids, _ = kmeans_fit(
            jnp.asarray(sample), jnp.asarray(init),
            n_clusters=n_clusters, iters=iters,
        )

        # streamed assignment of every row.  The sims block is
        # [chunk, C] f32 device-resident — at 10M rows C ~ 12.6k, so a
        # fixed 1M-row chunk would need ~50 GB of HBM; bound the block
        # to ~512 MB instead (chunk scales inversely with cluster count)
        assign_chunk = min(
            assign_chunk, max(8192, (512 << 20) // (n_clusters * 4))
        )
        assign = _assign_rows  # module-level jit: compiles once per shape
        assign_h = np.empty(n, np.int32)
        for lo in range(0, n, assign_chunk):
            hi = min(n, lo + assign_chunk)
            block = data[lo:hi]
            if hi - lo < assign_chunk:  # pad: one compiled shape total
                block = np.concatenate(
                    [block, np.zeros((assign_chunk - (hi - lo), block.shape[1]),
                                     np.float32)]
                )
            assign_h[lo:hi] = np.asarray(assign(block, centroids))[: hi - lo]

        order = np.argsort(assign_h, kind="stable")
        packed = np.ascontiguousarray(data[order])
        counts = np.bincount(assign_h, minlength=n_clusters)
        indptr = np.concatenate(([0], np.cumsum(counts)))
        index = HostIVFIndex(
            packed, centroids, indptr, order,
            time.perf_counter() - start,
        )
        return index

    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int = 32,
        normalize: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (distances [B,k'], original row indices [B,k'])."""
        queries = np.asarray(queries, np.float32)
        if normalize:
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-9)
        nprobe = min(nprobe, int(self.centroids.shape[0]))
        qs_dev = jnp.asarray(queries)
        cells = np.asarray(probe_cells(self.centroids, qs_dev, nprobe=nprobe))

        # union of probed cells -> contiguous ranges in packed
        probed = np.unique(cells)
        starts = self.indptr[probed]
        ends = self.indptr[probed + 1]
        total = int((ends - starts).sum())
        if total == 0:
            b = len(queries)
            self.last_path = "empty"   # neither scorer ran (contract:
            self.last_block_rows = 0   # fields refresh EVERY search)
            self.last_streamed_bytes = 0
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int64)

        # per-query incidence count (the host path's work unit)
        q_counts = (self.indptr[cells + 1] - self.indptr[cells]).sum(axis=1)
        incidences = int(q_counts.sum())
        import time as _time

        path = self.router.choose(
            device_units=float(total), host_units=float(incidences)
        )
        t0 = _time.perf_counter()
        if path == "host":
            out = self._search_probed_host(
                queries, min(k, total), cells, q_counts
            )
            self.router.record("host", _time.perf_counter() - t0, incidences)
            self.last_path = "host"
            self.last_block_rows = 0
            self.last_streamed_bytes = 0
            return out
        out = self._search_union_device(
            qs_dev, k, starts, ends, total
        )
        self.router.record("device", _time.perf_counter() - t0, total)
        self.last_path = "device"
        return out

    def _search_probed_host(
        self, queries: np.ndarray, k_eff: int, cells: np.ndarray,
        q_counts: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Classical per-query probed IVF through the native row-sorted
        re-rank kernel: zero H2D, FLOPs bounded by the probe lists."""
        from ..native import rerank as native_rerank

        b = len(queries)
        kc = max(1, int(q_counts.max()))
        cand = np.full((b, kc), -1, np.int64)
        starts = self.indptr[cells]
        ends = self.indptr[cells + 1]
        # Vectorized ragged fill: each (query, probed cell) run writes
        # arange(start, end) at its running column offset.  The former
        # B x nprobe Python loop ran ~32k interpreted iterations per
        # B=1024 batch BEFORE the native kernel — inflating exactly the
        # host-path latency the ProbeRouter routes on.
        lens = ends - starts                       # [B, nprobe]
        col_off = np.cumsum(lens, axis=1) - lens   # run -> first column
        flat_lens = lens.ravel()
        nz = flat_lens > 0
        reps = flat_lens[nz]
        if len(reps):
            run_rows = np.repeat(
                np.arange(b, dtype=np.int64), lens.shape[1]
            )[nz]
            run_cols = col_off.ravel()[nz]
            run_starts = starts.ravel()[nz]
            within = (
                np.arange(int(reps.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(reps) - reps, reps)
            )
            cand[
                np.repeat(run_rows, reps), np.repeat(run_cols, reps) + within
            ] = np.repeat(run_starts, reps) + within
        dists, rows = native_rerank(
            self.packed, self._sq_unused, queries, cand, k_eff, "cosine"
        )
        valid = rows >= 0
        mapped = np.where(
            valid, self.row_to_original[np.where(valid, rows, 0)], -1
        )
        return dists, mapped

    def _search_union_device(
        self, qs_dev, k: int,
        starts: np.ndarray, ends: np.ndarray, total: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        block = np.concatenate(
            [self.packed[s:e] for s, e in zip(starts, ends)]
        )
        block_rows = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts, ends)]
        )
        # observability: bytes the last search streamed through HBM
        # (the tier's cost model is data movement, not FLOPs)
        self.last_block_rows = total
        self.last_streamed_bytes = int(total * block.shape[1] * 4)
        k_eff = min(k, total)
        dim = block.shape[1]
        # Stream the union through HBM in bounded chunks (the whole
        # point of the tier is that the candidate set can exceed device
        # memory); per-chunk top-k on device, cross-chunk merge on host.
        stream_rows = max(1 << 16, self.STREAM_BYTES // (4 * dim))
        if total <= stream_rows:
            spans = [(0, total)]
        else:
            spans = [
                (lo, min(total, lo + stream_rows))
                for lo in range(0, total, stream_rows)
            ]
        parts_d, parts_i = [], []
        for lo, hi in spans:
            piece = block[lo:hi]
            m = hi - lo
            m_pad = 1 << max(10, (m - 1).bit_length())
            if m_pad > m:
                piece = np.concatenate(
                    [piece, np.zeros((m_pad - m, dim), np.float32)]
                )
            dists, pos = score_block(
                jnp.asarray(piece), qs_dev, jnp.int32(m), k=min(k_eff, m)
            )
            parts_d.append(np.asarray(dists))
            # positions from the -inf padding (short chunks) clamp into
            # range; their inf distance marks them for downstream strip
            pos_h = np.minimum(np.asarray(pos), m - 1)
            parts_i.append(block_rows[pos_h + lo])
        if len(parts_d) == 1:
            dists_h, rows_h = parts_d[0], parts_i[0]
        else:
            merged_d = np.concatenate(parts_d, axis=1)
            merged_i = np.concatenate(parts_i, axis=1)
            order = np.argsort(merged_d, axis=1, kind="stable")[:, :k_eff]
            dists_h = np.take_along_axis(merged_d, order, axis=1)
            rows_h = np.take_along_axis(merged_i, order, axis=1)
        return dists_h, self.row_to_original[rows_h]

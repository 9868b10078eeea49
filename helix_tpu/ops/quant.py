"""int8 quantized residency tier: 6x more vectors per chip.

The exact serving tier keeps bf16+f32 copies resident (6 bytes/dim);
past the HBM budget the only option used to be the host-IVF streamed
tier — a ~90x QPS cliff (BENCH_NOTES round 2).  This tier sits between
them (reference capacity envelope: ``db_max_size_gb=20``,
``helix-cli/src/config.rs:203-205``):

- Cosine rows (unit-norm at ingest) quantize to **int8 with one global
  scale** (``rint(127 x)`` is always in range): 1 byte/dim resident —
  6x the exact tier's capacity.  l2 rows keep per-row symmetric scales
  (their norms vary, so a global scale would starve small-norm rows).
- The coarse phase is an **int8 x int8 MXU matmul** (``dot_general``
  with ``preferred_element_type=int32`` — the MXU runs int8 at 2x bf16
  throughput), then ``approx_max_k``.  With a global scale the raw
  integer dots already rank correctly per query; de-scaling moves to
  the tiny ``[B, k]`` output.
- Candidates re-rank **exactly in f32 against the host-resident
  matrix** (the same native C++ re-rank the sharded tier uses), so
  quantization noise only has to keep the true top-k inside the
  candidate set, not rank it.

Global vs per-row scales is a measured trade (benchmarks/i8_sweep.py,
1M x 128 / batch 256 on a v5e): per-row scales sharpen the flattest
rows (containment 0.9957 vs 0.9926 at pool 80) but feeding them to the
fused kernel costs a ``[tile_rows, 1]`` f32 operand that Mosaic
lane-pads to 128 — 4 MB of VMEM per 8192-row tile buffer, measured as
~0.64 ms/batch of the epilogue (``ep_astype`` 307k QPS vs ``dot_i8``
1,306k with the only difference being that operand).  Dropping the
operand entirely (global scale) serves 568k QPS vs 276k; the exact
re-rank plus the auto-laddered candidate pool absorb the containment
difference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_queries(qs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side symmetric per-query int8: ``(q_i8, scales)``."""
    q_peak = jnp.max(jnp.abs(qs), axis=1)
    q_scales = jnp.where(q_peak > 0, q_peak / 127.0, 1.0)
    q_i8 = jnp.clip(
        jnp.round(qs / q_scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return q_i8, q_scales


def quantize_rows(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8: ``(values int8 [N, D], scales f32 [N])``.
    Zero rows get scale 1 (values all zero)."""
    peak = np.abs(rows).max(axis=1)
    scales = np.where(peak > 0, peak / 127.0, 1.0).astype(np.float32)
    values = np.clip(
        np.rint(rows / scales[:, None]), -127, 127
    ).astype(np.int8)
    return values, scales


# One quantization step for unit-norm rows: every |x| <= 1, so
# ``rint(127 x)`` is always a valid int8 and the de-scale is this
# single constant (see the module docstring for the measured
# global-vs-per-row trade).
GLOBAL_SCALE = np.float32(1.0 / 127.0)


def quantize_rows_unit(rows: np.ndarray) -> np.ndarray:
    """Global-scale symmetric int8 for unit-norm (cosine) rows.
    De-scale with :data:`GLOBAL_SCALE`."""
    return np.clip(np.rint(rows * 127.0), -127, 127).astype(np.int8)


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def int8_coarse_topk(
    xs_i8: jax.Array,       # [N, D] int8 resident matrix
    x_scales: jax.Array,    # [N] f32 per-row scales
    qs: jax.Array,          # [B, D] f32 query batch (rows padded like xs)
    n_valid: jax.Array,     # scalar int32
    sq_norms: jax.Array,    # [N] f32 squared norms (l2 only)
    *,
    k: int,
    metric: str = "cosine",
) -> tuple[jax.Array, jax.Array]:
    """Quantized coarse phase: (approx similarities [B, k], indices).

    Queries quantize on device with per-query symmetric scales; the
    integer dot de-scales to f32 similarity ``~ q . x`` (l2 uses the
    standard ``2 q.x - |x|^2`` ordering surrogate).
    """
    n = xs_i8.shape[0]
    q_i8, q_scales = _quantize_queries(qs)
    dots = jax.lax.dot_general(
        q_i8, xs_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                   # [B, N]
    sims = (
        dots.astype(jnp.float32)
        * q_scales[:, None]
        * x_scales[None, :]
    )
    if metric == "l2":
        sims = 2.0 * sims - sq_norms[None, :]
    cols = jnp.arange(n, dtype=jnp.int32)
    sims = jnp.where((cols < n_valid)[None, :], sims, -jnp.inf)
    return jax.lax.approx_max_k(sims, k, recall_target=0.99)


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def device_rerank_topk(
    xs16: jax.Array,        # [N16, D] f16 resident rows (re-rank operand)
    sq_norms: jax.Array,    # [N16] f32 squared norms (l2 only)
    qs: jax.Array,          # [B, D] f32 query batch
    cand: jax.Array,        # [B, Kc] int32 coarse candidates (junk allowed)
    live: jax.Array,        # [N16] uint8 device live mask (1 = live)
    n_valid: jax.Array,     # scalar int32
    *,
    k: int,
    metric: str = "cosine",
) -> tuple[jax.Array, jax.Array]:
    """On-device re-rank of coarse candidates against a 2-byte row copy.

    The quantized rungs' default re-rank round-trips candidates to the
    host-resident f32 matrix — exact, but host-memory-bandwidth-bound
    (the int8 rung serves 14k QPS against an 85k-QPS coarse phase,
    LADDER_r04).  When HBM has room for a 2-byte/dim half-precision
    copy next to the int8 codes (3 B/dim total vs the exact tier's 6),
    the re-rank gathers and re-scores entirely on device: candidates
    flow coarse → re-rank as device arrays with no host round-trip, and
    the only D2H is the final ``[B, k]`` result.

    The copy is **float16, not bfloat16**: the re-rank is a tiny
    VPU-side gather+dot where MXU-friendliness doesn't matter, so the
    extra 3 mantissa bits are free — measured recall@10 0.996 vs 0.973
    for bf16 on the clustered ladder corpus (bf16's 2^-8 rounding swaps
    near-ties), i.e. f16 restores the coarse phase's full containment.
    Accumulation is f32; distance error is ~|x| * 2^-11, and reported
    ``$distance`` carries that rounding, unlike the host re-rank's
    exact f32 (documented in SERVING.md).

    Returns ``(dists [B, min(k, Kc)], positions)`` ascending with the
    Partition sentinel contract (+inf / -1) for dead or out-of-range
    candidates.
    """
    n16 = xs16.shape[0]
    safe = jnp.clip(cand, 0, n16 - 1)
    rows = jnp.take(xs16, safe, axis=0).astype(jnp.float32)  # [B, Kc, D]
    sims = jnp.einsum(
        "bkd,bd->bk", rows, qs, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        sims = 2.0 * sims - jnp.take(sq_norms, safe, axis=0)
    ok = (
        (cand >= 0)
        & (cand < n_valid)
        & (jnp.take(live, safe, axis=0) != 0)
    )
    sims = jnp.where(ok, sims, -jnp.inf)
    k_eff = min(k, cand.shape[1])
    best_s, pos = jax.lax.top_k(sims, k_eff)
    best_i = jnp.take_along_axis(cand, pos, axis=1)
    good = best_s > -jnp.inf
    best_i = jnp.where(good, best_i, -1)
    if metric == "cosine":
        dists = 1.0 - best_s
    else:
        q_sq = jnp.sum(qs * qs, axis=1, keepdims=True)
        dists = -best_s + q_sq
    dists = jnp.where(good, dists, jnp.inf)
    return dists, best_i


class QuantizedResident:
    """Device-resident int8 copy of a packed matrix, refreshed by
    version (same scheme as PackedMatrix's bf16 cache)."""

    def __init__(self):
        # (version, xs_i8, scales, sq_dev) — sq_dev is the device copy
        # of the squared norms (l2 de-scale operand); caching it here
        # keeps the serving hot path free of per-query H2D transfers
        # (~40 MB/query-batch at 10M rows before this).
        self._cached: tuple | None = None
        # (matrix version, live count, device uint8 mask) — every
        # liveness change goes through PackedMatrix.append/overwrite,
        # both of which bump the version, so version-keying is sound;
        # the live count rides along as cheap defense in depth.
        self._live_dev: tuple | None = None
        # (version, xs_f16, sq_dev) — the 2-byte/dim device re-rank
        # copy (float16; see device_rerank_topk for why not bf16)
        self._rr16: tuple | None = None

    def arrays(self, matrix) -> tuple[jax.Array, jax.Array, jax.Array]:
        from .distance import _round_up

        cached = self._cached
        if cached is not None and cached[0] == matrix.version:
            return cached[1], cached[2], cached[3]
        n_rows = _round_up(max(matrix.n, 1), matrix.ROW_PAD)
        if self._use_fused(matrix):
            from .fused_topk import pad_rows_for_fused

            n_rows = pad_rows_for_fused(matrix.n)
        rows = matrix.data[:n_rows]
        if n_rows > len(matrix.data):
            padded = np.zeros((n_rows, matrix.data.shape[1]), np.float32)
            padded[: matrix.n] = matrix.data[: matrix.n]
            rows = padded
        if matrix.metric == "cosine":
            # unit-norm rows: one global scale (module docstring); the
            # uniform array keeps the XLA path's [N] signature
            values = quantize_rows_unit(rows)
            scales = np.full(n_rows, GLOBAL_SCALE, np.float32)
        else:
            values, scales = quantize_rows(rows)
        from .distance import PackedMatrix

        xs_i8 = PackedMatrix._upload(values)  # chunked H2D (see _upload)
        sc = jnp.asarray(scales)
        if matrix.metric == "l2":
            sq = np.zeros(n_rows, np.float32)
            sq[: matrix.n] = matrix.sq_norms[: matrix.n]
            sq_dev = jnp.asarray(sq)
        else:
            # cosine never reads the operand; a 1-element dummy keeps
            # the jit signature satisfied without an N-sized upload
            sq_dev = jnp.zeros((1,), jnp.float32)
        xs_i8.block_until_ready()
        self._cached = (matrix.version, xs_i8, sc, sq_dev)
        return xs_i8, sc, sq_dev

    @staticmethod
    def _use_fused(matrix) -> bool:
        from .fused_topk import TILE

        return (
            jax.default_backend() == "tpu"
            and matrix.metric == "cosine"
            and matrix.n >= TILE
            # row tile must stay within the VMEM budget at this width
            and _I8_MAX_TILE_BYTES // matrix.data.shape[1] >= 512
        )

    def rerank_arrays(self, matrix) -> tuple[jax.Array, jax.Array]:
        """(f16 row copy, f32 squared norms) for the device re-rank,
        version-keyed like the int8 arrays."""
        from .distance import PackedMatrix, _round_up

        cached = self._rr16
        if cached is not None and cached[0] == matrix.version:
            return cached[1], cached[2]
        n_rows = _round_up(max(matrix.n, 1), matrix.ROW_PAD)
        # host-side cast first: halves the H2D bytes vs uploading f32
        xs16 = PackedMatrix._upload(
            matrix._rows_view(matrix.data, n_rows).astype(np.float16)
        )
        if matrix.metric == "l2":
            sq = jnp.asarray(matrix._rows_view(matrix.sq_norms, n_rows))
        else:
            # cosine never reads the operand: a 1-element dummy avoids
            # an N x 4-byte upload + HBM residency (40 MB at 10M rows)
            sq = jnp.zeros((1,), jnp.float32)
        xs16.block_until_ready()
        self._rr16 = (matrix.version, xs16, sq)
        return xs16, sq

    def _live_device(self, matrix, live_mask: np.ndarray, n_rows: int):
        """Device uint8 live mask padded to ``n_rows`` (padding dead)."""
        n_live = int(live_mask.sum())
        cached = self._live_dev
        if (
            cached is not None
            and cached[0] == matrix.version
            and cached[1] == n_live
            and cached[2].shape[0] >= n_rows
        ):
            return cached[2]
        mask = np.zeros(n_rows, np.uint8)
        mask[: len(live_mask)] = live_mask
        dev = jnp.asarray(mask)
        self._live_dev = (matrix.version, n_live, dev)
        return dev

    def search(
        self, matrix, queries: np.ndarray, k: int, live_mask: np.ndarray,
        metric: str, k_cand_floor: int | None = None,
        rerank_device: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Coarse int8 top-k + exact f32 re-rank (host or device).

        Returns (distances [B, k], positions) ascending, tombstones
        dropped via the re-rank's sentinel path.  ``k_cand_floor``
        (the ef_search analog) widens the re-ranked candidate pool.
        ``rerank_device`` re-scores against an f16 device row copy
        instead of the host f32 matrix (see :func:`device_rerank_topk`)
        — 3 B/dim resident, no host round-trip.
        """
        n = matrix.n
        xs_i8, scales, sq_dev = self.arrays(matrix)
        qs = matrix.prepare_queries(queries)
        k_cand = min(max(8 * k, 64, k_cand_floor or 0), n)
        from .fused_topk import BUCKET as _BUCKET, TILE as _TILE

        # Coarse-phase routing, measured (benchmarks/i8_sweep.py,
        # 1M x 128 / batch 256 on a v5e): the scale-free fused kernel
        # serves 568k QPS coarse vs the XLA matmul + approx_max_k
        # path's 229k — and unlike the XLA path its HBM traffic stays
        # at the 1-byte/dim matrix read instead of a [B, N] f32 score
        # buffer (10 GB at 10M rows x 256 queries), so it wins at every
        # scale.  (Round-5 history: with per-row scale operands the
        # fused kernel measured 150-276k and the routing preferred
        # single-shot under the score-buffer budget; the module
        # docstring has the operand-layout decomposition.)
        #
        # The fused kernel yields one candidate per 64-row bucket; when
        # that cannot supply the requested pool (small corpus or a wide
        # k_cand_floor), the XLA path serves the full pool instead of
        # silently shrinking it below the recall target.
        if (
            self._use_fused(matrix)
            and xs_i8.shape[0] % _TILE == 0
            and k_cand <= xs_i8.shape[0] // _BUCKET
        ):
            _, cand = int8_fused_coarse(
                xs_i8, jnp.asarray(qs), jnp.int32(n), k=k_cand
            )
        else:
            _, cand = int8_coarse_topk(
                xs_i8, scales, jnp.asarray(qs), jnp.int32(n),
                sq_dev, k=k_cand, metric=metric,
            )
        if rerank_device:
            xs16, sq16 = self.rerank_arrays(matrix)
            live = self._live_device(matrix, live_mask, int(xs16.shape[0]))
            dists, pos = device_rerank_topk(
                xs16, sq16, jnp.asarray(qs), cand.astype(jnp.int32),
                live, jnp.int32(n), k=k, metric=metric,
            )
            return np.asarray(dists), np.asarray(pos, np.int64)
        from ..native import rerank as native_rerank

        cand = np.asarray(cand, np.int64)
        cand = np.where(
            (cand < n) & live_mask[np.clip(cand, 0, n - 1)], cand, -1
        )
        return native_rerank(
            matrix.data[:n], matrix.sq_norms[:n], qs, cand, k, metric
        )


class ShardedInt8Search:
    """Multi-chip int8 coarse phase: rows shard across the mesh, each
    device runs the int8 MXU matmul over its slice, and an ICI
    all-gather merges per-shard candidates — the quantized rung of the
    residency ladder at mesh scale (6x the per-chip capacity of the
    sharded exact tier).

    With ``rerank_device=True`` each shard additionally re-scores its
    own candidates against a LOCAL f16 row copy before the exchange
    (see :func:`device_rerank_topk` for the precision model): the
    gather never crosses shards — rows re-rank where they live — the
    all-gather carries f32-accumulated f16 re-rank scores (the rows
    are f16-rounded, the same ~2^-11 rounding device_rerank_topk
    documents for the single-chip path), tombstones are filtered by a
    sharded live mask on device, and the host re-rank drops out of the
    multi-chip path entirely (its output is the final ``(scores,
    ids)``, ids ``-1``-marked where dead/ragged).
    """

    def __init__(self, mesh, k: int, metric: str = "cosine",
                 rerank_device: bool = False, k_out: int | None = None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.k = k                      # per-shard candidate pool width
        self.k_out = k_out or k         # merged output width (device path)
        self.metric = metric
        self.rerank_device = rerank_device
        self.n_shard = int(mesh.shape["shard"])
        self._P = P
        self._NamedSharding = NamedSharding
        self._fn = self._build()

    def _build(self):
        import jax

        P = self._P
        k = self.k
        k_out = self.k_out
        metric = self.metric
        n_shard = self.n_shard
        rr = self.rerank_device

        def shard_fn(xs_i8, scales, sq, qs, n_valid, *rr_ops):
            rows = xs_i8.shape[0]
            shard_id = jax.lax.axis_index("shard")
            local_valid = jnp.clip(n_valid - shard_id * rows, 0, rows)
            sims, idx = int8_coarse_topk(
                xs_i8, scales, qs, local_valid, sq,
                k=min(k, rows), metric=metric,
            )
            if rr:
                xs16, live = rr_ops
                safe = jnp.clip(idx, 0, rows - 1)
                cand_rows = jnp.take(xs16, safe, axis=0).astype(jnp.float32)
                sims = jnp.einsum(
                    "bkd,bd->bk", cand_rows, qs,
                    preferred_element_type=jnp.float32,
                )
                if metric == "l2":
                    sims = 2.0 * sims - jnp.take(sq, safe, axis=0)
                ok = (
                    (idx >= 0)
                    & (idx < local_valid)
                    & (jnp.take(live, safe, axis=0) != 0)
                )
                sims = jnp.where(ok, sims, -jnp.inf)
            global_i = idx + shard_id * rows
            all_s = jax.lax.all_gather(sims, "shard", axis=0)
            all_i = jax.lax.all_gather(global_i, "shard", axis=0)
            b = qs.shape[0]
            kk = all_s.shape[-1]
            flat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(b, n_shard * kk)
            flat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, n_shard * kk)
            k_merge = min(k_out if rr else k, n_shard * kk)
            top_s, pos = jax.lax.top_k(flat_s, k_merge)
            top_i = jnp.take_along_axis(flat_i, pos, axis=1)
            if rr:
                top_i = jnp.where(top_s > -jnp.inf, top_i, -1)
            return top_s, top_i

        in_specs = [
            P("shard", None), P("shard"), P("shard"), P(None, None), P(),
        ]
        if rr:
            in_specs += [P("shard", None), P("shard")]
        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        return jax.jit(mapped)

    def _pad_rows(self, n: int) -> int:
        rows = -(-n // self.n_shard)
        return ((rows + 127) // 128) * 128

    def shard_arrays(self, values: np.ndarray, scales: np.ndarray,
                     sq_norms: np.ndarray):
        """Pad + device_put with row sharding; returns
        ``(xs_i8, scales, sq, n_valid)``."""
        import jax

        P, NS = self._P, self._NamedSharding
        n = len(values)
        total = self._pad_rows(n) * self.n_shard
        if total != n:
            pv = np.zeros((total, values.shape[1]), np.int8)
            pv[:n] = values
            ps = np.ones(total, np.float32)
            ps[:n] = scales
            pq = np.zeros(total, np.float32)
            pq[:n] = sq_norms
        else:
            pv, ps, pq = values, scales, sq_norms
        xs = jax.device_put(pv, NS(self.mesh, P("shard", None)))
        sc = jax.device_put(ps, NS(self.mesh, P("shard")))
        sq = jax.device_put(pq, NS(self.mesh, P("shard")))
        return xs, sc, sq, n

    def shard_rerank_arrays(self, data_f32: np.ndarray,
                            live_mask: np.ndarray):
        """Row-sharded f16 re-rank copy + uint8 live mask (padding
        dead), matching :meth:`shard_arrays`'s padding."""
        import jax

        P, NS = self._P, self._NamedSharding
        n = len(data_f32)
        total = self._pad_rows(n) * self.n_shard
        xs16 = np.zeros((total, data_f32.shape[1]), np.float16)
        xs16[:n] = data_f32
        live = np.zeros(total, np.uint8)
        live[:n] = live_mask[:n]
        xs = jax.device_put(xs16, NS(self.mesh, P("shard", None)))
        lv = jax.device_put(live, NS(self.mesh, P("shard")))
        return xs, lv

    def __call__(self, xs_i8, scales, sq, qs: np.ndarray, n_valid: int,
                 rerank_arrays: tuple | None = None):
        import jax

        qd = jax.device_put(
            np.asarray(qs, np.float32),
            self._NamedSharding(self.mesh, self._P(None, None)),
        )
        if self.rerank_device:
            if rerank_arrays is None:
                raise ValueError(
                    "rerank_device searcher needs shard_rerank_arrays(...)"
                )
            return self._fn(
                xs_i8, scales, sq, qd, jnp.int32(n_valid), *rerank_arrays
            )
        return self._fn(xs_i8, scales, sq, qd, jnp.int32(n_valid))


# ---------------------------------------------------------------- fused
#
# Pallas fused int8 coarse kernel: same packed-bucket design as
# ops/fused_topk.py (see its module docstring for the mantissa-packing
# trick and recall model), with the matmul in int8 on the MXU and the
# per-row de-scale fused before the bucket reduction.  HBM sees only
# the 1-byte/dim matrix read plus the tiny bucket write — the XLA path
# (int8_coarse_topk) round-trips a [B, N] f32 score matrix, which at
# 10M rows is ~40x the matrix bytes.  int8 tiles also fit 2x the rows
# of bf16 per VMEM block.

from .fused_topk import (
    BUCKET,
    MAX_QUERY_BLOCK,
    MIN_QUERY_BLOCK,
    NEG_SENTINEL,
    TILE,
    bucket_reduce_packed,
)

_I8_MAX_TILE_BYTES = 4 * 1024 * 1024


def _i8_tile_rows(d: int, query_block: int | None = None) -> int:
    from .fused_topk import tile_rows_for

    return tile_rows_for(d, query_block)  # 1 byte/element


def _make_i8_kernel(tile_rows: int):
    from jax.experimental import pallas as pl

    # No scale operands: rows carry one global scale (and the per-query
    # scale is a positive constant per column), so the raw integer dots
    # already rank correctly — de-scaling happens on the [B, k] output.
    # This is not a convenience: ANY per-row f32 operand arrives as a
    # [tile_rows, 1] block that Mosaic lane-pads to 128 (4 MB of VMEM
    # per 8192-row buffer), measured at ~0.64 ms/batch of pure epilogue
    # (benchmarks/i8_sweep.py, ep_astype vs dot_i8).  The int32 -> f32
    # astype itself is nearly free (dot_i8 runs at 86% of the int8-MXU
    # roofline with it fused in).
    def _kernel(n_valid_ref, q_ref, x_ref, vals_ref):
        tile_id = pl.program_id(0)
        dots = jax.lax.dot_general(
            x_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                               # [tile, B]
        sims = dots.astype(jnp.float32)
        rows = tile_id * tile_rows + jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 1), 0
        )
        sims = jnp.where(rows < n_valid_ref[0, 0], sims, NEG_SENTINEL)
        vals_ref[:] = bucket_reduce_packed(sims, tile_rows)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _i8_bucket_scores(
    xs_i8: jax.Array,       # [N, D] int8, N padded to TILE (global scale)
    q_i8: jax.Array,        # [B, D] int8 (B lane-aligned)
    n_valid: jax.Array,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = xs_i8.shape
    b = q_i8.shape[0]
    assert n % TILE == 0, "matrix rows must be padded to the tile size"
    tile_rows = _i8_tile_rows(d, b)
    buckets_per_tile = tile_rows // BUCKET
    num_tiles = n // tile_rows
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (buckets_per_tile, b), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    total_buckets = num_tiles * buckets_per_tile
    (vals,) = pl.pallas_call(
        _make_i8_kernel(tile_rows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((total_buckets, b), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + b * d + b * total_buckets * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        n_valid.reshape(1, 1).astype(jnp.int32),
        q_i8, xs_i8,
    )
    return vals


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def int8_fused_coarse(
    xs_i8: jax.Array,       # [N, D] int8 (global scale), rows padded to TILE
    qs: jax.Array,          # [B, D] f32
    n_valid: jax.Array,
    *,
    k: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused int8 coarse candidates: (packed scores [B, k], row ids).

    Cosine only; ``xs_i8`` must be :func:`quantize_rows_unit` codes
    (one global scale — see the module docstring for why the kernel
    refuses per-row scale operands).  Scores are de-scaled dot
    products; candidates feed the exact f32 host re-rank like the XLA
    coarse path.
    """
    b_in = qs.shape[0]
    total_buckets = xs_i8.shape[0] // BUCKET
    k_cand = min(k, total_buckets)
    out_s = []
    out_i = []
    for lo in range(0, b_in, MAX_QUERY_BLOCK):
        chunk = qs[lo:lo + MAX_QUERY_BLOCK]
        b = chunk.shape[0]
        b_pad = max(MIN_QUERY_BLOCK, ((b + 127) // 128) * 128)
        if b_pad != b:
            chunk = jnp.pad(chunk, ((0, b_pad - b), (0, 0)))
        q_i8, q_scales = _quantize_queries(chunk)
        vals = _i8_bucket_scores(
            xs_i8, q_i8, n_valid, interpret=interpret,
        ).T                                             # [b_pad, buckets]
        best_s, pos = jax.lax.approx_max_k(vals, k_cand, recall_target=0.95)
        arg = jax.lax.bitcast_convert_type(best_s, jnp.int32) & jnp.int32(
            BUCKET - 1
        )
        # De-scale on the [B, k] output (the in-bucket index bits ride
        # in the mantissa, so extract BEFORE the multiply; the product
        # keeps the documented <= 2^-17 relative packing noise).
        sims_k = best_s * (jnp.float32(GLOBAL_SCALE) * q_scales[:, None])
        out_s.append(sims_k[:b])
        out_i.append((pos * BUCKET + arg)[:b])
    sims = out_s[0] if len(out_s) == 1 else jnp.concatenate(out_s, axis=0)
    ids = out_i[0] if len(out_i) == 1 else jnp.concatenate(out_i, axis=0)
    return sims, ids

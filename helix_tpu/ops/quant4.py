"""int4 quantized residency tier: ~11x the exact tier's capacity.

The rung below int8 on the residency ladder (``engine/vector.py``):
rows quantize to **4-bit symmetric per-row** values packed two per
byte, so the device-resident matrix costs 0.5 bytes/dim + 4 bytes/row
— double the int8 rung's capacity, ~11x the exact bf16+f32 tier
(reference capacity envelope: ``db_max_size_gb=20``,
``helix-cli/src/config.rs:203-205``).

Design notes (TPU-first):

- **Column-halves packing.**  Byte ``j`` of a packed row holds column
  ``j`` in its low nibble and column ``j + D/2`` in its high nibble.
  Unpacking is then ``concat(lo_nibbles, hi_nibbles)`` along the lane
  axis — no per-element interleave, which Mosaic would have to
  implement as an expensive lane shuffle.  Better still, the fused
  kernel never materializes the concat: the dot product splits into
  ``lo . q[:, :D/2] + hi . q[:, D/2:]`` — two int8 MXU calls whose
  int32 accumulators add.
- **The coarse phase is bandwidth-bound**, so halving bytes read
  roughly doubles the roofline QPS of the int8 rung at equal batch.
- Nibbles hold [-7, 7] (symmetric; -8 is unused) with a per-row f32
  scale; queries quantize to int8 on device (the query side keeps 8
  bits — asymmetric precision costs nothing, the MXU is int8 x int8).
- Candidates re-rank **exactly in f32 on the host** like the int8
  rung; 4-bit noise only has to keep the true top-k inside the
  candidate set, so the default candidate width is wider
  (``32*k``, floor 256, vs int8's ``8*k``/64 — measured: the true
  top-10 fully survives at 320 candidates on 64-d clustered data
  where 160 reaches only ~0.91 containment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# The widest candidate pool the int4 rung will serve at.  Beyond it the
# exact-re-rank cost dominates and the residency gate routes to the
# host-IVF rung instead (which holds recall >= 0.99 at tiny resident
# cost) — serving a sub-floor recall silently is never an option
# (round-4 verdict: LADDER_r04_10M.json int4 served 0.8637 at the old
# fixed 1280-candidate pool).
INT4_MAX_POOL = 16384


def recall_safe_pool_int4(n: int, k: int = 10) -> int:
    """Scale-aware candidate floor for the int4 rung (the ef_search
    analog, auto-laddered — reference recall discipline
    ``helix-cli/src/config.rs:199-201``).

    4-bit noise is a fixed-width score perturbation, so the number of
    competitors within one noise-width of the true top-k boundary grows
    ~linearly with N on clustered corpora: 640 candidates measured
    recall@10 0.989 at N=1e6 while 1280 at N=1e7 measured only 0.864
    (LADDER_r04 artifacts).  The floor therefore grows linearly,
    anchored at the measured 1e6 point with 1.5x headroom:
    N/1024 -> 977 at 1e6, 9766 at 1e7."""
    return max(32 * k, 256, n // 1024)


def quantize_rows_int4(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int4, column-halves packed:
    ``(packed uint8 [N, D/2], scales f32 [N])``.  D must be even
    (PackedMatrix pads dims to a lane multiple).  Zero rows get
    scale 1."""
    n, d = rows.shape
    assert d % 2 == 0, "packed int4 needs an even (padded) dim"
    peak = np.abs(rows).max(axis=1)
    scales = np.where(peak > 0, peak / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(rows / scales[:, None]), -7, 7).astype(np.int8)
    h = d // 2
    lo = (q[:, :h] & 0x0F).astype(np.uint8)
    hi = (q[:, h:] & 0x0F).astype(np.uint8)
    return lo | (hi << 4), scales


def quantize_rows_int4_bucketed(
    rows: np.ndarray, n_live: int | None = None, chunk: int = 1_000_000,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Scale-sorted per-BUCKET int4 quantization for the fused kernel:
    ``(packed uint8 [N, D/2], bucket_scales f32 [N/64],
    row_scales f32 [N], perm int64 [N])``.

    Live rows sort by peak magnitude so each 64-row reduction bucket
    holds near-identical peaks — the shared bucket scale then costs
    almost nothing vs per-row scales, and because every row in a bucket
    shares its scale, the bucket max commutes with de-scaling: the
    kernel reduces in the raw-dot domain and multiplies only the
    [buckets, B] winners (see ops/fused_topk.descale_packed for why a
    per-row scale operand is off the table).  ``perm[sorted_pos] =
    original_pos``; callers map candidates back through it.
    ``row_scales`` is the bucket scale broadcast per row — the SAME
    de-scale values, shaped for the XLA fallback path.  Rows past
    ``n_live`` (padding) keep their positions so the kernel's
    ``n_valid`` mask stays valid."""
    n, d = rows.shape
    assert d % 2 == 0, "packed int4 needs an even (padded) dim"
    assert n % 64 == 0, "bucketed int4 needs 64-row-aligned row padding"
    if n_live is None:
        n_live = n
    peaks = np.empty(n, np.float32)
    for s0 in range(0, n, chunk):
        e0 = min(n, s0 + chunk)
        peaks[s0:e0] = np.abs(rows[s0:e0]).max(axis=1)
    perm = np.arange(n, dtype=np.int64)
    perm[:n_live] = np.argsort(peaks[:n_live], kind="stable")
    bucket_peak = peaks[perm].reshape(-1, 64).max(axis=1)
    bucket_scales = np.where(
        bucket_peak > 0, bucket_peak / 7.0, 1.0
    ).astype(np.float32)
    row_scales = np.repeat(bucket_scales, 64)
    h = d // 2
    packed = np.empty((n, h), np.uint8)
    for s0 in range(0, n, chunk):
        e0 = min(n, s0 + chunk)
        block = rows[perm[s0:e0]]
        q = np.clip(
            np.rint(block / row_scales[s0:e0, None]), -7, 7
        ).astype(np.int8)
        packed[s0:e0] = (q[:, :h] & 0x0F).astype(np.uint8) | (
            (q[:, h:] & 0x0F).astype(np.uint8) << 4
        )
    return packed, bucket_scales, row_scales, perm


def unpack_int4(packed: np.ndarray | jax.Array):
    """Inverse of the packing layout: int8 ``[N, D]`` in original
    column order (numpy or jax, matching the input)."""
    xp = jnp if isinstance(packed, jax.Array) else np
    lo = (packed & 0x0F).astype(xp.int8)
    lo = xp.where(lo > 7, lo - 16, lo)
    hi = (packed >> 4).astype(xp.int8)
    hi = xp.where(hi > 7, hi - 16, hi)
    return xp.concatenate([lo, hi], axis=1)


from .quant import _quantize_queries  # shared device-side query int8


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def int4_coarse_topk(
    packed: jax.Array,      # [N, D/2] uint8 resident matrix
    x_scales: jax.Array,    # [N] f32 per-row scales
    qs: jax.Array,          # [B, D] f32 query batch
    n_valid: jax.Array,     # scalar int32
    sq_norms: jax.Array,    # [N] f32 squared norms (l2 only)
    *,
    k: int,
    metric: str = "cosine",
) -> tuple[jax.Array, jax.Array]:
    """XLA coarse phase (correctness/CPU path; the Pallas kernel below
    is the TPU serving path — XLA materializes the unpacked int8
    matrix per call, giving up the bandwidth win)."""
    n = packed.shape[0]
    xs_i8 = unpack_int4(packed)
    q_i8, q_scales = _quantize_queries(qs)
    dots = jax.lax.dot_general(
        q_i8, xs_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sims = dots.astype(jnp.float32) * q_scales[:, None] * x_scales[None, :]
    if metric == "l2":
        sims = 2.0 * sims - sq_norms[None, :]
    cols = jnp.arange(n, dtype=jnp.int32)
    sims = jnp.where((cols < n_valid)[None, :], sims, -jnp.inf)
    return jax.lax.approx_max_k(sims, k, recall_target=0.99)


# ---------------------------------------------------------------- fused
#
# Pallas fused int4 coarse kernel: the packed-bucket design of
# ops/fused_topk.py (see its docstring for the mantissa-packing trick),
# reading the PACKED nibbles from HBM and unpacking in VMEM.  The dot
# splits over column halves so no lane interleave or concat is needed.

from .fused_topk import (
    BUCKET,
    MAX_QUERY_BLOCK,
    MIN_QUERY_BLOCK,
    NEG_SENTINEL,
    TILE,
    bucket_reduce_packed,
)

_I4_MAX_TILE_BYTES = 4 * 1024 * 1024  # packed bytes per x-tile in VMEM


# VMEM working set per row inside the kernel: the packed tile (1 byte
# per 2 dims) PLUS the materialized unpack intermediates — p32 int32
# (4 bytes/packed byte) and the lo/hi int8 nibbles (2 bytes/packed
# byte).  Budgeting only the packed bytes let wide dims (e.g. 2048-d,
# d_half=1024) pick a 4096-row tile whose int32 intermediate alone was
# 16 MB — the whole v5e VMEM — before the query block and score tile.
_I4_ROW_VMEM_FACTOR = 7


def _i4_tile_rows(d_half: int, query_block: int | None = None) -> int:
    from .fused_topk import tile_rows_for

    return tile_rows_for(_I4_ROW_VMEM_FACTOR * d_half, query_block)


def _make_i4_kernel(tile_rows: int, d_half: int):
    from jax.experimental import pallas as pl

    from .fused_topk import descale_packed

    # Per-BUCKET scales (rows scale-sorted at quantization time, so
    # every 64-row bucket shares its scale): the reduction runs in the
    # raw-dot f32 domain and only the [buckets, B] winners de-scale,
    # behind a tiny [buckets, 1] operand.  A per-row [tile_rows, 1]
    # operand lane-pads to 4 MB of VMEM per buffer — the measured int8
    # epilogue catastrophe (benchmarks/i8_sweep.py; ops/quant.py module
    # docstring).  The per-query scale moves to the [B, k] output.
    def _kernel(n_valid_ref, q_ref, x_ref, bscale_ref, vals_ref):
        tile_id = pl.program_id(0)
        p32 = x_ref[:].astype(jnp.int32)            # [tile, D/2]
        lo = ((p32 << 28) >> 28).astype(jnp.int8)   # sign-extended nibble
        hi = ((p32 << 24) >> 28).astype(jnp.int8)
        q = q_ref[:]                                # [B, D] int8
        dots = jax.lax.dot_general(
            lo, q[:, :d_half],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) + jax.lax.dot_general(
            hi, q[:, d_half:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                           # [tile, B]
        sims = dots.astype(jnp.float32)
        rows = tile_id * tile_rows + jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 1), 0
        )
        sims = jnp.where(rows < n_valid_ref[0, 0], sims, NEG_SENTINEL)
        vals_ref[:] = descale_packed(
            bucket_reduce_packed(sims, tile_rows), bscale_ref[:]
        )

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _i4_bucket_scores(
    packed: jax.Array,      # [N, D/2] uint8, N padded to TILE
    bucket_scales: jax.Array,  # [N / 64, 1] f32 (scale-sorted buckets)
    q_i8: jax.Array,        # [B, D] int8 (B lane-aligned)
    n_valid: jax.Array,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d_half = packed.shape
    b = q_i8.shape[0]
    assert n % TILE == 0, "matrix rows must be padded to the tile size"
    tile_rows = _i4_tile_rows(d_half, b)
    buckets_per_tile = tile_rows // BUCKET
    num_tiles = n // tile_rows
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 2 * d_half), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, d_half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((buckets_per_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((buckets_per_tile, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    total_buckets = num_tiles * buckets_per_tile
    (vals,) = pl.pallas_call(
        _make_i4_kernel(tile_rows, d_half),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((total_buckets, b), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * 2 * d_half,
            bytes_accessed=n * d_half + b * 2 * d_half + b * total_buckets * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        n_valid.reshape(1, 1).astype(jnp.int32),
        q_i8, packed, bucket_scales,
    )
    return vals


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def int4_fused_coarse(
    packed: jax.Array,        # [N, D/2] uint8, rows padded to TILE,
                              # scale-sorted (quantize_rows_int4_bucketed)
    bucket_scales: jax.Array,  # [N / 64] f32
    qs: jax.Array,            # [B, D] f32
    n_valid: jax.Array,
    *,
    k: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused int4 coarse candidates: (packed scores [B, k], row ids).

    Cosine only, like ``int8_fused_coarse``.  Row ids are SORTED
    positions — map them through the quantizer's ``perm`` before
    touching original-order state (live masks, re-rank operands).
    """
    b_in = qs.shape[0]
    total_buckets = packed.shape[0] // BUCKET
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
        vals = _i4_bucket_scores(
            packed, bucket_scales.reshape(-1, 1), q_i8,
            n_valid, interpret=interpret,
        ).T                                             # [b_pad, buckets]
        best_s, pos = jax.lax.approx_max_k(vals, k_cand, recall_target=0.95)
        arg = jax.lax.bitcast_convert_type(best_s, jnp.int32) & jnp.int32(
            BUCKET - 1
        )
        # per-query de-scale on the [B, k] output (extract the packed
        # index FIRST; the product keeps the <= 2^-17 packing noise)
        sims_k = best_s * q_scales[:, None]
        out_s.append(sims_k[:b])
        out_i.append((pos * BUCKET + arg)[:b])
    sims = out_s[0] if len(out_s) == 1 else jnp.concatenate(out_s, axis=0)
    ids = out_i[0] if len(out_i) == 1 else jnp.concatenate(out_i, axis=0)
    return sims, ids


class Int4Resident:
    """Device-resident packed int4 copy of a packed matrix, refreshed
    by version (mirrors ``ops/quant.py`` QuantizedResident)."""

    def __init__(self):
        # (version, packed, row_scales, sq_dev, bucket_scales, perm) —
        # sq_dev caches the l2 de-scale operand on device (cosine gets
        # a 1-element dummy).  For cosine, rows are scale-sorted and
        # ``perm`` maps sorted -> original positions (bsc feeds the
        # fused kernel, row_scales the XLA fallback); l2 keeps the
        # original order (perm identity, bsc dummy, fused is
        # cosine-only anyway).
        self._cached: tuple | None = None

    def arrays(self, matrix):
        from .distance import PackedMatrix, _round_up

        cached = self._cached
        if cached is not None and cached[0] == matrix.version:
            return cached[1:]
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
            packed, bsc, scales, perm = quantize_rows_int4_bucketed(
                np.asarray(rows), n_live=matrix.n
            )
            bsc_dev = jnp.asarray(bsc)
        else:
            packed, scales = quantize_rows_int4(rows)
            perm = np.arange(n_rows, dtype=np.int64)
            bsc_dev = jnp.ones((1,), jnp.float32)
        xs = PackedMatrix._upload(packed)  # chunked H2D
        sc = jnp.asarray(scales)
        if matrix.metric == "l2":
            sq = np.zeros(n_rows, np.float32)
            sq[: matrix.n] = matrix.sq_norms[: matrix.n]
            sq_dev = jnp.asarray(sq)
        else:
            sq_dev = jnp.zeros((1,), jnp.float32)
        xs.block_until_ready()
        self._cached = (matrix.version, xs, sc, sq_dev, bsc_dev, perm)
        return xs, sc, sq_dev, bsc_dev, perm

    @staticmethod
    def _use_fused(matrix) -> bool:
        from .fused_topk import TILE

        return (
            jax.default_backend() == "tpu"
            and matrix.metric == "cosine"
            and matrix.n >= TILE
            # the unpack working set (packed + int32 + nibbles) must
            # still leave a >= 512-row tile at this width
            and _I4_MAX_TILE_BYTES
            // max(_I4_ROW_VMEM_FACTOR * (matrix.data.shape[1] // 2), 1)
            >= 512
        )

    def search(
        self, matrix, queries: np.ndarray, k: int, live_mask: np.ndarray,
        metric: str, k_cand_floor: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Coarse int4 top-k + exact f32 host re-rank.  Candidate width
        32*k (floor 256): 4-bit noise needs more coarse headroom than
        int8's 8*k to keep the true top-k in the re-rank set.
        ``k_cand_floor`` (the ef_search analog) widens it further for
        dense, near-duplicate-heavy corpora (BENCH_NOTES int4 curve);
        the scale-aware :func:`recall_safe_pool_int4` floor keeps the
        pool recall-safe as N grows (an explicit floor still wins when
        wider)."""
        from ..native import rerank as native_rerank

        n = matrix.n
        packed, scales, sq_dev, bsc, perm = self.arrays(matrix)
        qs = matrix.prepare_queries(queries)
        k_cand = min(
            max(recall_safe_pool_int4(n, k), k_cand_floor or 0), n
        )
        from .fused_topk import TILE as _TILE

        # One candidate per 64-row bucket: when the bucket count cannot
        # supply the documented candidate floor, the XLA path serves
        # the full pool instead of silently narrowing it (recall would
        # drop below the measured target with no warning).
        if (
            self._use_fused(matrix)
            and packed.shape[0] % _TILE == 0
            and k_cand <= packed.shape[0] // BUCKET
        ):
            _, cand = int4_fused_coarse(
                packed, bsc, jnp.asarray(qs), jnp.int32(n), k=k_cand
            )
        else:
            _, cand = int4_coarse_topk(
                packed, scales, jnp.asarray(qs), jnp.int32(n),
                sq_dev, k=k_cand, metric=metric,
            )
        # candidates are SORTED positions (scale-sorted quantization);
        # map back to original row positions before any original-order
        # state is touched
        cand = perm[np.clip(np.asarray(cand, np.int64), 0, len(perm) - 1)]
        cand = np.where(
            (cand < n) & live_mask[np.clip(cand, 0, n - 1)], cand, -1
        )
        return native_rerank(
            matrix.data[:n], matrix.sq_norms[:n], qs, cand, k, metric
        )

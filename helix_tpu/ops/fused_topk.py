"""Pallas fused distance + packed bucket-max top-k kernel.

Fuses the top-k candidate reduction into the matmul: each grid step
loads one row tile of the bfloat16 matrix into VMEM, computes the score
tile on the MXU, and immediately reduces it to one winner per
``BUCKET``-row window — so HBM sees only the ~256 MB matrix read plus a
~16 MB candidate write instead of the ~1 GB score-matrix round trip the
XLA path (``distance.topk_resident``) pays.

The trick that makes the tail cheap: each row's WITHIN-BUCKET index is
PACKED into its score's low mantissa bits (``log2(BUCKET)`` bits)
BEFORE the reduction, so a single ``max`` over the bucket axis selects
the winner and carries its index along — one VPU pass over the score
tile instead of the max+argmax pair an index output would need.  The
kernel emits a single f32 output and the caller recovers the row id as
``bucket_id * BUCKET + low_bits`` with no index matrix and no
``take_along_axis`` gather.  Packing perturbs scores by <= 2^-17
relative — selection-only noise, erased by the exact f32 re-rank (ties
within the noise window break toward the higher in-bucket index for
positive scores, lower for negative; the re-rank erases that too).

Measured on a tunneled v5e (1M x 128-d cosine, batch 256, k=10, timings
amortized over a 64-step on-device scan so the ~30 ms tunnel RPC is
noise; benchmarks/onepass_sweep.py, round 5): one-pass at tile 8192 =
0.63 ms/batch (~409k QPS) at recall@10 0.996 vs the two-pass
(max+argmax) variant's 0.69 ms (~372k) at the same tile and 0.75 ms
(~342k) at tile 4096; the XLA single-shot path serves ~237k at matched
recall.  HBM matrix-read floor is ~0.31 ms.  An earlier two-output
variant measured +0.52 ms for selection (the ``take_along_axis`` on
the index matrix) — that cost is what the mantissa packing removes.

Selection recall model (same as ``approx_max_k``'s windowing): a true
top-k item is lost only when two top-k items share a 64-row bucket; on
shuffled data that is ~`C(k,2)/num_buckets`, giving ~0.997 for k=10 at
1M rows before the re-rank pass recovers exact order.

Layout notes (see /opt/skills/guides/pallas_guide.md): tiles are
(sublane x 128)-aligned, the query block is broadcast across grid steps
via a constant index_map, outputs are ``[buckets, B]`` (transposed once
in XLA by the caller), and row masking uses a finite ``NEG_SENTINEL``
rather than -inf because OR-ing index bits into an -inf mantissa would
manufacture NaNs.

Reference behavior being accelerated: the HNSW-backed
``VectorSearchNodes`` step (``dsl.rs:2820``) — helix-tpu serves it with
exact brute-force on the MXU instead of a graph walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row padding granularity and bucket width.  The per-step row tile
# shrinks for wide vectors so the bf16 matrix tile stays within ~4 MB
# of VMEM (double-buffered) next to the f32 score tile; it always
# divides TILE, so one row-padding rule serves every dimension.
TILE = 8192
BUCKET = 64
MAX_TILE_BYTES = 4 * 1024 * 1024
# Combined VMEM working-set cap: f32 score tile + the double-buffered
# matrix tiles must fit here, leaving ~4 MB of the v5e's ~16 MB VMEM
# for the query block, outputs, and Mosaic scratch.
VMEM_WORKING_BYTES = 12 * 1024 * 1024


def tile_rows_for(row_bytes: int, query_block: int | None = None) -> int:
    """Rows per VMEM tile for a matrix whose rows cost ``row_bytes``:
    the largest power of two within the byte budget.  MUST divide TILE
    (rows are padded to TILE, and the grid is n // tile_rows — a
    non-divisor silently drops the tail rows from the scan; every power
    of two in [512, 8192] divides 8192).  Shared by the bf16, int8, and
    packed-int4 kernels; callers gate on ``budget >= 512`` via
    ``supports_fused``/``_use_fused`` before reaching here.

    ``query_block`` additionally bounds the combined VMEM working set —
    the f32 score tile (``tile_rows x B x 4``) plus the double-buffered
    matrix tiles (``2 x tile_rows x row_bytes``) — to
    ``VMEM_WORKING_BYTES``.  At batch 256 / 128-d bf16 that admits the
    full 8192-row tile (8 MB scores + 4 MB tiles), which the round-5
    one-pass sweep measured ~10% faster than tile 4096
    (benchmarks/onepass_sweep.py: 0.63 vs 0.75 ms/batch at 1M x 128);
    wider rows halve the tile until the working set fits."""
    budget = MAX_TILE_BYTES // max(row_bytes, 1)
    t = 512
    while t * 2 <= min(budget, TILE):
        t *= 2
    if query_block:
        while (
            t > 512
            and t * query_block * 4 + 2 * t * row_bytes > VMEM_WORKING_BYTES
        ):
            t //= 2
    return t


def _tile_rows(d: int, query_block: int | None = None) -> int:
    return tile_rows_for(d * 2, query_block)  # bf16

# Finite "masked row" sentinel (see module docstring re: NaNs).
NEG_SENTINEL = -3.0e38

# Queries per kernel invocation: lane alignment wants multiples of 128;
# larger batches split into chunks to bound the VMEM score buffer.
MIN_QUERY_BLOCK = 128
MAX_QUERY_BLOCK = 256


def bucket_reduce_packed(sims: jax.Array, tile_rows: int) -> jax.Array:
    """One-pass packed bucket reduction shared by the bf16/int8/int4
    kernels: OR each row's within-bucket index into its score's low
    mantissa bits, then a single ``max`` over the bucket axis — the
    winner's index rides along in the winning value (see module
    docstring for the tie-break/noise model).  ``sims`` is the masked
    [tile_rows, B] f32 score tile; returns [tile_rows // BUCKET, B]."""
    in_bucket = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, 1), 0
    ) & jnp.int32(BUCKET - 1)
    bits = jax.lax.bitcast_convert_type(sims, jnp.int32)
    packed = (bits & jnp.int32(~(BUCKET - 1))) | in_bucket
    packed_f = jax.lax.bitcast_convert_type(packed, jnp.float32)
    grouped = packed_f.reshape(tile_rows // BUCKET, BUCKET, sims.shape[1])
    return jnp.max(grouped, axis=1)


def descale_packed(winners: jax.Array, scales: jax.Array) -> jax.Array:
    """Multiply packed bucket winners ``[buckets, B]`` by positive
    per-bucket ``scales [buckets, 1]`` while preserving the in-bucket
    index riding in the low mantissa bits: extract the index, multiply
    the cleaned score, re-pack.  The re-pack re-introduces the same
    <= 2^-17 relative noise the packing model already documents.

    This is how per-bucket de-scaling stays OUT of the [tile_rows, B]
    domain: a per-ROW scale operand would be a [tile_rows, 1] block
    that Mosaic lane-pads to 128 (4 MB of VMEM per buffer — the
    measured int8 epilogue catastrophe, benchmarks/i8_sweep.py), while
    the [buckets, 1] winner-domain multiply touches 1/64th of the data
    behind a 32 KB operand."""
    mask = jnp.int32(BUCKET - 1)
    bits = jax.lax.bitcast_convert_type(winners, jnp.int32)
    idx = bits & mask
    clean = jax.lax.bitcast_convert_type(bits & ~mask, jnp.float32)
    scaled = jax.lax.bitcast_convert_type(clean * scales, jnp.int32)
    return jax.lax.bitcast_convert_type((scaled & ~mask) | idx, jnp.float32)


def _make_kernel(tile_rows: int):
    def _kernel(n_valid_ref, q_ref, x_ref, vals_ref):
        tile_id = pl.program_id(0)
        # [tile, B] scores: contract feature dims, no transpose
        # materialized.
        sims = jax.lax.dot_general(
            x_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Mask padding rows with a finite sentinel ((tile, 1) iota
        # broadcasts across the lane dim for free).
        rows = tile_id * tile_rows + jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 1), 0
        )
        sims = jnp.where(rows < n_valid_ref[0, 0], sims, NEG_SENTINEL)
        vals_ref[:] = bucket_reduce_packed(sims, tile_rows)

    return _kernel


@jax.jit
def _bucket_scores(xs16: jax.Array, qs16: jax.Array, n_valid: jax.Array):
    """[total_buckets, B] packed winner scores (see module docstring)."""
    n, d = xs16.shape
    b = qs16.shape[0]
    assert n % TILE == 0, "matrix rows must be padded to the tile size"
    tile_rows = _tile_rows(d, b)
    buckets_per_tile = tile_rows // BUCKET
    num_tiles = n // tile_rows
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            # Query block: identical for every grid step.
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            # One row tile of the matrix per step (pipelined by Pallas).
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
    (vals_t,) = pl.pallas_call(
        _make_kernel(tile_rows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((total_buckets, b), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * 2 + b * d * 2 + b * total_buckets * 4,
            transcendentals=0,
        ),
    )(n_valid.reshape(1, 1).astype(jnp.int32), qs16, xs16)
    return vals_t


@functools.partial(jax.jit, static_argnames=("k", "rerank"))
def fused_topk(
    xs16: jax.Array,        # [N, D] bfloat16, rows padded to TILE
    xs32: jax.Array,        # [N', D] float32 (re-rank operand, N' >= n_valid)
    qs: jax.Array,          # [B, D] float32
    n_valid: jax.Array,
    sq_norms: jax.Array,    # unused (cosine only); kept for API parity
    *,
    k: int,
    rerank: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ``topk_resident`` on TPU, cosine metric: fused packed
    candidates + exact f32 re-rank.  Returns ``(dists, ids)`` ascending
    by distance; overflow slots (fewer than k valid rows) carry id -1."""
    b_in = qs.shape[0]
    d = xs16.shape[1]
    total_buckets = xs16.shape[0] // BUCKET
    k_cand = min(max(k, min(rerank * k, 512), 64), total_buckets)

    # Lane-align the query block; split big batches into chunks so the
    # VMEM score buffer stays bounded.
    out_d = []
    out_i = []
    for lo in range(0, b_in, MAX_QUERY_BLOCK):
        chunk = qs[lo:lo + MAX_QUERY_BLOCK]
        b = chunk.shape[0]
        b_pad = max(MIN_QUERY_BLOCK, ((b + 127) // 128) * 128)
        if b_pad != b:
            chunk = jnp.pad(chunk, ((0, b_pad - b), (0, 0)))
        qs16 = chunk.astype(jnp.bfloat16)
        vals = _bucket_scores(xs16, qs16, n_valid).T     # [b_pad, buckets]
        best_s, pos = jax.lax.approx_max_k(vals, k_cand, recall_target=0.95)
        arg = jax.lax.bitcast_convert_type(best_s, jnp.int32) & jnp.int32(
            BUCKET - 1
        )
        best_i = pos * BUCKET + arg
        # Exact f32 re-rank of the candidates.
        cand = jnp.take(xs32, best_i, axis=0, mode="clip")
        exact = jnp.einsum(
            "bkd,bd->bk", cand, chunk, preferred_element_type=jnp.float32
        )
        valid = best_s > jnp.float32(NEG_SENTINEL / 2)
        exact = jnp.where(valid, exact, -jnp.inf)
        # The bucket reduction yields at most k_cand candidates; a k
        # beyond that (heavy tombstone inflation) pads with overflow
        # slots instead of crashing lax.top_k at trace time.  The
        # dispatcher (supports_fused) prefers the XLA path in that
        # regime; this is the in-kernel backstop.
        k_top = min(k, k_cand)
        top_s, top_pos = jax.lax.top_k(exact, k_top)
        top_i = jnp.take_along_axis(best_i, top_pos, axis=1)
        filled = jnp.take_along_axis(valid, top_pos, axis=1)
        top_i = jnp.where(filled, top_i, -1)
        if k_top < k:
            pad = k - k_top
            top_s = jnp.pad(top_s, ((0, 0), (0, pad)),
                            constant_values=-jnp.inf)
            top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
        out_d.append((1.0 - top_s)[:b])
        out_i.append(top_i[:b])
    dists = out_d[0] if len(out_d) == 1 else jnp.concatenate(out_d, axis=0)
    ids = out_i[0] if len(out_i) == 1 else jnp.concatenate(out_i, axis=0)
    return dists, ids


def supports_fused(n_rows_padded: int, dim_pad: int, metric: str,
                   backend: str, k: int | None = None) -> bool:
    """Serving-path gate: TPU backend, cosine, fused-padded rows, the
    smallest row tile (512) within the VMEM budget (wide dims would
    blow the tile budget and fail at Mosaic compile time), and — when
    ``k`` is given — a bucket count that can actually supply k
    candidates (one winner per 64-row bucket; past that the XLA path
    serves the full pool instead of overflow padding)."""
    return (
        backend == "tpu"
        and metric == "cosine"
        and n_rows_padded % TILE == 0
        and n_rows_padded >= TILE
        and dim_pad % 128 == 0
        and MAX_TILE_BYTES // (dim_pad * 2) >= 512
        and (k is None or k <= n_rows_padded // BUCKET)
    )


def pad_rows_for_fused(n: int) -> int:
    """Row padding requirement for the fused kernel."""
    return ((max(n, 1) + TILE - 1) // TILE) * TILE

"""Pallas fused distance + bucketed top-k candidate kernel (experimental).

Fuses the top-k reduction into the matmul: each grid step loads one row
tile of the bfloat16 matrix into VMEM, computes the score tile on the
MXU, and immediately reduces it to per-bucket (max, argmax) pairs — so
HBM sees only the 256 MB matrix read and a ~4 MB candidate write instead
of a 1 GB score-matrix round trip.

STATUS: correct (interpret-mode tested) but NOT wired into serving.
Measured on this environment's tunneled v5e, serialized by data
dependency: XLA single-shot (topk_resident) runs at ~0.28 ms/batch —
already at the HBM matrix-read roofline, i.e. XLA fuses approx_max_k
into the matmul consumer well — while this Pallas kernel executes at
~59 ms/batch (~0.5 ms per grid step), consistent with per-step dispatch
overhead in the axon backend rather than kernel inefficiency.  Revisit
on directly-attached hardware.

Same selection semantics as ``approx_max_k`` (one winner per window): a
true top-k item is lost only when two top-k items share a bucket, so
recall@10 with N/W=2048 buckets is ~0.998 before the exact re-rank pass
recovers order.

Layout notes (see /opt/skills/guides/pallas_guide.md): tiles are
(sublane x 128)-aligned, the query block is broadcast across grid steps
via a constant index_map, and the bucketed argmax uses broadcasted_iota
(2D iota requirement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row tile per grid step and bucket width.  Everything is laid out
# rows-major so the kernel never transposes in VMEM: scores are computed
# as ``x_tile @ q^T -> [TILE, B]`` via dot_general (contracting on the
# feature dim of both operands), and bucket maxima reduce across the
# sublane axis.  Outputs are transposed — ``[buckets, B]`` — to stay
# (8, 128)-block-aligned; the caller transposes the tiny candidate
# matrices once in XLA.
TILE = 8192
BUCKET = 64
BUCKETS_PER_TILE = TILE // BUCKET          # 128


def _kernel(n_valid_ref, q_ref, x_ref, vals_ref, idx_ref):
    tile_id = pl.program_id(0)
    b = q_ref.shape[0]
    # [TILE, B] scores: contract feature dims, no transpose materialized.
    sims = jax.lax.dot_general(
        x_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Mask invalid (padding) rows before bucket selection so they can
    # never win a bucket even when real rows score negatively.
    rows = tile_id * TILE + jax.lax.broadcasted_iota(
        jnp.int32, (TILE, b), dimension=0
    )
    sims = jnp.where(rows < n_valid_ref[0, 0], sims, -jnp.inf)
    grouped = sims.reshape(BUCKETS_PER_TILE, BUCKET, b)
    vals = jnp.max(grouped, axis=1)                        # [buckets, B]
    arg = jnp.argmax(grouped, axis=1).astype(jnp.int32)    # row-in-bucket
    base = tile_id * TILE
    offsets = jax.lax.broadcasted_iota(
        jnp.int32, (BUCKETS_PER_TILE, b), dimension=0
    ) * BUCKET
    vals_ref[:] = vals
    idx_ref[:] = base + offsets + arg


@functools.partial(jax.jit, static_argnames=())
def _bucket_candidates(xs16: jax.Array, qs16: jax.Array, n_valid: jax.Array):
    n, d = xs16.shape
    b = qs16.shape[0]
    assert n % TILE == 0, "matrix rows must be padded to the tile size"
    num_tiles = n // TILE
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            # n_valid scalar in SMEM.
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            # Query block: identical for every grid step.
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            # One row tile of the matrix per step (pipelined by Pallas).
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (BUCKETS_PER_TILE, b), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BUCKETS_PER_TILE, b), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    total_buckets = num_tiles * BUCKETS_PER_TILE
    vals_t, idx_t = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((total_buckets, b), jnp.float32),
            jax.ShapeDtypeStruct((total_buckets, b), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * 2 + b * d * 2 + b * total_buckets * 8,
            transcendentals=0,
        ),
    )(n_valid.reshape(1, 1).astype(jnp.int32), qs16, xs16)
    return vals_t.T, idx_t.T


@functools.partial(jax.jit, static_argnames=("k", "metric", "rerank"))
def fused_topk(
    xs16: jax.Array,        # [N, D] bfloat16, rows padded to TILE
    xs32: jax.Array,        # [N, D] float32 (re-rank operand)
    qs: jax.Array,          # [B, D] float32
    n_valid: jax.Array,
    sq_norms: jax.Array,
    *,
    k: int,
    metric: str = "cosine",
    rerank: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ``topk_resident`` on TPU: fused candidates + exact
    f32 re-rank.  Cosine only in the fused phase (l2 callers use the XLA
    path)."""
    n, _ = xs16.shape
    qs16 = qs.astype(jnp.bfloat16)
    vals, idx = _bucket_candidates(xs16, qs16, n_valid)
    k_scan = min(max(k, rerank * k), vals.shape[1])
    best_s, pos = jax.lax.top_k(vals, k_scan)
    best_i = jnp.take_along_axis(idx, pos, axis=1)

    cand = jnp.take(xs32, best_i, axis=0)
    exact = jnp.einsum(
        "bkd,bd->bk", cand, qs, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        exact = 2.0 * exact - jnp.take(sq_norms, best_i, axis=0)
    exact = jnp.where(jnp.isfinite(best_s), exact, -jnp.inf)
    finite = jnp.isfinite(best_s)
    best_s, pos = jax.lax.top_k(exact, k)
    best_i = jnp.take_along_axis(best_i, pos, axis=1)
    # Fewer than k valid candidates (tiny partitions): flag overflow
    # slots with -1 so callers can drop them.
    filled = jnp.take_along_axis(finite, pos, axis=1)
    best_i = jnp.where(filled, best_i, -1)
    if metric == "cosine":
        dists = 1.0 - best_s
    else:
        q_sq = jnp.sum(qs * qs, axis=1, keepdims=True)
        dists = -best_s + q_sq
    return dists, best_i


def supports_fused(n_rows: int, dim_pad: int, metric: str, backend: str) -> bool:
    return (
        backend == "tpu"
        and metric == "cosine"
        and n_rows % TILE == 0
        and dim_pad % 128 == 0
        and n_rows >= TILE
    )


def pad_rows_for_fused(n: int) -> int:
    """Row padding requirement for the fused kernel."""
    return ((max(n, 1) + TILE - 1) // TILE) * TILE

"""One-pass bucket-reduction experiment for the fused exact kernel.

The shipped kernel (`ops/fused_topk._make_kernel`) reduces the VMEM
score tile twice on the VPU — ``max`` then ``argmax`` over the bucket
axis — before packing the argmax into the winner's low mantissa bits.
At tile 4096 / batch 256 that is two full passes over a 4 MB tile per
grid step, a plausible chunk of the measured 3.2 us/step vs the
1.27 us/step HBM floor.

Variant measured here: pack each row's WITHIN-BUCKET index into its
score's low mantissa bits BEFORE the reduction, then take a single
``max`` over the bucket axis — one VPU pass, same packed output format.
Tie-break near-equals shift within the existing <= 2^-17 packing noise
(negative scores prefer the lower in-bucket index, positives the
higher); the exact f32 re-rank erases both, as it already does for the
shipped packing.

Sweeps {shipped, one-pass} x tile_rows, cache-proof timing.

Usage: python benchmarks/onepass_sweep.py [--n 1000000] [--batch 256]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _make_kernel_onepass(tile_rows: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import helix_tpu.ops.fused_topk as ft

    buckets_per_tile = tile_rows // ft.BUCKET

    def _kernel(n_valid_ref, q_ref, x_ref, vals_ref):
        tile_id = pl.program_id(0)
        sims = jax.lax.dot_general(
            x_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows = tile_id * tile_rows + jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 1), 0
        )
        sims = jnp.where(rows < n_valid_ref[0, 0], sims, ft.NEG_SENTINEL)
        # pack the within-bucket row index BEFORE the reduction: one
        # max pass replaces the shipped max+argmax pair
        in_bucket = jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 1), 0
        ) & jnp.int32(ft.BUCKET - 1)
        bits = jax.lax.bitcast_convert_type(sims, jnp.int32)
        packed = (bits & jnp.int32(~(ft.BUCKET - 1))) | in_bucket
        packed_f = jax.lax.bitcast_convert_type(packed, jnp.float32)
        grouped = packed_f.reshape(
            buckets_per_tile, ft.BUCKET, sims.shape[1]
        )
        vals_ref[:] = jnp.max(grouped, axis=1)

    return _kernel


def _make_kernel_lastmask(tile_rows: int):
    """One-pass variant that applies the n_valid junk-row mask only in
    tiles that actually CONTAIN junk rows: rows pad past the high-water
    mark (up to a full 8192-row TILE of junk, possibly spanning several
    smaller grid tiles — hence a containment test, not ==last), and
    tombstones are a separate post-filter, so the interior tiles'
    per-element select — ~25% of the reduction's VPU ops — is waste."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import helix_tpu.ops.fused_topk as ft

    def _kernel(n_valid_ref, q_ref, x_ref, vals_ref):
        tile_id = pl.program_id(0)
        sims = jax.lax.dot_general(
            x_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        has_junk = (tile_id + 1) * tile_rows > n_valid_ref[0, 0]

        @pl.when(jnp.logical_not(has_junk))
        def _interior():
            vals_ref[:] = ft.bucket_reduce_packed(sims, tile_rows)

        @pl.when(has_junk)
        def _mask_tail():
            rows = tile_id * tile_rows + jax.lax.broadcasted_iota(
                jnp.int32, (tile_rows, 1), 0
            )
            masked = jnp.where(
                rows < n_valid_ref[0, 0], sims, ft.NEG_SENTINEL
            )
            vals_ref[:] = ft.bucket_reduce_packed(masked, tile_rows)

    return _kernel


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tiles", default="4096,8192")
    ap.add_argument("--rounds", type=int, default=64)
    ap.add_argument(
        "--interpret", action="store_true",
        help="run kernels in Pallas interpret mode (CPU correctness smoke)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.interpret:
        from jax.experimental import pallas as pl

        _orig_call = pl.pallas_call
        pl.pallas_call = (
            lambda *a, **kw: _orig_call(*a, **{**kw, "interpret": True})
        )

    from benchmarks.ladder import _corpus, _oracle, _recall
    from benchmarks.roofline import roofline_batch_seconds, timed_scan_qps
    import helix_tpu.ops.fused_topk as ft
    from helix_tpu.ops.distance import PackedMatrix

    n, d, batch, k = args.n, args.d, args.batch, args.k
    log = lambda m: print(m, file=sys.stderr, flush=True)  # noqa: E731
    log(f"# onepass sweep: N={n} d={d} batch={batch} "
        f"backend={jax.default_backend()}")
    data, queries = _corpus(n, d, batch, 1)
    matrix = PackedMatrix(d, "cosine")
    matrix.extend(data)
    xs16, _ = matrix.device_arrays()
    xs32 = matrix.data_device()
    jax.block_until_ready(xs16)
    oracle = _oracle(data, queries[:batch], k)
    qs_pad = jnp.asarray(matrix.prepare_queries(queries[:batch]))
    n_valid = jnp.int32(matrix.n)
    sq = jnp.zeros((1,), jnp.float32)
    n_pad = int(xs16.shape[0])
    floor_s = roofline_batch_seconds(
        bytes_read=n_pad * matrix.dim_pad * 2,
        mxu_ops=2.0 * batch * n_pad * matrix.dim_pad, dtype="bf16",
    )
    if floor_s:
        log(f"# roofline: {batch / floor_s:,.0f} QPS")

    orig_make, orig_tiles = ft._make_kernel, ft._tile_rows

    def fn(qb, a16, a32):
        return ft.fused_topk(a16, a32, qb, n_valid, sq, k=k)[1]

    results = []
    try:
        for kernel_name, make in (
            ("shipped", orig_make), ("onepass", _make_kernel_onepass),
            ("lastmask", _make_kernel_lastmask),
        ):
            ft._make_kernel = make
            for tile in (int(t) for t in args.tiles.split(",") if t):
                ft._tile_rows = lambda _d, _b=None, _t=tile: _t
                ft._bucket_scores.clear_cache()
                ft.fused_topk.clear_cache()
                try:
                    qps, diag = timed_scan_qps(
                        fn, batch=batch, d=d, dim_pad=matrix.dim_pad,
                        rounds=args.rounds, operands=(xs16, xs32),
                    )
                    ids = np.asarray(fn(qs_pad, xs16, xs32))
                    rec = _recall(ids, oracle, k)
                except Exception as exc:  # noqa: BLE001
                    log(f"# {kernel_name} tile={tile}: FAILED {exc!r}")
                    continue
                row = {
                    "kernel": kernel_name, "tile_rows": tile,
                    "qps": round(qps, 1), "recall_at_10": round(rec, 4),
                    "per_batch_ms": diag["per_batch_ms_samples"],
                }
                results.append(row)
                log(f"# {kernel_name} tile={tile}: {qps:,.0f} QPS "
                    f"recall {rec:.4f}")
    finally:
        ft._make_kernel, ft._tile_rows = orig_make, orig_tiles
        ft._bucket_scores.clear_cache()
        ft.fused_topk.clear_cache()

    import json

    print(json.dumps({
        "metric": f"onepass kernel sweep (N={n}, d={d}, batch={batch})",
        "roofline_qps": round(batch / floor_s, 1) if floor_s else None,
        "variants": results,
    }))


if __name__ == "__main__":
    main()

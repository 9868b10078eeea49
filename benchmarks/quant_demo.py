"""int8/int4 quantized-residency demonstration at beyond-exact-HBM scale.

Workload: N x 128-d clustered corpus whose exact tier (bf16+f32,
6 bytes/dim) exceeds the declared HBM budget while the int8 tier
(1 byte/dim + 4/row) fits.  Measures coarse+re-rank QPS and recall@10
against a blocked exact-scan oracle — the direct comparison point for
the round-2 host-IVF tier (BENCH_NOTES: ~3.8k QPS/host projected at
recall 0.998, 416 MB streamed per batch).  The int8 tier streams
nothing: the matrix is resident.

Reproduce: python benchmarks/quant_demo.py --n 10000000 --queries 256
(add ``--bits 4`` for the packed int4 rung — 0.5 bytes/dim resident,
fused Pallas kernel on TPU, 32x-k candidate re-rank)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--bits", type=int, default=8, choices=(8, 4))
    ap.add_argument(
        "--cache", default=None,
        help="path to an .npy corpus cache (created when absent) so the "
             "expensive synthesis can run in a separate invocation",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from helix_tpu.native import rerank as native_rerank
    from helix_tpu.ops.distance import PackedMatrix
    from helix_tpu.ops.quant import int8_coarse_topk, quantize_rows
    from helix_tpu.ops.quant4 import (
        int4_coarse_topk, int4_fused_coarse, quantize_rows_int4,
    )

    n, d, b, k = args.n, args.d, args.queries, args.k
    rng = np.random.default_rng(7)
    n_clusters = 1000
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    chunk = 1_000_000
    mat = PackedMatrix(d, "cosine")
    import os

    t_gen = time.perf_counter()
    if args.cache and os.path.exists(args.cache):
        print(f"# adopting corpus cache {args.cache}...", file=sys.stderr, flush=True)
        if args.cache.endswith(".dat"):
            # raw float32 memmap [n, d], rows pre-normalized: adopt it
            # as the packed matrix directly (d == dim_pad == 128), no
            # 5 GB repack/renormalize pass
            assert d == mat.dim_pad, "dat cache requires d == dim_pad"
            mm = np.memmap(args.cache, dtype=np.float32, mode="r",
                           shape=(n, d))
            mat.data = mm
            mat.sq_norms = np.ones(n, np.float32)
            mat.n = n
            mat.capacity = n
            mat.version += 1
        else:
            mat.extend(np.load(args.cache, mmap_mode="r"))
    else:
        print(f"# generating {n}x{d} clustered corpus...", file=sys.stderr, flush=True)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            assign = rng.integers(0, n_clusters, size=e - s)
            block = centers[assign] + 0.3 * rng.normal(
                size=(e - s, d)
            ).astype(np.float32)
            block /= np.linalg.norm(block, axis=1, keepdims=True) + 1e-9
            mat.extend(block)
        if args.cache:
            np.save(args.cache, mat.data[: mat.n, :d])
            print(f"# cached corpus at {args.cache}", file=sys.stderr, flush=True)
    print(f"# corpus ready in {time.perf_counter() - t_gen:.0f}s",
          file=sys.stderr, flush=True)

    qs = centers[rng.integers(0, n_clusters, size=b)] + 0.3 * rng.normal(
        size=(b, d)
    ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    qs_pad = mat.prepare_queries(qs)

    exact_gb = mat.n * mat.dim_pad * 6 / (1 << 30)
    int8_gb = mat.n * (mat.dim_pad + 4) / (1 << 30)
    int4_gb = mat.n * (mat.dim_pad // 2 + 4) / (1 << 30)
    print(
        f"# residency: exact {exact_gb:.1f} GB, int8 {int8_gb:.2f} GB, "
        f"int4 {int4_gb:.2f} GB",
        file=sys.stderr, flush=True,
    )

    use_fused = jax.default_backend() == "tpu"
    print(f"# quantizing + uploading int{args.bits} matrix...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    # Quantize in 1M-row chunks: one monolithic numpy pass over a 5 GB
    # corpus churns five 5 GB temporaries and thrashes for 10+ minutes
    # on this box; chunked it is ~150 s (BENCH_NOTES int4 staging note).
    perm = None
    if args.bits == 4:
        rows_n = mat.n
        if use_fused:
            from helix_tpu.ops.fused_topk import pad_rows_for_fused

            rows_n = pad_rows_for_fused(mat.n)
        qfn = quantize_rows_int4
        k_cand = max(32 * k, 256)
    else:
        rows_n = mat.n
        qfn = quantize_rows
        k_cand = max(8 * k, 64)
    if args.bits == 4 and use_fused:
        # serving mirror: scale-sorted per-bucket quantization
        # (chunks internally; ops/quant4.quantize_rows_int4_bucketed)
        from helix_tpu.ops.quant4 import quantize_rows_int4_bucketed

        values, bsc_np, scales, perm = quantize_rows_int4_bucketed(
            mat._rows_view(mat.data, rows_n), n_live=mat.n, chunk=chunk,
        )
        sc = jnp.asarray(bsc_np)
    else:
        vparts, sparts = [], []
        for s0 in range(0, mat.n, chunk):
            e0 = min(mat.n, s0 + chunk)
            vp, sp = qfn(np.asarray(mat.data[s0:e0]))
            vparts.append(vp)
            sparts.append(sp)
        if rows_n > mat.n:
            pad_rows = np.zeros((rows_n - mat.n, mat.dim_pad), np.float32)
            vp, sp = qfn(pad_rows)
            vparts.append(vp)
            sparts.append(sp)
        values = np.concatenate(vparts)
        scales = np.concatenate(sparts)
        del vparts, sparts
        sc = jnp.asarray(scales)
    xs_q = PackedMatrix._upload(values)
    sq = jnp.asarray(mat.sq_norms[: len(values)])
    jax.block_until_ready(xs_q)
    upload_s = time.perf_counter() - t0

    qd = jnp.asarray(qs_pad)

    def coarse():
        if args.bits == 4:
            if use_fused:
                return int4_fused_coarse(
                    xs_q, sc, qd, jnp.int32(mat.n), k=k_cand
                )
            return int4_coarse_topk(
                xs_q, sc, qd, jnp.int32(mat.n), sq, k=k_cand
            )
        return int8_coarse_topk(xs_q, sc, qd, jnp.int32(mat.n), sq, k=k_cand)

    _, cand = coarse()
    jax.block_until_ready(cand)

    # Coarse-phase throughput: dispatch loop, one block at the end
    # (the bench.py measurement pattern).
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        _, cand = coarse()
    jax.block_until_ready(cand)
    coarse_ms = (time.perf_counter() - t0) / args.rounds * 1000

    # Full tier: coarse + exact f32 host re-rank.
    t0 = time.perf_counter()
    cand_h = np.asarray(cand, np.int64)
    if perm is not None:   # sorted positions -> original rows
        cand_h = perm[np.clip(cand_h, 0, len(perm) - 1)]
    cand_h = np.where(cand_h < mat.n, cand_h, -1)
    dists, pos = native_rerank(
        mat.data[: mat.n], mat.sq_norms[: mat.n], qs_pad, cand_h, k, "cosine"
    )
    rerank_ms = (time.perf_counter() - t0) * 1000
    qps = b / ((coarse_ms + rerank_ms) / 1000)

    print("# oracle (blocked exact scan on host)...", file=sys.stderr, flush=True)
    oracle = np.zeros((b, k), np.int64)
    best = np.full((b, 0), 0.0)
    best_i = np.zeros((b, 0), np.int64)
    for s in range(0, mat.n, chunk):
        e = min(mat.n, s + chunk)
        sims = qs_pad @ mat.data[s:e].T
        ci = np.argsort(-sims, axis=1)[:, : k]
        cs = np.take_along_axis(sims, ci, axis=1)
        best = np.concatenate([best, cs], axis=1)
        best_i = np.concatenate([best_i, ci + s], axis=1)
        keep = np.argsort(-best, axis=1)[:, : k]
        best = np.take_along_axis(best, keep, axis=1)
        best_i = np.take_along_axis(best_i, keep, axis=1)
    oracle = best_i

    recall = float(np.mean([
        len(set(pos[i][pos[i] >= 0]) & set(oracle[i])) / k for i in range(b)
    ]))

    import json

    print(json.dumps({
        "metric": f"int{args.bits} residency tier QPS (N={n}, d={d}, k={k})",
        "value": round(qps, 1),
        "unit": "QPS",
        "recall_at_10": round(recall, 4),
        "coarse_ms_per_batch": round(coarse_ms, 3),
        "rerank_ms_per_batch": round(rerank_ms, 3),
        "quantize_upload_s": round(upload_s, 2),
        "exact_residency_gb": round(exact_gb, 2),
        "int8_residency_gb": round(int8_gb, 2),
        "int4_residency_gb": round(int4_gb, 2),
        "bits": args.bits,
        "fused": bool(use_fused and args.bits == 4),
        "k_cand": k_cand,
        "batch": b,
    }))


if __name__ == "__main__":
    main()

"""Beyond-HBM tier demonstration: recall + throughput at a corpus size
that CANNOT be exact-scanned within the stated HBM budget.

The exact serving tier needs ~6 bytes/dim resident (f32 + bf16 copies,
``ops/distance.py`` PackedMatrix); at N=10M x 128 that is ~7.7 GB — over
the 2 GB budget this demo declares, so the engine's partition gate
(``Partition._use_host_ivf``) routes search to the host-resident IVF
tier (``ops/ivf.py HostIVFIndex``): corpus in host RAM, centroids on
device, per-batch union-of-cells streamed through HBM for an MXU exact
scan of the candidates.

Run:  python benchmarks/beyond_hbm_demo.py [--n 10000000] [--d 128]
Prints one JSON line per (batch, nprobe) config plus an oracle-checked
recall@10.  Reference knobs: nprobe ~ ef_search, iters ~ ef_construction
(helix-cli/src/config.rs:191-201).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000_000)
    parser.add_argument("--d", type=int, default=128)
    parser.add_argument("--queries", type=int, default=256)
    parser.add_argument("--hbm-budget-gb", type=float, default=2.0)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    from helix_tpu.ops.ivf import HostIVFIndex

    rng = np.random.default_rng(args.seed)
    # clustered data (mixture of gaussians): ANN structure to exploit,
    # the regime IVF exists for — uniform noise would be the worst case
    # for any cell-based index and unrepresentative of embeddings
    n_modes = 1024
    print(f"# generating {args.n}x{args.d} clustered corpus...",
          file=sys.stderr)
    modes = rng.normal(size=(n_modes, args.d)).astype(np.float32)
    data = np.empty((args.n, args.d), np.float32)
    chunk = 1_000_000
    for lo in range(0, args.n, chunk):
        hi = min(args.n, lo + chunk)
        which = rng.integers(0, n_modes, hi - lo)
        data[lo:hi] = modes[which] + 0.35 * rng.normal(
            size=(hi - lo, args.d)
        ).astype(np.float32)
    data /= np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-9)

    resident_bytes = args.n * args.d * 6  # f32 + bf16 device copies
    budget = int(args.hbm_budget_gb * (1 << 30))
    assert resident_bytes > budget, (
        "demo must exceed the exact tier's budget to be meaningful"
    )
    print(f"# exact tier would need {resident_bytes / 1e9:.1f} GB resident "
          f"vs budget {budget / 1e9:.1f} GB -> host-IVF tier",
          file=sys.stderr)

    print("# building host-IVF (sampled k-means + streamed assign)...",
          file=sys.stderr)
    index = HostIVFIndex.build(data, seed=args.seed)
    print(f"# build: {index.build_seconds:.1f}s, "
          f"{len(index.indptr) - 1} cells", file=sys.stderr)

    # harder queries than the corpus: between modes (mixtures) + more
    # noise, so nearest neighbors straddle cell boundaries and nprobe
    # actually matters — queries at mode centers make any cell index
    # look perfect
    mix_a = modes[rng.integers(0, n_modes, args.queries)]
    mix_b = modes[rng.integers(0, n_modes, args.queries)]
    lam = rng.uniform(0.3, 0.7, (args.queries, 1)).astype(np.float32)
    queries = (
        lam * mix_a + (1 - lam) * mix_b
        + 0.5 * rng.normal(size=(args.queries, args.d)).astype(np.float32)
    )
    queries /= np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-9)
    k = 10

    print("# exact oracle (blocked host scan)...", file=sys.stderr)
    oracle = np.empty((args.queries, k), np.int64)
    best = np.full((args.queries, k), -np.inf, np.float32)
    bidx = np.zeros((args.queries, k), np.int64)
    for lo in range(0, args.n, chunk):
        hi = min(args.n, lo + chunk)
        sims = queries @ data[lo:hi].T
        merged = np.concatenate([best, sims], axis=1)
        midx = np.concatenate(
            [bidx, np.broadcast_to(np.arange(lo, hi), sims.shape)], axis=1
        )
        top = np.argpartition(merged, -k, axis=1)[:, -k:]
        best = np.take_along_axis(merged, top, axis=1)
        bidx = np.take_along_axis(midx, top, axis=1)
    order = np.argsort(-best, axis=1)
    oracle = np.take_along_axis(bidx, order, axis=1)

    results = []
    for nprobe in (4, 8, 16, 32):
        # warm with the SAME shapes (block-width buckets compile per
        # shape), then measure a steady-state search
        index.search(queries, k, nprobe=nprobe)
        t0 = time.perf_counter()
        dists, rows = index.search(queries, k, nprobe=nprobe)
        elapsed = time.perf_counter() - t0
        hit = np.mean([
            len(set(rows[i, :k]) & set(oracle[i])) / k
            for i in range(args.queries)
        ])
        streamed = getattr(index, "last_streamed_bytes", 0)
        out = {
            "tier": "host-ivf",
            "n": args.n, "d": args.d, "batch": args.queries,
            "nprobe": nprobe,
            "recall_at_10": round(float(hit), 4),
            "qps": round(args.queries / elapsed, 1),
            "batch_ms": round(elapsed * 1000, 1),
            # the tier's real cost model: bytes streamed through HBM per
            # batch; wall numbers on a tunneled dev chip are H2D-link
            # bound, production projection = streamed_mb / PCIe rate
            "streamed_mb_per_batch": round(streamed / 1e6, 1),
            "corpus_fraction_scanned": round(streamed / (args.n * args.d * 4), 4),
        }
        results.append(out)
        print(json.dumps(out))

    best_ok = [r for r in results if r["recall_at_10"] >= 0.9]
    assert best_ok, f"no config reached recall 0.9: {results}"
    print(f"# PASS: recall>=0.9 at nprobe={best_ok[0]['nprobe']} "
          f"({best_ok[0]['qps']} QPS)", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Headline benchmark: SIFT1M-class vector search QPS/chip at recall@10.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``

Workload (BASELINE.md configs[0]): 1M x 128-d vectors (synthetic,
SIFT-shaped), cosine metric, k=10, batched queries.  The engine's exact
MXU search scans the full matrix per batch, so measured recall@10 vs a
float32 NumPy oracle is ~1.0 (any loss comes from bfloat16 matmul
rounding); the recall gate (>=0.95) is asserted, not assumed.

``vs_baseline``: the reference engine publishes no numbers and its binary
is a closed container image (BASELINE.md), so the baseline is the
BASELINE.json north-star comparison point — reference-class CPU HNSW
throughput at recall@10>=0.95 on SIFT1M, taken as 10,000 QPS (typical
published single-node figure for m=16/ef_search-tuned HNSW at 0.95
recall).  vs_baseline = measured QPS / 10,000.

Env overrides: BENCH_N, BENCH_D, BENCH_BATCH, BENCH_ROUNDS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ASSUMED_CPU_HNSW_QPS = 10_000.0


def main() -> None:
    import jax

    backend = jax.default_backend()
    n = int(os.environ.get("BENCH_N", 1_000_000 if backend == "tpu" else 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    rounds = int(os.environ.get("BENCH_ROUNDS", 20))
    k = 10

    rng = np.random.default_rng(42)
    print(f"# generating {n}x{d} dataset...", file=sys.stderr)
    # SIFT-shaped synthetic data: clustered, non-uniform.
    n_clusters = 1000
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    data = centers[assign] + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True) + 1e-9

    # Several distinct query batches: identical dispatches can be served
    # from caches under the axon tunnel, which fakes throughput numbers.
    n_batches = 8
    all_queries = centers[
        rng.integers(0, n_clusters, size=batch * n_batches)
    ] + 0.3 * rng.normal(size=(batch * n_batches, d)).astype(np.float32)
    all_queries /= np.linalg.norm(all_queries, axis=1, keepdims=True) + 1e-9
    all_queries = all_queries.astype(np.float32)
    queries = all_queries[:batch]

    from helix_tpu.ops.distance import topk_scores

    import jax.numpy as jnp

    xs = jnp.asarray(data)
    sq = jnp.sum(xs * xs, axis=1)
    query_batches = [
        jnp.asarray(all_queries[i * batch:(i + 1) * batch])
        for i in range(n_batches)
    ]
    n_valid = jnp.int32(n)
    chunk = min(131072, n)

    print(f"# compiling + warmup on {backend}...", file=sys.stderr)
    dists, idx = topk_scores(
        xs, query_batches[0], n_valid, sq, k=k, chunk=chunk, metric="cosine"
    )
    jax.block_until_ready((dists, idx))

    # Recall@10 vs float32 NumPy oracle on a query sample.
    sample = min(64, batch)
    sims = queries[:sample] @ data.T
    oracle = np.argsort(-sims, axis=1)[:, :k]
    got = np.asarray(idx)[:sample]
    recall = float(
        np.mean([len(set(got[i]) & set(oracle[i])) / k for i in range(sample)])
    )

    print(f"# timing {rounds} rounds of {batch} queries...", file=sys.stderr)
    start = time.perf_counter()
    for r in range(rounds):
        dists, idx = topk_scores(
            xs, query_batches[r % n_batches], n_valid, sq,
            k=k, chunk=chunk, metric="cosine",
        )
    jax.block_until_ready((dists, idx))
    elapsed = time.perf_counter() - start
    qps = rounds * batch / elapsed

    result = {
        "metric": f"vector search QPS/chip (N={n}, d={d}, k=10, exact, recall@10={recall:.4f})",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / ASSUMED_CPU_HNSW_QPS, 2),
        "recall_at_10": round(recall, 4),
        "backend": backend,
        "batch": batch,
        "p50_batch_ms": round(elapsed / rounds * 1000, 2),
    }
    assert recall >= 0.95, f"recall gate failed: {recall}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()

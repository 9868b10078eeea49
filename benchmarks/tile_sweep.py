"""Fused-kernel row-tile sweep: find the VMEM-overlap sweet spot.

Hypothesis (round-4): at batch 256 the f32 score tile of the fused
bf16 kernel is ``tile_rows x 256 x 4`` bytes — 8 MB at the current
8192-row tile — which leaves no VMEM for double-buffered matrix tiles,
so the HBM read serializes with the MXU and the scan runs at
read+compute (~0.68 ms/batch at 1M x 128) instead of
max(read, compute) (~0.34 ms).  This sweeps tile_rows and measures the
kernel via the cache-proof scan harness.

Usage: python benchmarks/tile_sweep.py [--n 1000000] [--d 128]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--tiles", default="8192,4096,2048,1024")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.roofline import roofline_batch_seconds, timed_scan_qps
    import helix_tpu.ops.fused_topk as ft
    from helix_tpu.ops.distance import PackedMatrix

    rng = np.random.default_rng(42)
    n, d, batch = args.n, args.d, args.batch
    print(f"# corpus {n}x{d}...", file=sys.stderr, flush=True)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True) + 1e-9
    matrix = PackedMatrix(d, "cosine")
    matrix.extend(data)
    xs16, _sq_dev = matrix.device_arrays()
    xs32 = matrix.data_device()
    jax.block_until_ready(xs16)
    n_pad = int(xs16.shape[0])
    n_valid = jnp.int32(matrix.n)
    sq = jnp.zeros((1,), jnp.float32)

    floor_s = roofline_batch_seconds(
        bytes_read=n_pad * matrix.dim_pad * 2,
        mxu_ops=2.0 * batch * n_pad * matrix.dim_pad, dtype="bf16",
    )
    if floor_s:
        print(f"# roofline: {floor_s * 1e3:.3f} ms/batch "
              f"({batch / floor_s:,.0f} QPS)", file=sys.stderr, flush=True)

    orig = ft._tile_rows
    for tile in (int(t) for t in args.tiles.split(",")):
        ft._tile_rows = lambda _d, _b=None, _t=tile: _t
        ft._bucket_scores.clear_cache()

        def fn(qb, a16, a32):
            dists, idx = ft.fused_topk(
                a16, a32, qb, n_valid, sq, k=10
            )
            return idx

        try:
            qps, diag = timed_scan_qps(
                fn, batch=batch, d=d, dim_pad=matrix.dim_pad,
                rounds=32, operands=(xs16, xs32),
            )
            print(f"tile={tile}: {batch / qps * 1e3:.3f} ms/batch  "
                  f"{qps:,.0f} QPS  samples={diag['per_batch_ms_samples']}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"tile={tile}: FAILED {exc!r}", flush=True)
    ft._tile_rows = orig


if __name__ == "__main__":
    main()

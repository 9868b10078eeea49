"""Exact-rung coarse-phase sweep: close the 43%-of-roofline gap.

BENCH_r04 measured the headline exact tier (``topk_resident``) at
329k QPS = 43% of the 764k HBM roofline at 1M x 128 / batch 256.  The
suspect is the single-shot coarse phase: it materializes the full
[B, N] bfloat16 score buffer (512 MB at 1M x 256) in HBM before
``approx_max_k`` reads it back — up to 1 GB of avoidable traffic on
top of the 256 MB matrix read.

This harness times the serving batch (coarse + exact f32 device
re-rank, identical contract to ``topk_resident``) under alternative
coarse phases on one corpus:

- ``single``   — the shipped single-shot bf16 selection path
- ``chunk:<C>`` — a ``lax.scan`` over row blocks of C: the [B, C]
  score tile is sized to stay in VMEM, so XLA can fuse
  matmul -> mask -> approx_max_k without an HBM round trip for
  scores; running top-k merge in f32 between blocks

Uses the same cache-proof ``timed_scan_qps`` methodology as the
ladder (never-repeated device-RNG stacks, two-point differencing).

Usage: ``python benchmarks/exact_sweep.py [--n 1000000] [--batch 256]``
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=64)
    ap.add_argument(
        "--chunks", default="8192,16384,32768,65536,131072,262144",
    )
    ap.add_argument(
        "--int8", action="store_true",
        help="also sweep an int8 chunked-XLA coarse phase against the "
             "shipped fused Pallas int8 kernel",
    )
    args = ap.parse_args()
    n, d, batch, k = args.n, args.d, args.batch, args.k

    import jax
    import jax.numpy as jnp

    from benchmarks.ladder import _corpus, _oracle, _recall
    from benchmarks.roofline import roofline_batch_seconds, timed_scan_qps
    from helix_tpu.ops.distance import (
        PackedMatrix, resident_topk_auto, topk_resident,
    )

    log = lambda m: print(m, file=sys.stderr, flush=True)  # noqa: E731
    log(f"# exact sweep: N={n} d={d} batch={batch} "
        f"backend={jax.default_backend()}")
    data, queries = _corpus(n, d, batch, 1)
    matrix = PackedMatrix(d, "cosine")
    matrix.extend(data)
    xs16, sq = matrix.device_arrays()
    xs32 = matrix.data_device()
    jax.block_until_ready(xs16)
    oracle = _oracle(data, queries[:batch], k)
    qs_pad = jnp.asarray(matrix.prepare_queries(queries[:batch]))
    dim_pad = matrix.dim_pad
    n_valid = jnp.int32(matrix.n)
    k_scan = min(max(k, 8 * k), n)
    floor = roofline_batch_seconds(
        bytes_read=int(xs16.shape[0]) * dim_pad * 2,
        mxu_ops=2.0 * batch * int(xs16.shape[0]) * dim_pad, dtype="bf16",
    )
    rows = []

    def rerank(best_s, best_i, a32, qs):
        cand = jnp.take(a32, best_i, axis=0)
        exact = jnp.einsum(
            "bkd,bd->bk", cand, qs, preferred_element_type=jnp.float32
        )
        exact = jnp.where(jnp.isfinite(best_s), exact, -jnp.inf)
        top, pos = jax.lax.top_k(exact, k)
        return jnp.take_along_axis(best_i, pos, axis=1)

    # -- shipped paths (reference points) --------------------------------
    def auto_batch(qb, a16, a32, asq):
        _, idx = resident_topk_auto(
            a16, a32, qb, n_valid, asq, k=k, metric="cosine"
        )
        return idx

    def single_batch(qb, a16, a32, asq):
        _, idx = topk_resident(
            a16, a32, qb, n_valid, asq, k=k, metric="cosine"
        )
        return idx

    for name, fn in (
        ("resident_topk_auto (shipped serving)", auto_batch),
        ("single_shot_bf16 (XLA path)", single_batch),
    ):
        qps, diag = timed_scan_qps(
            fn, batch=batch, d=d, dim_pad=dim_pad,
            rounds=args.rounds, operands=(xs16, xs32, sq),
        )
        ids = np.asarray(fn(qs_pad, xs16, xs32, sq))
        rows.append({
            "variant": name,
            "qps": round(qps, 1),
            "recall_at_10": round(_recall(ids, oracle, k), 4),
            "per_batch_ms": diag["per_batch_ms_samples"],
        })
        log(f"# {name}: {qps:,.0f} QPS")

    # -- chunked scan variants ------------------------------------------
    # map each requested target to the largest divisor of the padded row
    # count <= target (same rule as the shipped chunked path)
    from helix_tpu.ops.distance import pick_chunk

    n_pad = int(xs16.shape[0])
    seen: set[int] = set()
    for target in (int(x) for x in args.chunks.split(",") if x):
        c = pick_chunk(n_pad, target)
        if c in seen or c >= n_pad:
            continue
        seen.add(c)

        @functools.partial(jax.jit, static_argnames=("chunk",))
        def chunk_batch(qb, a16, a32, asq, *, chunk=c):
            qb16 = qb.astype(jnp.bfloat16)
            col_base = jnp.arange(chunk, dtype=jnp.int32)

            def body(carry, start):
                cs, ci = carry
                block = jax.lax.dynamic_slice_in_dim(
                    a16, start, chunk, axis=0
                )
                sims = jnp.dot(
                    qb16, block.T, preferred_element_type=jnp.bfloat16
                )
                cols = start + col_base
                sims = jnp.where(
                    (cols < n_valid)[None, :], sims, jnp.bfloat16(-3.0e38)
                )
                s16, i_local = jax.lax.approx_max_k(
                    sims, k_scan, recall_target=0.99
                )
                s_chunk = s16.astype(jnp.float32)
                s_chunk = jnp.where(s_chunk <= -1e38, -jnp.inf, s_chunk)
                cat_s = jnp.concatenate([cs, s_chunk], axis=1)
                cat_i = jnp.concatenate([ci, cols[i_local]], axis=1)
                new_s, pos = jax.lax.top_k(cat_s, k_scan)
                return (
                    new_s, jnp.take_along_axis(cat_i, pos, axis=1)
                ), None

            init = (
                jnp.full((batch, k_scan), -jnp.inf, jnp.float32),
                jnp.zeros((batch, k_scan), jnp.int32),
            )
            starts = jnp.arange(n_pad // chunk, dtype=jnp.int32) * chunk
            (best_s, best_i), _ = jax.lax.scan(body, init, starts)
            return rerank(best_s, best_i, a32, qb)

        try:
            qps, diag = timed_scan_qps(
                chunk_batch, batch=batch, d=d, dim_pad=dim_pad,
                rounds=args.rounds, operands=(xs16, xs32, sq),
            )
            ids = np.asarray(chunk_batch(qs_pad, xs16, xs32, sq))
        except Exception as exc:  # noqa: BLE001 — sweep survives a variant
            log(f"# chunk {c}: failed ({exc!r})")
            continue
        rows.append({
            "variant": f"chunked_bf16 c={c}",
            "qps": round(qps, 1),
            "recall_at_10": round(_recall(ids, oracle, k), 4),
            "per_batch_ms": diag["per_batch_ms_samples"],
        })
        log(f"# chunk {c}: {qps:,.0f} QPS")

    # -- optional int8 coarse comparison ---------------------------------
    if args.int8:
        from helix_tpu.ops.quant import (
            GLOBAL_SCALE, _quantize_queries, int8_coarse_topk,
            int8_fused_coarse, quantize_rows_unit,
        )

        # serving mirror: global-scale codes (ops/quant.py docstring)
        values = quantize_rows_unit(np.asarray(matrix.data[: matrix.n]))
        if n_pad > matrix.n:
            values = np.concatenate([
                values, np.zeros((n_pad - matrix.n, dim_pad), np.int8),
            ])
        scales = np.full(n_pad, GLOBAL_SCALE, np.float32)
        xs_i8 = PackedMatrix._upload(values)
        sc = jnp.asarray(scales)
        sqq = jnp.zeros((1,), jnp.float32)
        jax.block_until_ready(xs_i8)
        k_cand = min(max(k, 8 * k), n)

        def fused_i8(qb, a_q, a_sc):
            del a_sc
            return int8_fused_coarse(
                a_q, qb, jnp.int32(matrix.n), k=k_cand
            )[1]

        def xla_i8(qb, a_q, a_sc, a_sq):
            return int8_coarse_topk(
                a_q, a_sc, qb, jnp.int32(matrix.n), a_sq, k=k_cand
            )[1]

        @functools.partial(jax.jit, static_argnames=("chunk",))
        def chunk_i8(qb, a_q, a_sc, *, chunk):
            q_i8, q_scales = _quantize_queries(qb)
            col_base = jnp.arange(chunk, dtype=jnp.int32)

            def body(carry, start):
                cs, ci = carry
                block = jax.lax.dynamic_slice_in_dim(a_q, start, chunk, 0)
                bsc = jax.lax.dynamic_slice_in_dim(a_sc, start, chunk, 0)
                dots = jax.lax.dot_general(
                    q_i8, block,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                sims = (
                    dots.astype(jnp.float32)
                    * q_scales[:, None] * bsc[None, :]
                )
                cols = start + col_base
                sims = jnp.where((cols < n_valid)[None, :], sims, -jnp.inf)
                s_chunk, i_local = jax.lax.approx_max_k(
                    sims, k_cand, recall_target=0.99
                )
                cat_s = jnp.concatenate([cs, s_chunk], axis=1)
                cat_i = jnp.concatenate([ci, cols[i_local]], axis=1)
                new_s, pos = jax.lax.top_k(cat_s, k_cand)
                return (
                    new_s, jnp.take_along_axis(cat_i, pos, axis=1)
                ), None

            init = (
                jnp.full((batch, k_cand), -jnp.inf, jnp.float32),
                jnp.zeros((batch, k_cand), jnp.int32),
            )
            starts = jnp.arange(n_pad // chunk, dtype=jnp.int32) * chunk
            (_, best_i), _ = jax.lax.scan(body, init, starts)
            return best_i

        i8_variants = []
        if jax.default_backend() == "tpu":
            i8_variants.append(
                ("int8_fused_pallas (shipped)", fused_i8, (xs_i8, sc))
            )
        i8_variants.append(
            ("int8_single_shot_xla", xla_i8, (xs_i8, sc, sqq))
        )
        for c in sorted(seen):
            i8_variants.append((
                f"int8_chunked_xla c={c}",
                functools.partial(chunk_i8, chunk=c),
                (xs_i8, sc),
            ))
        for name, fn, ops in i8_variants:
            try:
                qps, diag = timed_scan_qps(
                    fn, batch=batch, d=d, dim_pad=dim_pad,
                    rounds=args.rounds, operands=ops,
                )
                cand = np.asarray(fn(qs_pad, *ops), np.int64)
            except Exception as exc:  # noqa: BLE001
                log(f"# {name}: failed ({exc!r})")
                continue
            cand = np.where(cand < matrix.n, cand, -1)
            rows.append({
                "variant": f"{name} (coarse-only, k_cand={k_cand})",
                "qps": round(qps, 1),
                "coarse_recall_at_10": round(_recall(cand, oracle, k), 4),
                "per_batch_ms": diag["per_batch_ms_samples"],
            })
            log(f"# {name}: {qps:,.0f} QPS")

    out = {
        "metric": f"exact coarse sweep (N={n}, d={d}, batch={batch}, "
                  f"k={k}, k_scan={k_scan})",
        "roofline_qps": round(batch / floor, 1) if floor else None,
        "variants": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Honest per-primitive decomposition of the adaptive device 2-hop.

Round-5 follow-up to the scan-chained bench timing (bench.py), which
measured the adaptive ``khop_count`` at ~45 ms/2-hop where round 3's
dispatch-loop methodology had claimed 0.21 ms.  The dispatch loop's
``block_until_ready`` returns on the tunnel's submission ack, so a
chain of independent dispatches overlaps compute and measures
submission throughput, not kernel latency — the same artifact the
round-4 roofline work caught inflating the ladder's exact rung 4x.

This harness times each primitive of the adaptive hop the honest way:
R-vs-R/2 differenced ``lax.scan`` chains with a REAL data dependency
between iterations (the previous result perturbs the next input), so
neither the dispatch cache nor submission overlap can hide work.

Pieces timed at 1M nodes / 16M padded edges (P=16):
  compact4096   top_k(masked iota, 4096) — hop-1 frontier compaction
  compact65536  top_k(masked iota, 65536) — hop-2 frontier compaction
  gather4096    row gather [4096, P] + label mask
  gather65536   row gather [65536, P]
  scatter65536  scatter of a [4096, P] target block into an N-mask
  scatter1M     scatter of a [65536, P] target block into an N-mask
  dense_hop     the dense fallback (reads all rows, scatters N*P)
  full_2hop     the shipped khop_count (compact -> compact tiers)

Usage: python benchmarks/traversal_decomp.py [--n 1000000] [--deg 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def chained_ms(fn, seed_val, rounds: int = 8) -> float:
    """Median-of-3 R-vs-R/2 differenced scan chain around ``fn``.

    ``fn(carry_scalar) -> scalar`` must consume the carry (data
    dependency) and return a scalar derived from its real work.
    """
    import jax
    import jax.numpy as jnp

    def chain(r):
        def body(carry, _):
            out = fn(carry)
            return out.astype(jnp.int32), out
        c, _ = jax.lax.scan(body, jnp.int32(seed_val), None, length=r)
        return c

    full = jax.jit(lambda: chain(rounds))
    half = jax.jit(lambda: chain(rounds // 2))
    jax.block_until_ready(full())
    jax.block_until_ready(half())
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(full())
        t_full = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(half())
        t_half = time.perf_counter() - t0
        samples.append(max(t_full - t_half, 0.0) / (rounds // 2) * 1000)
    return sorted(samples)[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from helix_tpu.ops.csr import PaddedGraph, khop_count

    n, deg = args.n, args.deg
    rng = np.random.default_rng(0)
    edge_dst = rng.integers(0, n, size=n * deg).astype(np.int32)
    indptr = np.arange(n + 1, dtype=np.int64) * deg
    edge_lab = rng.integers(0, 4, size=n * deg).astype(np.int32)
    padded = PaddedGraph.from_csr(indptr, edge_dst, edge_lab, n)
    neighbors, labels = padded.neighbors, padded.edge_labels
    p = neighbors.shape[1]
    keep = jnp.asarray(rng.random(n) < 0.5)
    start = jnp.asarray(rng.random(n) < 0.001)
    label_code = jnp.int32(1)

    iota = jnp.arange(n, dtype=jnp.int32)
    out = {}

    def mask_from(carry):
        # perturb one slot per iteration off the fixed start mask: a
        # real dependency the compiler cannot hoist out of the chain
        return start ^ (iota == (carry & (n - 1) if (n & (n - 1)) == 0
                                 else carry % n))

    def time_piece(name, fn):
        out[name] = round(chained_ms(fn, 1, args.rounds), 3)
        print(f"# {name}: {out[name]} ms", file=sys.stderr, flush=True)

    # --- frontier compaction (top_k over masked iota) ----------------
    for kk in (4096, 65536):
        def compact(carry, kk=kk):
            m = mask_from(carry)
            score = jnp.where(m, iota, -1)
            v, _ = jax.lax.top_k(score, kk)
            return jnp.sum(v >= 0)
        time_piece(f"compact{kk}", compact)

    # --- row gather + label mask -------------------------------------
    for kk in (4096, 65536):
        def gather(carry, kk=kk):
            idx = (jnp.arange(kk, dtype=jnp.int32) * 7919 + carry) % n
            rows = jnp.take(neighbors, idx, axis=0, mode="clip")
            labs = jnp.take(labels, idx, axis=0, mode="clip")
            ok = jnp.logical_or(label_code < 0, labs == label_code)
            return jnp.sum(jnp.where(ok, rows, 0) & 1)
        time_piece(f"gather{kk}", gather)

    # --- scatter into an N-mask --------------------------------------
    for kk in (4096, 65536):
        def scatter(carry, kk=kk):
            idx = (jnp.arange(kk, dtype=jnp.int32) * 7919 + carry) % n
            rows = jnp.take(neighbors, idx, axis=0, mode="clip")
            m = jnp.zeros(n + 1, bool).at[rows.reshape(-1)].set(True)[:n]
            return jnp.sum(m)
        time_piece(f"scatter_from_{kk}x{p}", scatter)

    # --- dense fallback hop -------------------------------------------
    def dense(carry):
        m = mask_from(carry)
        live = m[:, None]
        ok = jnp.logical_or(label_code < 0, labels == label_code)
        targets = jnp.where(live & ok, neighbors, n)
        nm = jnp.zeros(n + 1, bool).at[targets.reshape(-1)].set(True)[:n]
        return jnp.sum(nm)
    time_piece("dense_hop", dense)

    # --- the shipped adaptive 2-hop ------------------------------------
    def full(carry):
        m = mask_from(carry)
        return khop_count(neighbors, labels, m, label_code, 2, keep)
    time_piece("full_2hop", full)

    print(json.dumps({
        "metric": f"adaptive-2hop decomposition (N={n}, P={p})",
        "backend": jax.default_backend(),
        "pieces_ms": out,
    }))


if __name__ == "__main__":
    main()

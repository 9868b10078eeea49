"""Build + measure the CPU HNSW baseline over the LADDER corpus.

Round-4 verdict ("What's missing" #4): the beyond-HBM ladder rungs at
10M (``LADDER_r04_10M.json``) had no reference comparison point at
their own scale — ``vs_baseline`` was measured at 1M only.  This
script builds (once, cached under ``.bench_cache/``) a reference-class
CPU HNSW (m=16, ef_construction=128 — the reference's own defaults,
``/root/reference/helix-cli/src/config.rs:191-201``) over the exact
corpus ``benchmarks/ladder.py`` serves from the TPU, walks the
ef_search ladder to recall@10 >= 0.95 against the ladder's own oracle,
and records the measurement in ``BASELINE_MEASURED.json`` under the
key ``ladder:{n}x{d}`` for ``ladder.py`` to pick up as each rung's
``vs_baseline`` denominator.

Usage: ``python benchmarks/build_ladder_baseline.py --n 10000000``
(a 10M single-core build takes hours; it runs once and is cached).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks.cpu_hnsw import measure_baseline  # noqa: E402
from benchmarks.ladder import _corpus, _oracle  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


def record_measurement(key: str, measured: dict) -> None:
    committed = REPO / "BASELINE_MEASURED.json"
    try:
        records = json.loads(committed.read_text())
        if "qps" in records:  # legacy single-record file
            records = {}
    except (OSError, ValueError):
        records = {}
    record = dict(measured)
    record["measured_at"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
    )
    records[key] = record
    committed.write_text(json.dumps(records, indent=1))


def ladder_baseline(n: int, d: int = 128, batch: int = 256,
                    rounds: int = 8, k: int = 10, allow_build: bool = True,
                    log=print) -> dict | None:
    """Measure (or load-and-measure) the CPU HNSW baseline for the
    ladder corpus at scale ``n``.  Returns the measurement dict or None
    when no cached index exists and builds are disallowed."""
    log(f"# generating ladder corpus N={n} d={d} (seed 42)...")
    data, queries = _corpus(n, d, batch, max(4, rounds))
    log("# oracle (blocked exact host scan) over the first batch...")
    oracle = _oracle(data, queries[:batch], k)
    measured = measure_baseline(
        data, queries[:batch], oracle,
        cache_dir=REPO / ".bench_cache",
        k=k, allow_build=allow_build, log=log, cache_tag="ladder",
    )
    if measured is not None:
        measured["corpus"] = "ladder"
        measured["source"] = "measured"
        record_measurement(f"ladder:{n}x{d}", measured)
    return measured


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()
    log = lambda m: print(m, file=sys.stderr, flush=True)  # noqa: E731
    measured = ladder_baseline(
        args.n, args.d, args.batch, args.rounds, log=log,
    )
    print(json.dumps(measured))


if __name__ == "__main__":
    main()

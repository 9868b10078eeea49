"""Tests for the CPU HNSW baseline measurement tool.

``bench.py``'s ``vs_baseline`` divides the chip QPS by a *measured*
reference-class CPU HNSW (m=16, ef_construction=128 — the reference's
defaults, ``helix-cli/src/config.rs:191-201``).  These tests pin the
index's correctness at small scale: recall against the brute-force
oracle, save/load fidelity, and the measurement harness contract.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks.cpu_hnsw import CpuHnsw, measure_baseline  # noqa: E402


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    n, d = 8000, 64
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = data[:128] + 0.05 * rng.normal(size=(128, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    oracle = np.argsort(-(queries @ data.T), axis=1)[:, :10]
    return data, queries, oracle


@pytest.fixture(scope="module")
def index(corpus):
    data, _, _ = corpus
    return CpuHnsw.build(data)


def _recall(ids, oracle, k=10):
    return float(np.mean([
        len(set(ids[i]) & set(oracle[i])) / k for i in range(len(oracle))
    ]))


def test_recall_meets_reference_class(index, corpus):
    _, queries, oracle = corpus
    _, ids = index.search(queries, 10, ef=128)
    assert _recall(ids, oracle) >= 0.95


def test_distances_ascending_and_match_metric(index, corpus):
    data, queries, _ = corpus
    dists, ids = index.search(queries[:8], 10, ef=128)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)
    # cosine distance = 1 - dot on normalized vectors
    for qi in range(8):
        for j in range(10):
            want = 1.0 - float(queries[qi] @ data[ids[qi, j]])
            assert abs(float(dists[qi, j]) - want) < 1e-4


def test_save_load_identical_results(index, corpus, tmp_path):
    _, queries, _ = corpus
    path = tmp_path / "idx.bin"
    index.save(path)
    loaded = CpuHnsw.load(path)
    assert loaded is not None and len(loaded) == len(index)
    d1, i1 = index.search(queries[:32], 10, ef=96)
    d2, i2 = loaded.search(queries[:32], 10, ef=96)
    assert np.array_equal(i1, i2)
    assert np.allclose(d1, d2)


def test_load_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"not an index" * 10)
    assert CpuHnsw.load(bad) is None


def test_measure_baseline_contract(corpus, tmp_path):
    data, queries, oracle = corpus
    out = measure_baseline(data, queries, oracle, tmp_path)
    assert out["recall_at_k"] >= 0.95
    assert out["qps"] > 0
    assert out["m"] == 16 and out["ef_construction"] == 128
    assert Path(out["index_cache"]).exists()
    # second call loads the cache (no build_s) and allow_build=False works
    again = measure_baseline(
        data, queries, oracle, tmp_path, allow_build=False
    )
    assert again is not None and again["build_s"] is None
    # no cache + builds disallowed -> None
    assert measure_baseline(
        data, queries, oracle, tmp_path / "empty", allow_build=False
    ) is None

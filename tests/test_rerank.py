"""Native re-rank kernel: exact-output differential vs a NumPy oracle.

Round 4 rewrote ``native/rerank.cpp`` from a per-query random-access
loop to a row-sorted incidence sweep (locality + prefetch + optional
threads).  These tests pin the output contract the engine and the
quantized tiers depend on (``helix_tpu/engine/vector.py``,
``ops/quant.py``): exact f32 scoring, final top-k ascending by
(distance, row id), -1/sentinel padding, duplicate and out-of-range
candidates handled.
"""

import numpy as np
import pytest

from helix_tpu.native import rerank as native_rerank


def _oracle(data, sq_norms, queries, cand, k, metric):
    b, kc = cand.shape
    n = len(data)
    out_i = np.full((b, k), -1, np.int64)
    out_d = np.full((b, k), 3.4e38, np.float32)
    for qi in range(b):
        rows = [int(r) for r in cand[qi] if 0 <= r < n]
        scored = []
        for r in rows:
            s = float(np.dot(data[r], queries[qi]))
            if metric == "l2":
                d = float(sq_norms[r]) - 2.0 * s + float(
                    np.dot(queries[qi], queries[qi])
                )
            else:
                d = 1.0 - s
            scored.append((np.float32(d), r))
        scored.sort(key=lambda t: (t[0], t[1]))
        for j, (d, r) in enumerate(scored[:k]):
            out_d[qi, j] = d
            out_i[qi, j] = r
    return out_d, out_i


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_rerank_matches_oracle(metric):
    rng = np.random.default_rng(5)
    n, d, b, kc, k = 5000, 48, 64, 37, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    sq = (data * data).sum(axis=1).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    cand = rng.integers(0, n, size=(b, kc)).astype(np.int64)
    # pads, duplicates, and out-of-range rows must all be tolerated
    cand[:, 0] = -1
    cand[:, 1] = cand[:, 2]
    cand[0, 3] = n + 17
    dist, idx = native_rerank(data, sq, queries, cand, k, metric)
    odist, oidx = _oracle(data, sq, queries, cand, k, metric)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(dist, odist, rtol=1e-5, atol=1e-5)


def test_rerank_fewer_candidates_than_k():
    rng = np.random.default_rng(6)
    n, d, b, k = 100, 16, 8, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    sq = (data * data).sum(axis=1).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    cand = np.full((b, 4), -1, np.int64)
    cand[:, 0] = 3
    cand[:, 1] = 7
    dist, idx = native_rerank(data, sq, queries, cand, k, "cosine")
    assert (idx[:, 2:] == -1).all()
    assert (idx[:, :2] >= 0).all()
    assert (dist[:, 2:] > 1e37).all()


def test_rerank_threaded_matches_single(monkeypatch):
    """Query-range threading must not change a single output byte."""
    rng = np.random.default_rng(7)
    n, d, b, kc, k = 20000, 32, 512, 21, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    sq = (data * data).sum(axis=1).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    cand = rng.integers(-1, n, size=(b, kc)).astype(np.int64)
    monkeypatch.setenv("HX_RERANK_THREADS", "1")
    d1, i1 = native_rerank(data, sq, queries, cand, k, "cosine")
    monkeypatch.setenv("HX_RERANK_THREADS", "7")
    d7, i7 = native_rerank(data, sq, queries, cand, k, "cosine")
    np.testing.assert_array_equal(i1, i7)
    np.testing.assert_array_equal(d1, d7)

"""Regression tests: tombstoned/short search results must never surface
sentinel positions as bogus hits (round-2 ADVICE finding on
engine/vector.py search_many position clipping)."""

import numpy as np
import pytest

from helix_tpu.engine.vector import Partition


def _vectors(n, d=16, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(n, d)).astype(np.float32)
    xs /= np.linalg.norm(xs, axis=1, keepdims=True)
    return xs


def _fill(part, xs, start_id=1):
    part.add_bulk(list(range(start_id, start_id + len(xs))), xs)


@pytest.mark.parametrize("shard_threshold", [None, 8])
def test_fewer_live_than_k_returns_only_live(shard_threshold):
    # 12 vectors, delete 9 -> only 3 live; k=10 must yield exactly the
    # 3 live ids with finite distances (never id 1 as padding).
    xs = _vectors(12)
    part = Partition("cosine", shard_threshold=shard_threshold)
    _fill(part, xs)
    for el in range(1, 13):
        if el not in (4, 7, 11):
            part.remove(el)
    ids, dists = part.search_many(xs[:2], 10)
    assert ids.shape[0] == 2
    assert ids.shape[1] <= 3
    for row in range(2):
        live_ids = set(ids[row][np.isfinite(dists[row])].tolist())
        assert live_ids <= {4, 7, 11}
        assert len(live_ids) == int(np.isfinite(dists[row]).sum())
    # No sentinel distances leaked as "hits" with a real id.
    assert np.all(ids[~np.isfinite(dists)] == 0)


def test_deleted_ids_never_returned():
    xs = _vectors(64)
    part = Partition("cosine")
    _fill(part, xs)
    for el in (1, 2, 3):
        part.remove(el)
    ids, dists = part.search_many(xs[:4], 8)
    assert not (set(ids.flatten().tolist()) & {1, 2, 3})
    assert np.all(np.isfinite(dists))
    assert ids.shape == (4, 8)


def test_single_query_search_trims():
    xs = _vectors(6)
    part = Partition("cosine")
    _fill(part, xs)
    for el in (1, 2, 3, 4):
        part.remove(el)
    ids, dists = part.search(xs[0], 5)
    assert len(ids) == len(dists) == 2
    assert set(ids.tolist()) == {5, 6}
    assert np.all(np.isfinite(dists))


def test_host_ivf_tier_returns_k_live_despite_tombstones():
    xs = _vectors(600, seed=5)
    # budget below even the int4 footprint forces the host-IVF rung
    part = Partition("cosine", hbm_budget_bytes=1)
    _fill(part, xs)
    assert part._use_host_ivf()
    for el in range(1, 601, 2):
        part.remove(el)
    ids, dists = part.search_many(xs[:2], 10)
    for row in range(2):
        finite = np.isfinite(dists[row])
        assert int(finite.sum()) == 10
        assert all(i % 2 == 0 for i in ids[row][finite].tolist())


def test_l2_over_budget_uses_host_exact_rung():
    """Over-budget l2 corpus: host-IVF is cosine-only, so the ladder
    must fall to the host exact scan instead of uploading past the
    budget (results must match brute force)."""
    rng = np.random.default_rng(11)
    xs = rng.normal(size=(300, 16)).astype(np.float32)
    part = Partition("l2", hbm_budget_bytes=1)
    _fill(part, xs)
    assert part._use_host_exact() and not part._use_host_ivf()
    queries = xs[:4]
    ids, dists = part.search_many(queries, 5)
    # brute-force oracle over the PADDED layout the partition stores
    data = part.matrix.data[: part.matrix.n]
    qs = part.matrix.prepare_queries(queries)
    d = (
        np.sum(data * data, axis=1)[None, :]
        - 2.0 * (qs @ data.T)
        + np.sum(qs * qs, axis=1, keepdims=True)
    )
    expect = np.argsort(d, axis=1, kind="stable")[:, :5] + 1  # ids are 1-based
    assert np.array_equal(ids.astype(np.int64), expect)


def test_bulk_intra_batch_duplicate_ids_stay_consistent():
    """add_bulk with a duplicate id inside the batch must not leave an
    untombstonable ghost row."""
    xs = _vectors(4, seed=9)
    part = Partition("cosine")
    part.add_bulk([1, 2, 2, 3], xs)
    part.remove(2)
    ids, dists = part.search_many(xs[:1], 10)
    finite = np.isfinite(dists[0])
    assert 2 not in set(ids[0][finite].tolist())
    assert set(ids[0][finite].tolist()) == {1, 3}


def test_array_tenant_value_rejected():
    from helix_tpu.engine.errors import QueryError
    from helix_tpu.engine.vector import _tenant_key

    with pytest.raises(QueryError, match="scalar"):
        _tenant_key({"F64Array": [1.0, 2.0]})
    with pytest.raises(QueryError, match="scalar"):
        _tenant_key({"StringArray": ["a"]})
    assert _tenant_key({"String": "t1"})  # scalars still fine
    assert _tenant_key({"I64": 7})

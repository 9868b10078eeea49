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


def test_ann_tier_drops_tombstones():
    xs = _vectors(256)
    part = Partition(
        "cosine", ann_config={"threshold": 16, "degree": 8, "ef": 32}
    )
    _fill(part, xs)
    for el in range(1, 41):
        part.remove(el)
    ids, dists = part.search_many(xs[:4], 10)
    assert not (set(ids[np.isfinite(dists)].tolist()) & set(range(1, 41)))
    # All surfaced hits must be live and finite or sentinel-marked.
    finite = np.isfinite(dists)
    assert np.all(ids[~finite] == 0)


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

"""Device BM25 postings kernel vs the host inverted index."""

import numpy as np
import pytest

from helix_tpu.engine.text import TextPartition, tokenize
from helix_tpu.ops.bm25 import DevicePostings

WORDS = (
    "graph vector database search engine tpu index query latency "
    "throughput node edge embedding text score rank shard mesh"
).split()


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(4)
    docs = {}
    for doc_id in range(1, 401):
        length = int(rng.integers(3, 30))
        docs[doc_id] = " ".join(rng.choice(WORDS, length))
    return docs


def test_device_scores_match_host(corpus):
    host = TextPartition(device_threshold=10**9)   # force host path
    device_part = TextPartition(device_threshold=1)  # force device path
    for doc_id, text in corpus.items():
        host.add(doc_id, text)
        device_part.add(doc_id, text)

    for query in ("graph vector", "tpu index latency", "score", "missing-term"):
        h_ids, h_scores = host.search(query, 10)
        d_ids, d_scores = device_part.search(query, 10)
        assert len(h_ids) == len(d_ids)
        # Scores match to f32; tie order may differ, so compare multisets
        # of (rounded score) and the id set of strictly-distinct scores.
        assert np.allclose(sorted(h_scores), sorted(d_scores), rtol=1e-5)
        h_map = dict(zip(h_ids.tolist(), h_scores.tolist()))
        d_map = dict(zip(d_ids.tolist(), d_scores.tolist()))
        for doc_id in set(h_map) & set(d_map):
            assert abs(h_map[doc_id] - d_map[doc_id]) < 1e-4


def test_device_postings_rebuild_on_write(corpus):
    part = TextPartition(device_threshold=1)
    for doc_id, text in list(corpus.items())[:50]:
        part.add(doc_id, text)
    ids1, _ = part.search("graph", 5)
    part.add(9999, "graph graph graph graph graph graph")
    ids2, scores2 = part.search("graph", 5)
    assert 9999 in ids2.tolist()
    assert scores2[0] == max(scores2)


def test_empty_query_terms():
    part = TextPartition(device_threshold=1)
    part.add(1, "hello world")
    built = DevicePostings.build(part.postings, part.doc_len)
    ids, scores = built.search(tokenize("zzz qqq"), 5)
    assert len(ids) == 0


def test_sharded_bm25_matches_host_ragged(corpus):
    """Doc-partitioned BM25 over the 8-device mesh: scores must match
    the host index exactly (global IDF/avgdl), with a doc count that
    doesn't divide the shard count and docs beyond one shard's rows."""
    import jax

    from helix_tpu.ops.bm25 import ShardedBM25
    from helix_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    host = TextPartition(device_threshold=10**9)
    for doc_id, text in corpus.items():
        host.add(doc_id, text)

    sharded = ShardedBM25.build(host.postings, host.doc_len, make_mesh())
    assert sharded is not None
    for query in ("graph vector", "tpu index latency", "score shard mesh"):
        h_ids, h_scores = host.search(query, 10)
        s_ids, s_scores = sharded.search(tokenize(query), 10)
        assert np.allclose(sorted(h_scores), sorted(s_scores), rtol=1e-5)
        h_map = dict(zip(h_ids.tolist(), h_scores.tolist()))
        s_map = dict(zip(s_ids.tolist(), s_scores.tolist()))
        for doc_id in set(h_map) & set(s_map):
            assert abs(h_map[doc_id] - s_map[doc_id]) < 1e-4
    # over-wide query (40 known terms) falls back — never silently
    # truncates; unknown tokens filter before the cap like the host
    assert sharded.search(["graph"] * 40, 5) is None
    assert sharded.search([f"zz{i}" for i in range(40)], 5)[0].size == 0


def test_partition_routes_sharded_on_mesh(corpus):
    """On a multi-device mesh the partition's device path IS the
    sharded build."""
    from helix_tpu.ops.bm25 import ShardedBM25

    part = TextPartition(device_threshold=1)
    for doc_id, text in corpus.items():
        part.add(doc_id, text)
    part.search("graph vector", 5)
    assert isinstance(part._device[1], ShardedBM25)


def test_single_device_postings_still_covered(corpus):
    """DevicePostings (the single-chip path) stays directly tested even
    though the 8-device test mesh routes partitions to the sharded
    build."""
    host = TextPartition(device_threshold=10**9)
    for doc_id, text in corpus.items():
        host.add(doc_id, text)
    device = DevicePostings.build(host.postings, host.doc_len)
    h_ids, h_scores = host.search("graph vector tpu", 10)
    d_ids, d_scores = device.search(tokenize("graph vector tpu"), 10)
    assert np.allclose(sorted(h_scores), sorted(d_scores), rtol=1e-5)

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


def test_tie_membership_matches_host_across_paths():
    """Equal-scoring docs straddling rank k: device top-k membership
    must follow the host's (-score, id) rule even when insertion order
    (and so dict order) diverges from id order."""
    host = TextPartition(device_threshold=10**9)
    dev = TextPartition(device_threshold=1)
    # 30 identical docs -> all tie; insert in scrambled order, then
    # churn a few (remove+reinsert moves them to the dict's tail)
    ids = list(range(1, 31))
    rng = np.random.default_rng(7)
    rng.shuffle(ids)
    for part in (host, dev):
        for doc_id in ids:
            part.add(doc_id, "alpha beta gamma")
        for doc_id in (3, 11, 27):
            part.remove(doc_id)
            part.add(doc_id, "alpha beta gamma")
    h_ids, _ = host.search("alpha", 10)
    d_ids, _ = dev.search("alpha", 10)
    assert d_ids.tolist() == h_ids.tolist() == list(range(1, 11))


def test_sharded_tie_membership(corpus):
    """Same rule through the sharded path (shard-major merge prefers
    lower ids among exact ties)."""
    import jax

    from helix_tpu.ops.bm25 import ShardedBM25
    from helix_tpu.parallel import make_mesh

    part = TextPartition()
    ids = list(range(1, 41))
    rng = np.random.default_rng(9)
    rng.shuffle(ids)
    for doc_id in ids:
        part.add(doc_id, "delta epsilon")
    built = ShardedBM25.build(part.postings, part.doc_len, make_mesh())
    got_ids, _ = built.search(tokenize("delta"), 12)
    assert got_ids.tolist() == list(range(1, 13))


def test_unicode_tokenization_searchable():
    """Non-Latin text must tokenize and be searchable (the old ASCII
    regex dropped it, deflating partition stats and returning no hits)."""
    assert tokenize("Foo_Bar-baz9") == ["foo", "bar", "baz9"]
    assert tokenize("naïve Café") == ["naïve", "café"]
    assert tokenize("Москва 東京abc") == ["москва", "東京abc"]

    part = TextPartition(device_threshold=10**9)
    part.add(1, "café culture in Wien")
    part.add(2, "coffee culture in Vienna")
    ids, scores = part.search("café", 5)
    assert ids.tolist() == [1] and scores[0] > 0
    # doc stats now count unicode tokens
    assert part.doc_len[1] == 4


def test_device_rebuild_hysteresis(corpus):
    """A trickle of writes must not rebuild the device layout per
    search: stale-version searches serve host until the drift passes
    REBUILD_MIN_WRITES, and results stay read-your-writes correct."""
    part = TextPartition(device_threshold=1)
    for doc_id, text in list(corpus.items())[:60]:
        part.add(doc_id, text)
    part.search("graph", 5)          # builds
    built_version = part._device[0]
    part.add(7777, "graph graph graph graph graph")
    ids, _ = part.search("graph", 5)
    assert 7777 in ids.tolist()      # host path, fresh data visible
    assert part._device[0] == built_version  # no rebuild yet
    # enough churn -> the next search rebuilds
    part.REBUILD_MIN_WRITES = 2
    part.add(7778, "graph graph")
    part.search("graph", 5)
    assert part._device[0] == part.version


def test_tenant_partition_pruning():
    from helix_tpu.engine.store import GraphStore
    from helix_tpu.engine.text import TextIndex

    store = GraphStore()
    store.create_index({"NodeText": {
        "label": "Doc", "property": "body", "tenant_property": "org",
    }}, if_not_exists=True)
    defn = next(iter(store.indexes.values()))
    index = TextIndex(defn)
    class _El:
        def __init__(self, i, org):
            self.id = i
            self.props = {"body": {"String": f"text {i}"},
                          "org": {"String": org}}
    for i in range(4):
        index.insert_element(_El(i, f"org{i}"))
    assert len(index.partitions) == 4
    for i in range(3):
        index.remove_element(i)
    assert len(index.partitions) == 1  # emptied tenants pruned


def test_okapi_constants_in_lockstep():
    from helix_tpu.engine import text as host_mod
    from helix_tpu.ops import bm25 as dev_mod

    assert host_mod.K1 == dev_mod.K1
    assert host_mod.B == dev_mod.B

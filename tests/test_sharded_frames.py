"""Mesh-scale ORDERED traversal (round-4 verdict item 4).

Round 3's sharded graph executor returned only membership masks — set
semantics.  ``ShardedGraph.expand_frame`` now carries full interpreter
hop semantics across the psum exchange: expansion order (frame order x
adjacency slot order), multiplicity, and parent-row provenance, so
filters/bindings/value_map terminals work at mesh scale.  Every test
compares against the single-device engine byte-for-byte.
"""

import numpy as np
import pytest

from helix_tpu.dsl import Predicate, SourcePredicate, g, read_batch, write_batch
from helix_tpu.engine import Engine


def _run(engine, batch, kind="read", params=None, types=None):
    req = {
        "request_type": kind, "query_name": None,
        "query": batch.encode(), "parameters": params or {},
    }
    if types:
        req["parameter_types"] = types
    return engine.execute(req)


def _build(engine, n_nodes=300, n_edges=900, seed=11, dim=8):
    rng = np.random.default_rng(seed)
    wb = write_batch().var_as(
        "ix", g().create_vector_index_nodes("Doc", "emb")
    )
    for i in range(n_nodes):
        wb = wb.var_as(f"n{i}", g().add_n("Doc", {
            "i": int(i),
            "emb": [float(x) for x in rng.normal(size=dim)],
        }))
    _run(engine, wb, "write")
    ids = _run(
        engine,
        read_batch().var_as("u", g().n_with_label("Doc").id())
        .returning(["u"]),
    )["u"]
    eb = write_batch()
    labels = ["REL", "ALT"]
    for j in range(n_edges):
        a, b = rng.integers(0, n_nodes, 2)
        eb = eb.var_as(
            f"e{j}",
            g().n({"Ids": [ids[a]]}).add_e(
                labels[j % 2], {"Ids": [ids[b]]}
            ),
        )
    _run(engine, eb, "write")
    return rng


def _pair(seed=11, **kw):
    """(sharded-forced engine, host engine) over identical data."""
    sharded = Engine(graph_shard_threshold=1)
    host = Engine()
    _build(sharded, seed=seed, **kw)
    _build(host, seed=seed, **kw)
    return sharded, host


QUERIES = [
    # ordered expansion with multiplicity + properties
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").out("REL").value_map()
    ).returning(["r"]),
    # two labeled hops, then a filter and projection
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").out("REL").out("ALT")
             .where_(Predicate.lt("i", 150)).values(["i"])
    ).returning(["r"]),
    # Both = out ++ in concatenation order
    lambda: read_batch().var_as(
        "r", g().n_where(SourcePredicate.eq("$label", "Doc"))
             .both("REL").id()
    ).returning(["r"]),
    # unlabeled hop (any label)
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").out(None).count()
    ).returning(["r"]),
    # dedup after hops (first-occurrence order must match)
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").out("REL").dedup().id()
    ).returning(["r"]),
    # in-direction
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").in_("ALT").values(["i"])
    ).returning(["r"]),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_sharded_hop_matches_host_byte_for_byte(qi):
    sharded, host = _pair()
    q = QUERIES[qi]()
    import json

    a = _run(sharded, q)
    b = _run(host, q)
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)


def test_hybrid_vector_seed_expand_value_map():
    """The round-4 verdict's 'done' shape: sharded vector seed ->
    sharded labeled expansion -> value_map, byte-for-byte vs the
    single-device engine."""
    import json

    sharded, host = _pair(seed=23)
    rng = np.random.default_rng(5)
    qvec = [float(x) for x in rng.normal(size=8)]
    batch = read_batch().var_as(
        "hits",
        g().vector_search_nodes("Doc", "emb", qvec, 5)
           .out("REL").value_map(),
    ).returning(["hits"])
    a = _run(sharded, batch)
    b = _run(host, batch)
    assert json.dumps(a) == json.dumps(b)
    assert len(a["hits"]) > 0  # non-vacuous


def test_expand_frame_order_and_multiplicity_oracle():
    """Direct oracle check: expand_frame's (parent, target) stream is
    exactly the CSR expansion order, including duplicated frame rows."""
    from jax.sharding import Mesh
    import jax

    from helix_tpu.parallel.graph import ShardedGraph
    from helix_tpu.ops.csr import PaddedGraph

    rng = np.random.default_rng(3)
    n, deg = 257, 5  # deliberately prime
    indptr = np.arange(n + 1, dtype=np.int64) * deg
    dst = rng.integers(0, n, size=n * deg).astype(np.int32)
    lab = rng.integers(0, 3, size=n * deg).astype(np.int32)
    host = PaddedGraph.host_arrays(indptr, dst, lab, n)
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    graph = ShardedGraph(mesh, n, {"out": host})

    frame = np.array([5, 5, 200, 3, 256, 5], np.int32)  # dup rows
    for code in (-1, 0, 2):
        parent, targets = graph.expand_frame("out", code, frame)
        # oracle: per frame row, CSR slice filtered by label, in order
        want_parent, want_targets = [], []
        for row, v in enumerate(frame):
            for e in range(indptr[v], indptr[v + 1]):
                if code < 0 or lab[e] == code:
                    want_parent.append(row)
                    want_targets.append(dst[e])
        assert parent.tolist() == want_parent
        assert targets.tolist() == want_targets


def test_expand_frame_empty_and_padding():
    from jax.sharding import Mesh
    import jax

    from helix_tpu.parallel.graph import ShardedGraph
    from helix_tpu.ops.csr import PaddedGraph

    n = 50
    indptr = np.zeros(n + 1, np.int64)
    indptr[11:] = 2  # only node 10 has edges
    dst = np.array([7, 9], np.int32)
    lab = np.array([0, 1], np.int32)
    host = PaddedGraph.host_arrays(indptr, dst, lab, n)
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    graph = ShardedGraph(mesh, n, {"out": host})

    parent, targets = graph.expand_frame("out", -1, np.empty(0, np.int32))
    assert len(parent) == 0 and len(targets) == 0
    parent, targets = graph.expand_frame(
        "out", -1, np.array([10, 0, 10], np.int32)
    )
    assert parent.tolist() == [0, 0, 2, 2]
    assert targets.tolist() == [7, 9, 7, 9]
    parent, targets = graph.expand_frame(
        "out", 1, np.array([10], np.int32)
    )
    assert parent.tolist() == [0] and targets.tolist() == [9]


# ---- round-4 second arc: ordered EDGE steps at mesh scale ---------------

EDGE_QUERIES = [
    # OutE with label -> edge properties (order + multiplicity)
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").out_e("REL").edge_properties()
    ).returning(["r"]),
    # unlabeled InE -> id stream
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").in_e(None).id()
    ).returning(["r"]),
    # BothE = out_e ++ in_e concatenation order
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").both_e("ALT").count()
    ).returning(["r"]),
    # anchor provenance: OutE -> OtherN -> values
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").out_e("REL").other_n().values(["i"])
    ).returning(["r"]),
    # edge hop then node filter through the anchor-tracked endpoint
    lambda: read_batch().var_as(
        "r", g().n_with_label("Doc").in_e("ALT").other_n()
             .where_(Predicate.lt("i", 100)).id()
    ).returning(["r"]),
]


@pytest.mark.parametrize("qi", range(len(EDGE_QUERIES)))
def test_sharded_edge_hop_matches_host_byte_for_byte(qi):
    import json

    sharded, host = _pair(seed=31)
    q = EDGE_QUERIES[qi]()
    a = _run(sharded, q)
    b = _run(host, q)
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)
    assert a["r"] not in ([], 0)  # non-vacuous


def test_expand_frame_edges_order_oracle():
    """Direct oracle: (parent, edge slot, target) stream equals the CSR
    expansion order, including duplicate frame rows and label filters."""
    from jax.sharding import Mesh
    import jax

    from helix_tpu.parallel.graph import ShardedGraph
    from helix_tpu.ops.csr import PaddedGraph

    rng = np.random.default_rng(9)
    n, deg = 131, 4  # prime node count
    indptr = np.arange(n + 1, dtype=np.int64) * deg
    dst = rng.integers(0, n, size=n * deg).astype(np.int32)
    lab = rng.integers(0, 3, size=n * deg).astype(np.int32)
    # CSR-position -> global edge slot mapping deliberately shuffled
    eorder = rng.permutation(n * deg).astype(np.int32)
    host = PaddedGraph.host_arrays(indptr, dst, lab, n, edge_order=eorder)
    assert len(host) == 3
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    graph = ShardedGraph(mesh, n, {"out": host})

    frame = np.array([7, 130, 7, 0], np.int32)
    for code in (-1, 1):
        parent, eslots, targets = graph.expand_frame_edges(
            "out", code, frame
        )
        wp, we, wt = [], [], []
        for row, v in enumerate(frame):
            for e in range(indptr[v], indptr[v + 1]):
                if code < 0 or lab[e] == code:
                    wp.append(row)
                    we.append(eorder[e])
                    wt.append(dst[e])
        assert parent.tolist() == wp
        assert eslots.tolist() == we
        assert targets.tolist() == wt


def test_expand_frame_edges_requires_edge_plane():
    from jax.sharding import Mesh
    import jax

    from helix_tpu.parallel.graph import ShardedGraph
    from helix_tpu.ops.csr import PaddedGraph

    n = 16
    indptr = np.arange(n + 1, dtype=np.int64)
    dst = np.arange(n, dtype=np.int32)
    lab = np.zeros(n, np.int32)
    host = PaddedGraph.host_arrays(indptr, dst, lab, n)  # no edge plane
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    graph = ShardedGraph(mesh, n, {"out": host})
    with pytest.raises(KeyError):
        graph.expand_frame_edges("out", -1, np.array([1], np.int32))

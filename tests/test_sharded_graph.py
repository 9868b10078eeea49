"""Multi-chip graph traversal (parallel/graph.py) on the 8-device
virtual CPU mesh: correctness vs a NumPy BFS oracle, including ragged
node counts that don't divide the shard count and mixed hop/filter
plans (the engine planner's shape)."""

import jax
import numpy as np
import pytest

from helix_tpu.ops.csr import PaddedGraph
from helix_tpu.parallel import ShardedGraph, make_mesh


def random_graph(rng, n, deg, n_labels=4):
    """CSR with uniform out-degree + its padded layout + reverse CSR."""
    dst = rng.integers(0, n, size=n * deg).astype(np.int32)
    lab = rng.integers(0, n_labels, size=n * deg).astype(np.int32)
    indptr = np.arange(n + 1, dtype=np.int64) * deg
    return indptr, dst, lab


def oracle_hop(n, indptr, dst, lab, mask, code):
    out = np.zeros(n, bool)
    for u in np.nonzero(mask)[0]:
        for e in range(indptr[u], indptr[u + 1]):
            if code < 0 or lab[e] == code:
                out[dst[e]] = True
    return out


def padded(indptr, dst, lab, n):
    g = PaddedGraph.from_csr(indptr, dst, lab, n)
    return np.asarray(g.neighbors), np.asarray(g.edge_labels)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh()


# 1000 and 999 do not divide 8; 1024 does — covers ragged + aligned.
@pytest.mark.parametrize("n", [999, 1000, 1024])
def test_sharded_khop_matches_oracle(mesh, n):
    rng = np.random.default_rng(n)
    indptr, dst, lab = random_graph(rng, n, deg=5)
    nb, lb = padded(indptr, dst, lab, n)
    graph = ShardedGraph(mesh, n, {"out": (nb, lb)})

    start = rng.random(n) < 0.02
    keep = rng.random(n) < 0.5
    for code in (-1, 2):
        expect = start
        for _ in range(2):
            expect = oracle_hop(n, indptr, dst, lab, expect, code)
        expect_count = int((expect & keep).sum())
        got = graph.khop_count("out", start, code, hops=2, keep_mask=keep)
        assert got == expect_count


def test_sharded_both_directions_and_interleaved_masks(mesh):
    """Mixed plan: out-hop, filter, Both-hop — the general planner shape."""
    rng = np.random.default_rng(7)
    n = 777  # ragged
    indptr, dst, lab = random_graph(rng, n, deg=4)
    nb_out, lb_out = padded(indptr, dst, lab, n)
    # reverse adjacency for "in"
    order = np.argsort(dst, kind="stable")
    rev_dst = np.repeat(np.arange(n), np.diff(indptr))[order].astype(np.int32)
    rev_lab = lab[order]
    counts = np.bincount(dst, minlength=n)
    rev_indptr = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    nb_in, lb_in = padded(rev_indptr, rev_dst, rev_lab, n)

    graph = ShardedGraph(mesh, n, {"out": (nb_out, lb_out), "in": (nb_in, lb_in)})

    start = rng.random(n) < 0.03
    filt = rng.random(n) < 0.6
    plan = [("hop", ("out",)), ("mask", 0), ("hop", ("out", "in"))]
    got = graph.run(plan, start, codes=[1, -1], masks=[filt])

    expect = oracle_hop(n, indptr, dst, lab, start, 1) & filt
    fwd = oracle_hop(n, indptr, dst, lab, expect, -1)
    bwd = oracle_hop(n, rev_indptr, rev_dst, rev_lab, expect, -1)
    np.testing.assert_array_equal(got, fwd | bwd)


def test_sharded_empty_frontier_and_unknown_label(mesh):
    rng = np.random.default_rng(3)
    n = 130  # < 8 * 128: every shard is mostly padding
    indptr, dst, lab = random_graph(rng, n, deg=3)
    nb, lb = padded(indptr, dst, lab, n)
    graph = ShardedGraph(mesh, n, {"out": (nb, lb)})
    # empty start
    assert graph.khop_count("out", np.zeros(n, bool), -1, 2) == 0
    # label code that matches no edge
    start = np.ones(n, bool)
    assert graph.khop_count("out", start, 99, 1) == 0


def test_plan_cache_reuses_compilation(mesh):
    rng = np.random.default_rng(11)
    n = 300
    indptr, dst, lab = random_graph(rng, n, deg=3)
    nb, lb = padded(indptr, dst, lab, n)
    graph = ShardedGraph(mesh, n, {"out": (nb, lb)})
    start = rng.random(n) < 0.1
    graph.khop_count("out", start, 0, 2)
    graph.khop_count("out", start, 1, 2)  # different code, same plan
    assert len(graph._compiled) == 1


def test_engine_routes_to_sharded_traversal(monkeypatch):
    """With graph_shard_threshold set and a mesh present, k-hop dedup
    counts route through the multi-chip executor and match the host
    pipeline exactly."""
    from helix_tpu.dsl import (
        DynamicQueryRequest, Predicate, SourcePredicate, g, read_batch,
        write_batch,
    )
    from helix_tpu.engine import Engine
    from helix_tpu.engine.exec import Executor
    from helix_tpu.parallel import graph as graph_mod

    eng = Engine(graph_shard_threshold=1)
    rng = np.random.default_rng(5)
    n = 250
    batch = write_batch()
    for i in range(n):
        batch = batch.var_as(f"u{i}", g().add_n("User", {"i": int(i)}))
    eng.execute(DynamicQueryRequest.write(batch).encode())
    edges = write_batch()
    for j in range(n * 3):
        src, dst = int(rng.integers(1, n + 1)), int(rng.integers(1, n + 1))
        label = "F" if j % 4 else "B"
        edges = edges.var_as(
            f"e{j}", g().n({"Ids": [src]}).add_e(label, {"Ids": [dst]})
        )
    eng.execute(DynamicQueryRequest.write(edges).encode())

    def khop(hops, label, where=None):
        t = g().n_where(SourcePredicate.lt("i", 8))
        for _ in range(hops):
            t = t.out(label)
        if where is not None:
            t = t.where(where)
        return DynamicQueryRequest.read(
            read_batch().var_as("n", t.dedup().count()).returning(["n"])
        ).encode()

    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    runs = []
    original = graph_mod.ShardedGraph.run

    def spy(self, *a, **kw):
        out = original(self, *a, **kw)
        runs.append(len(out))
        return out

    monkeypatch.setattr(graph_mod.ShardedGraph, "run", spy)
    for hops, label, where in [
        (1, "F", None), (2, "F", None), (2, None, Predicate.gt("i", 50)),
    ]:
        sharded = eng.execute(khop(hops, label, where))
        eng2_result = sharded
        # host oracle: same engine without the shard route
        eng.graph_shard_threshold = None
        host = eng.execute(khop(hops, label, where))
        eng.graph_shard_threshold = 1
        assert eng2_result == host
    assert len(runs) == 3  # every query actually took the sharded route


def test_engine_sharded_membership_tail(monkeypatch):
    """Membership-returning tails (dedup -> order_by -> values) through
    the sharded route must reproduce the host pipeline byte-for-byte."""
    from helix_tpu.dsl import DynamicQueryRequest, SourcePredicate, g, read_batch, write_batch
    from helix_tpu.engine import Engine
    from helix_tpu.engine.exec import Executor

    eng = Engine(graph_shard_threshold=1)
    rng = np.random.default_rng(6)
    n = 180
    batch = write_batch()
    for i in range(n):
        batch = batch.var_as(f"u{i}", g().add_n("U", {"i": int(i)}))
    eng.execute(DynamicQueryRequest.write(batch).encode())
    edges = write_batch()
    for j in range(n * 3):
        src, dst = int(rng.integers(1, n + 1)), int(rng.integers(1, n + 1))
        edges = edges.var_as(f"e{j}", g().n({"Ids": [src]}).add_e("F", {"Ids": [dst]}))
    eng.execute(DynamicQueryRequest.write(edges).encode())

    req = DynamicQueryRequest.read(
        read_batch().var_as(
            "page",
            g().n_where(SourcePredicate.lt("i", 6)).out("F").out("F")
               .dedup().order_by("i", "Desc").limit(7).values(["i"]),
        ).returning(["page"])
    ).encode()

    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    sharded = eng.execute(req)
    eng.graph_shard_threshold = None
    host = eng.execute(req)
    assert sharded == host and len(sharded["page"]) == 7


def test_missing_label_codes_raise(mesh):
    """A hop op with no label code must raise, not silently filter to
    edge-label code 0 (a real label)."""
    n = 64
    rng = np.random.default_rng(5)
    indptr, dst, lab = random_graph(rng, n, 4)
    nb, lb = padded(indptr, dst, lab, n)
    graph = ShardedGraph(mesh, n, {"out": (nb, lb)})
    start = np.zeros(n, bool)
    start[0] = True
    with pytest.raises(ValueError, match="label codes"):
        graph.run([("hop", ("out",))], start, codes=[], masks=[])

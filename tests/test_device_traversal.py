"""Device traversal planner: k-hop+dedup+count queries route through the
BFS mask kernels and match the host pipeline exactly."""

import numpy as np
import pytest

from helix_tpu.dsl import (
    DynamicQueryRequest, Predicate, SourcePredicate, g, read_batch, write_batch,
)
from helix_tpu.engine import Engine
from helix_tpu.engine.exec import Executor


@pytest.fixture(scope="module")
def engine():
    eng = Engine()
    rng = np.random.default_rng(2)
    n = 300
    batch = write_batch()
    for i in range(n):
        batch = batch.var_as(
            f"u{i}",
            g().add_n("User", {"i": int(i), "vip": bool(i % 7 == 0)}),
        )
    eng.execute(DynamicQueryRequest.write(batch).encode())
    edges = write_batch()
    node_ids = list(range(1, n + 1))
    for j in range(n * 4):
        src = int(rng.choice(node_ids))
        dst = int(rng.choice(node_ids))
        label = "FOLLOWS" if j % 3 else "BLOCKS"
        edges = edges.var_as(
            f"e{j}", g().n({"Ids": [src]}).add_e(label, {"Ids": [dst]})
        )
    eng.execute(DynamicQueryRequest.write(edges).encode())
    return eng


def khop_query(hops, label, where=None, seed_pred=None):
    t = g().n_where(seed_pred or SourcePredicate.lt("i", 5))
    for _ in range(hops):
        t = t.out(label)
    if where is not None:
        t = t.where(where)
    t = t.dedup().count()
    return DynamicQueryRequest.read(
        read_batch().var_as("n", t).returning(["n"])
    ).encode()


@pytest.mark.parametrize("hops,label,where", [
    (1, "FOLLOWS", None),
    (2, "FOLLOWS", None),
    (2, None, None),
    (3, "FOLLOWS", Predicate.gt("i", 100)),
    (2, "FOLLOWS", Predicate.eq("vip", True)),
    (1, "NOPE", None),
])
def test_device_matches_host(engine, hops, label, where, monkeypatch):
    request = khop_query(hops, label, where)
    host = engine.execute(request)

    # Force the device planner on for this graph size.
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    device = engine.execute(request)
    assert device == host, (hops, label)


def test_planner_engages(engine, monkeypatch):
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    calls = []
    original = Executor._try_device_traversal

    def spy(self, steps, ctx, scope):
        out = original(self, steps, ctx, scope)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(Executor, "_try_device_traversal", spy)
    engine.execute(khop_query(2, "FOLLOWS"))
    assert any(calls)


def test_bag_semantics_query_stays_on_host(engine, monkeypatch):
    """Without Dedup the planner must NOT engage (bag counts differ)."""
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    request = DynamicQueryRequest.read(
        read_batch().var_as(
            "n",
            g().n_where(SourcePredicate.lt("i", 5)).out("FOLLOWS").count(),
        )
    ).encode()
    bag = engine.execute(request)["n"]
    dedup = engine.execute(khop_query(1, "FOLLOWS"))["n"]
    assert bag >= dedup  # duplicates preserved on the host path


def test_widened_grammar_matches_host(engine, monkeypatch):
    """Both hops, interleaved filters, interior Dedups, Exists tails."""
    from helix_tpu.dsl import g as _g

    def run(traversal):
        request = DynamicQueryRequest.read(
            read_batch().var_as("n", traversal)
        ).encode()
        host = engine.execute(request)
        monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
        device = engine.execute(request)
        monkeypatch.setattr(Executor, "device_traversal_min_nodes", 10_000)
        assert device == host
        return host["n"]

    seed = SourcePredicate.lt("i", 5)
    # Both-hop set reach
    assert run(_g().n_where(seed).both("FOLLOWS").dedup().count()) > 0
    # Filter between hops
    run(_g().n_where(seed).out("FOLLOWS").where(Predicate.gt("i", 50))
        .out("FOLLOWS").dedup().count())
    # Has / HasLabel sugar as filters
    run(_g().n_where(seed).out().has("vip", True).dedup().count())
    run(_g().n_where(seed).both().has_label("User").dedup().count())
    # Interior Dedup is a no-op under the final set reduction
    run(_g().n_where(seed).out("FOLLOWS").dedup().in_("FOLLOWS")
        .dedup().count())
    # Exists tail (both outcomes)
    assert run(_g().n_where(seed).out("FOLLOWS").dedup().exists()) is True
    assert run(_g().n_where(seed).out("NOPE").dedup().exists()) is False


@pytest.mark.parametrize("seed", range(10))
def test_planner_fuzz_matches_host(seed, monkeypatch):
    """Random graphs x random khop-count queries: device == host."""
    rng = np.random.default_rng(100 + seed)
    eng = Engine()
    n = int(rng.integers(20, 120))
    batch = write_batch()
    for i in range(n):
        batch = batch.var_as(f"u{i}", g().add_n("N", {"i": int(i)}))
    eng.execute(DynamicQueryRequest.write(batch).encode())
    edges = write_batch()
    for j in range(int(rng.integers(0, n * 5))):
        edges = edges.var_as(
            f"e{j}",
            g().n({"Ids": [int(rng.integers(1, n + 1))]}).add_e(
                str(rng.choice(["A", "B"])), {"Ids": [int(rng.integers(1, n + 1))]}
            ),
        )
    if edges.queries:
        eng.execute(DynamicQueryRequest.write(edges).encode())

    t = g().n_where(SourcePredicate.lt("i", 10))
    for _ in range(int(rng.integers(1, 4))):
        hop = rng.random()
        label = str(rng.choice(["A", "B"])) if rng.random() < 0.7 else None
        if hop < 0.4:
            t = t.out(label)
        elif hop < 0.7:
            t = t.in_(label)
        else:
            t = t.both(label)
        roll = rng.random()
        if roll < 0.25:
            t = t.where(Predicate.lt("i", int(rng.integers(1, n))))
        elif roll < 0.35:
            t = t.has_label("N")
        elif roll < 0.45:
            t = t.dedup()
    t = t.dedup()
    t = t.exists() if rng.random() < 0.3 else t.count()
    request = DynamicQueryRequest.read(
        read_batch().var_as("n", t).returning(["n"])
    ).encode()

    host = eng.execute(request)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    assert eng.execute(request) == host


def _run_both_paths(engine, monkeypatch, traversal, expect_planned=True):
    """Execute on host and with the planner forced on; payloads must match.
    Returns (payload, planner_engaged)."""
    request = DynamicQueryRequest.read(
        read_batch().var_as("r", traversal).returning(["r"])
    ).encode()
    host = engine.execute(request)
    engaged = []
    original = Executor._try_device_traversal

    def spy(self, steps, ctx, scope):
        out = original(self, steps, ctx, scope)
        engaged.append(out is not None)
        return out

    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    monkeypatch.setattr(Executor, "_try_device_traversal", spy)
    device = engine.execute(request)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 10_000)
    assert device == host
    if expect_planned:
        assert any(engaged), "planner never engaged"
    return host["r"], any(engaged)


def test_membership_tail_ids(engine, monkeypatch):
    """Dedup -> OrderBy(unique key) -> Id runs on the fast path and
    matches the host stream exactly."""
    seed = SourcePredicate.lt("i", 5)
    payload, _ = _run_both_paths(
        engine, monkeypatch,
        g().n_where(seed).out("FOLLOWS").dedup().order_by("i").id(),
    )
    assert payload == sorted(payload, key=lambda node_id: node_id) or payload


def test_membership_tail_value_map_and_bounds(engine, monkeypatch):
    seed = SourcePredicate.lt("i", 8)
    payload, _ = _run_both_paths(
        engine, monkeypatch,
        g().n_where(seed).out("FOLLOWS").out("FOLLOWS")
        .dedup().order_by("i", "Desc").limit(7).value_map(["i"]),
    )
    assert len(payload) <= 7
    keys = [row["i"] for row in payload]
    assert keys == sorted(keys, reverse=True)


def test_membership_tail_values_multi_key(engine, monkeypatch):
    seed = SourcePredicate.lt("i", 5)
    _run_both_paths(
        engine, monkeypatch,
        g().n_where(seed).out("FOLLOWS")
        .dedup().order_by_multiple([("vip", "Desc"), ("i", "Asc")])
        .values(["i"]),
    )


def test_membership_tail_tied_keys_falls_back(engine, monkeypatch):
    """Sorting by a non-unique key (vip bool) has ties; the planner must
    yield to the host pipeline, which owns tie order."""
    seed = SourcePredicate.lt("i", 5)
    payload, _ = _run_both_paths(
        engine, monkeypatch,
        g().n_where(seed).out("FOLLOWS").dedup().order_by("vip").id(),
        expect_planned=False,  # planner tries, detects ties, backs off
    )
    assert isinstance(payload, list)


def test_membership_tail_without_order_stays_on_host(engine, monkeypatch):
    """Plain Dedup -> Id has no order re-establishment; host only."""
    engaged = []
    original = Executor._try_device_traversal

    def spy(self, steps, ctx, scope):
        out = original(self, steps, ctx, scope)
        engaged.append(out is not None)
        return out

    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    monkeypatch.setattr(Executor, "_try_device_traversal", spy)
    request = DynamicQueryRequest.read(
        read_batch().var_as(
            "r", g().n_where(SourcePredicate.lt("i", 5)).out("FOLLOWS").dedup().id()
        )
    ).encode()
    engine.execute(request)
    assert not any(engaged)


def test_vector_seeded_traversal_plans(monkeypatch):
    """Hybrid path (vector seed -> expansion -> ordered projection)
    runs through the planner and matches the host."""
    eng = Engine()
    batch = write_batch().var_as(
        "idx", g().create_vector_index_nodes("Doc", "emb")
    )
    rng = np.random.default_rng(5)
    for i in range(40):
        vec = [float(x) for x in rng.normal(size=8)]
        batch = batch.var_as(f"d{i}", g().add_n("Doc", {"emb": vec, "i": int(i)}))
    eng.execute(DynamicQueryRequest.write(batch).encode())
    links = write_batch()
    for j in range(120):
        src = int(rng.integers(1, 41))
        dst = int(rng.integers(1, 41))
        links = links.var_as(
            f"e{j}", g().n({"Ids": [src]}).add_e("REL", {"Ids": [dst]})
        )
    eng.execute(DynamicQueryRequest.write(links).encode())

    q = [float(x) for x in rng.normal(size=8)]
    traversal = (
        g().vector_search_nodes("Doc", "emb", q, 5)
        .out("REL").dedup().order_by("i").value_map(["i"])
    )
    _run_both_paths(eng, monkeypatch, traversal)


def test_unknown_label_membership_tail_returns_list(engine, monkeypatch):
    """Unknown edge label with an id-returning tail: [] like the host,
    not a count-shaped 0 (review finding)."""
    t = (g().n_where(SourcePredicate.lt("i", 5)).out("NO_SUCH")
          .dedup().order_by("i").id())
    request = DynamicQueryRequest.read(
        read_batch().var_as("r", t).returning(["r"])
    ).encode()
    host = engine.execute(request)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    device = engine.execute(request)
    assert device == host == {"r": []}


def test_unknown_label_with_bad_source_still_raises(engine, monkeypatch):
    """The unknown-label shortcut must not mask source errors: an
    undefined variable source raises on both paths."""
    request = {
        "request_type": "read", "query_name": None,
        "query": {"queries": [{"Query": {"name": "r", "steps": [
            {"N": {"Var": "never_defined"}},
            {"Out": "NO_SUCH"}, "Dedup", "Count",
        ], "condition": None}}], "returns": ["r"]},
        "parameters": {},
    }
    from helix_tpu.engine import EngineError

    with pytest.raises(EngineError, match="unknown variable"):
        engine.execute(request)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    with pytest.raises(EngineError, match="unknown variable"):
        engine.execute(request)


def test_compare_equal_tie_falls_back_to_host(engine, monkeypatch):
    """Keys 1 vs 1.0 sort equal but repr differently: the device path
    must detect the tie and defer to the host's stable order."""
    eng = Engine()
    batch = write_batch()
    for i in range(6):
        # alternate I64 and F64 values that compare equal pairwise
        val = {"I64": i // 2} if i % 2 == 0 else {"F64": float(i // 2)}
        batch = batch.var_as(f"m{i}", g().add_n("M", {"x": val}))
    edges = batch
    for i in range(6):
        edges = edges.var_as(
            f"e{i}", g().n({"Ids": [1]}).add_e("R", {"Ids": [i + 1]})
        )
    eng.execute(DynamicQueryRequest.write(edges).encode())
    t = g().n_where(SourcePredicate.eq("$id", {"U64": 1})).out("R") \
         .dedup().order_by("x").id()
    request = DynamicQueryRequest.read(
        read_batch().var_as("r", t).returning(["r"])
    ).encode()
    host = eng.execute(request)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    assert eng.execute(request) == host


def test_traced_requests_keep_per_step_timings(engine, monkeypatch):
    """$trace must carry step timings even for planner-eligible queries
    (the device path has no per-step boundaries, so tracing routes to
    the host pipeline)."""
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    out = engine.execute(
        __import__("json").loads(
            __import__("json").dumps(khop_query(2, "FOLLOWS"))
        ) if isinstance(khop_query(2, "FOLLOWS"), dict)
        else khop_query(2, "FOLLOWS"),
        trace=True,
    )
    steps = out["$trace"]["steps"]
    assert [s["step"] for s in steps][:2] == ["NWhere", "Out"]
    assert all("us" in s for s in steps)


def test_backend_preference_routes_device(engine, monkeypatch):
    """HELIX_TRAVERSAL_BACKEND=device runs the adaptive device kernels
    (not the native sweep) and matches the host pipeline exactly."""
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    request = khop_query(2, "FOLLOWS")
    host = engine.execute(request)

    monkeypatch.setenv("HELIX_TRAVERSAL_BACKEND", "device")
    calls = []
    original = Executor._run_device_plan

    def spy(self, snap, plan, start):
        out = original(self, snap, plan, start)
        calls.append(out.sum())
        return out

    monkeypatch.setattr(Executor, "_run_device_plan", spy)
    assert engine.execute(request) == host
    assert len(calls) == 1

    monkeypatch.setenv("HELIX_TRAVERSAL_BACKEND", "native")
    assert engine.execute(request) == host
    assert len(calls) == 1  # native route: no further device calls


def test_padded_graph_byte_cap_falls_back(engine, monkeypatch):
    """A padded layout that would blow the HBM budget routes to the
    native sweep instead of building the device arrays."""
    from helix_tpu.engine.snapshot import GraphSnapshot

    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    monkeypatch.setattr(GraphSnapshot, "PADDED_BYTES_CAP", 1)
    engine.snapshots._snapshot = None  # force a fresh snapshot object
    snap = engine.snapshots.get()
    assert snap.padded_graph("out") is None  # cap actually engaged
    request = khop_query(2, "FOLLOWS")
    monkeypatch.setenv("HELIX_TRAVERSAL_BACKEND", "native")
    host_result = engine.execute(request)
    monkeypatch.setenv("HELIX_TRAVERSAL_BACKEND", "device")
    # device preference with no padded graph must fall back, not fail
    assert engine.execute(request) == host_result


def test_distance_filter_falls_back_to_host(monkeypatch):
    """VectorSearch -> Where($distance) -> hop -> Dedup -> Count: the
    planner resolves filters against an all-nodes frame that has no
    distances, so it must FALL BACK, not bake an all-False mask."""
    eng = Engine()
    batch = write_batch().var_as(
        "idx", g().create_vector_index_nodes("Doc", "v"))
    for i in range(8):
        batch = batch.var_as(
            f"d{i}", g().add_n("Doc", {"i": i, "v": [float(i), 1.0]}))
    eng.execute(DynamicQueryRequest.write(batch).encode())
    edges = write_batch()
    for i in range(1, 8):
        edges = edges.var_as(
            f"e{i}", g().n({"Ids": [i]}).add_e("REL", {"Ids": [i + 1]}))
    eng.execute(DynamicQueryRequest.write(edges).encode())

    query = DynamicQueryRequest.read(
        read_batch().var_as(
            "n",
            g().vector_search_nodes("Doc", "v", [0.0, 1.0], 8)
            .where(Predicate.lt("$distance", 10.0))
            .out("REL").dedup().count(),
        )
    ).encode()
    host = eng.execute(query)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    device = eng.execute(query)
    assert device == host
    assert host["n"] > 0  # the filter keeps everything at lt 10.0
    eng.close()


def test_orderby_tail_with_missing_keys(engine, monkeypatch):
    """Ordered membership tail where some rows lack the sort property:
    must not crash (None-vs-tuple sort), must match the host order."""
    query = DynamicQueryRequest.read(
        read_batch().var_as(
            "vals",
            g().n_where(SourcePredicate.lt("i", 5))
            .out("FOLLOWS").dedup()
            .order_by("maybe_missing", "Asc").values(["i"]),
        )
    ).encode()
    host = engine.execute(query)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    device = engine.execute(query)
    assert device == host


def test_orderby_tail_mixed_bool_and_missing_keys(monkeypatch):
    """Bool sort keys bail the column codes (per-row fallback); mixing
    in rows that lack the property exercises the None-normalized sort
    that used to raise TypeError."""
    eng = Engine()
    batch = write_batch()
    for i in range(12):
        props = {"i": i}
        if i % 3 != 0:
            props["flag"] = bool(i % 2)  # every third row lacks it
        batch = batch.var_as(f"u{i}", g().add_n("User", props))
    eng.execute(DynamicQueryRequest.write(batch).encode())
    edges = write_batch()
    for i in range(1, 12):
        edges = edges.var_as(
            f"e{i}", g().n({"Ids": [i]}).add_e("REL", {"Ids": [i + 1]}))
    eng.execute(DynamicQueryRequest.write(edges).encode())

    query = DynamicQueryRequest.read(
        read_batch().var_as(
            "vals",
            g().n_where(SourcePredicate.lt("i", 3))
            .out("REL").dedup().order_by("flag", "Asc").values(["i"]),
        )
    ).encode()
    host = eng.execute(query)
    monkeypatch.setattr(Executor, "device_traversal_min_nodes", 1)
    device = eng.execute(query)
    assert device == host
    eng.close()

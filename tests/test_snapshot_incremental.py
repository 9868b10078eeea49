"""Incremental snapshots: node-append epochs extend the previous
snapshot's arrays in place (amortized O(tail)); structural mutations
force a full rebuild.  These invariants carry the mixed read/write
serving path (measured: 1.1 s -> 0.26 ms per write+point-read cycle at
100k rows)."""

import numpy as np

from helix_tpu.engine import Engine
from helix_tpu.engine.snapshot import GraphSnapshot


def _add(engine, label, props):
    steps = [{"AddN": {"label": label, "properties": [
        [k, {"Value": v}] for k, v in props.items()]}}]
    engine.execute({"request_type": "write", "query_name": "w",
                    "query": {"queries": [{"Query": {
                        "name": "n", "steps": steps, "condition": None}}],
                        "returns": []},
                    "parameters": {}, "parameter_types": {}})


def _count(engine, label):
    out = engine.execute({"request_type": "read", "query_name": "c",
        "query": {"queries": [{"Query": {"name": "c", "steps": [
            {"NWhere": {"Eq": ["$label", {"String": label}]}}, "Count"],
            "condition": None}}], "returns": ["c"]},
        "parameters": {}, "parameter_types": {}})
    return out["c"]


def test_append_epochs_extend_not_rebuild(monkeypatch):
    engine = Engine()
    for i in range(50):
        _add(engine, "A", {"x": {"I64": i}})
    snap0 = engine.snapshots.get()
    builds = {"n": 0}
    orig_init = GraphSnapshot.__init__

    def spy_init(self, store):
        builds["n"] += 1
        orig_init(self, store)

    monkeypatch.setattr(GraphSnapshot, "__init__", spy_init)
    for i in range(20):
        _add(engine, "A", {"x": {"I64": 100 + i}})
        assert _count(engine, "A") == 51 + i
    snap1 = engine.snapshots.get()
    assert builds["n"] == 0, "append epochs must not rebuild"
    assert snap1 is not snap0 and snap1.n_nodes == 70
    # edge arrays are shared with the pre-append snapshot
    assert snap1.out_edges is snap0.out_edges
    # prev snapshot's views are unchanged by the in-place extension
    assert snap0.n_nodes == 50 and len(snap0.node_ids) == 50


def test_new_label_in_tail_gets_coded(monkeypatch):
    engine = Engine()
    _add(engine, "A", {"x": {"I64": 1}})
    engine.snapshots.get()
    _add(engine, "B", {"x": {"I64": 2}})  # label first seen in a tail
    snap = engine.snapshots.get()
    assert "B" in snap.label_code
    assert _count(engine, "B") == 1


def test_string_column_appears_in_tail():
    engine = Engine()
    for i in range(10):
        _add(engine, "A", {"x": {"I64": i}})
    # build the column (numeric only so far)
    out = engine.execute({"request_type": "read", "query_name": "q",
        "query": {"queries": [{"Query": {"name": "r", "steps": [
            {"NWhere": {"And": [{"Eq": ["$label", {"String": "A"}]},
                                 {"Gt": ["x", {"I64": 7}]}]}}, "Count"],
            "condition": None}}], "returns": ["r"]},
        "parameters": {}, "parameter_types": {}})
    assert out["r"] == 2
    # tail introduces a STRING value for the same property
    _add(engine, "A", {"x": {"String": "hello"}})
    out = engine.execute({"request_type": "read", "query_name": "q",
        "query": {"queries": [{"Query": {"name": "r", "steps": [
            {"NWhere": {"And": [{"Eq": ["$label", {"String": "A"}]},
                                 {"Eq": ["x", {"String": "hello"}]}]}},
            "Count"], "condition": None}}], "returns": ["r"]},
        "parameters": {}, "parameter_types": {}})
    assert out["r"] == 1


def test_structural_ops_rebuild_and_stay_correct():
    engine = Engine()
    for i in range(30):
        _add(engine, "A", {"x": {"I64": i}})
    assert _count(engine, "A") == 30
    # drop one (structural)
    engine.execute({"request_type": "write", "query_name": "d",
        "query": {"queries": [{"Query": {"name": "d", "steps": [
            {"NWhere": {"And": [{"Eq": ["$label", {"String": "A"}]},
                                 {"Eq": ["x", {"I64": 7}]}]}}, "Drop"],
            "condition": None}}], "returns": []},
        "parameters": {}, "parameter_types": {}})
    assert _count(engine, "A") == 29
    # append again after the rebuild
    _add(engine, "A", {"x": {"I64": 99}})
    assert _count(engine, "A") == 30
    snap = engine.snapshots.get()
    assert snap.n_nodes == 30
    # edges after appends force rebuilds too and traversals stay right
    engine.execute({"request_type": "write", "query_name": "e2",
        "query": {"queries": [
            {"Query": {"name": "s", "steps": [
                {"NWhere": {"And": [{"Eq": ["$label", {"String": "A"}]},
                                     {"Eq": ["x", {"I64": 0}]}]}}],
                "condition": None}},
            {"Query": {"name": "t", "steps": [
                {"NWhere": {"And": [{"Eq": ["$label", {"String": "A"}]},
                                     {"Eq": ["x", {"I64": 1}]}]}}],
                "condition": None}},
            {"Query": {"name": "e", "steps": [
                {"Inject": "s"},
                {"AddE": {"label": "rel", "to": {"Var": "t"},
                          "properties": []}}], "condition": None}},
        ], "returns": []},
        "parameters": {}, "parameter_types": {}})
    out = engine.execute({"request_type": "read", "query_name": "t",
        "query": {"queries": [{"Query": {"name": "r", "steps": [
            {"NWhere": {"And": [{"Eq": ["$label", {"String": "A"}]},
                                 {"Eq": ["x", {"I64": 0}]}]}},
            {"Out": "rel"}, {"Values": ["x"]}], "condition": None}}],
            "returns": ["r"]},
        "parameters": {}, "parameter_types": {}})
    assert out["r"] == [1]


def test_rolled_back_append_not_visible():
    """A failed bulk write (unique violation mid-batch) rolls back via
    raw_remove_node (structural) — the snapshot must not retain the
    phantom rows."""
    engine = Engine(secondary_indices=["U.k"])
    # make U.k unique by creating the index as unique instead
    engine.store.drop_index({"NodeEquality": {"label": "U", "property": "k"}})
    engine.store.create_index(
        {"NodeEquality": {"label": "U", "property": "k", "unique": True}},
        if_not_exists=False,
    )
    _add(engine, "U", {"k": {"I64": 1}})
    assert _count(engine, "U") == 1
    try:
        engine.execute({"request_type": "write", "query_name": "dup",
            "query": {"queries": [
                {"Query": {"name": "a", "steps": [
                    {"AddN": {"label": "U", "properties": [["k", {"Value": {"I64": 2}}]]}}],
                    "condition": None}},
                {"Query": {"name": "b", "steps": [
                    {"AddN": {"label": "U", "properties": [["k", {"Value": {"I64": 1}}]]}}],
                    "condition": None}},
            ], "returns": []},
            "parameters": {}, "parameter_types": {}})
        raise AssertionError("unique violation expected")
    except Exception:
        pass
    assert _count(engine, "U") == 1


def test_property_patch_epochs(monkeypatch):
    """set_property / remove_property patch the cached column cell in
    place — no rebuild — including numeric->string transitions and
    dotted-path column invalidation."""
    engine = Engine()
    for i in range(40):
        _add(engine, "U", {"age": {"I64": i}, "meta": {"Object": {"k": {"I64": i}}}})

    def count_where(pred):
        out = engine.execute({"request_type": "read", "query_name": "c",
            "query": {"queries": [{"Query": {"name": "c", "steps": [
                {"NWhere": {"And": [{"Eq": ["$label", {"String": "U"}]}, pred]}},
                "Count"], "condition": None}}], "returns": ["c"]},
            "parameters": {}, "parameter_types": {}})
        return out["c"]

    assert count_where({"Gt": ["age", {"I64": 35}]}) == 4       # build column
    assert count_where({"Gt": ["meta.k", {"I64": 35}]}) == 4    # dotted column
    builds = {"n": 0}
    orig_init = GraphSnapshot.__init__

    def spy_init(self, store):
        builds["n"] += 1
        orig_init(self, store)

    monkeypatch.setattr(GraphSnapshot, "__init__", spy_init)

    def set_prop(i, name, value):
        engine.execute({"request_type": "write", "query_name": "u",
            "query": {"queries": [{"Query": {"name": "s", "steps": [
                {"NWhere": {"And": [{"Eq": ["$label", {"String": "U"}]},
                                     {"Eq": ["age", {"I64": i}]}]}},
                {"SetProperty": [name, {"Value": value}]}], "condition": None}}],
                "returns": []}, "parameters": {}, "parameter_types": {}})

    set_prop(0, "age", {"I64": 100})
    assert count_where({"Gt": ["age", {"I64": 35}]}) == 5
    # numeric -> string transition in a patched cell
    set_prop(1, "age", {"String": "old"})
    assert count_where({"Eq": ["age", {"String": "old"}]}) == 1
    # ages > 35 are {36..39, 100}: the "old" row (was 1) never counted
    assert count_where({"Gt": ["age", {"I64": 35}]}) == 5
    # patching the parent property invalidates the dotted column
    set_prop(2, "meta", {"Object": {"k": {"I64": 99}}})
    assert count_where({"Gt": ["meta.k", {"I64": 35}]}) == 5
    # remove_property
    engine.execute({"request_type": "write", "query_name": "rm",
        "query": {"queries": [{"Query": {"name": "s", "steps": [
            {"NWhere": {"And": [{"Eq": ["$label", {"String": "U"}]},
                                 {"Eq": ["age", {"I64": 100}]}]}},
            {"RemoveProperty": "age"}], "condition": None}}], "returns": []},
        "parameters": {}, "parameter_types": {}})
    assert count_where({"IsNull": "age"}) == 1
    assert builds["n"] == 0, "patch epochs must not rebuild"


def test_label_ids_cache_tracks_appends():
    engine = Engine()
    for i in range(10):
        _add(engine, "A", {"x": {"I64": i}})
    assert _count(engine, "A") == 10  # materializes the label cache
    for i in range(5):
        _add(engine, "A", {"x": {"I64": 100 + i}})
        _add(engine, "B", {"x": {"I64": i}})
    assert _count(engine, "A") == 15
    assert _count(engine, "B") == 5
    snap = engine.snapshots.get()
    ids = snap.label_ids("node", "A")
    assert len(ids) == 15 and len(np.unique(ids)) == 15


def test_edge_append_csr_merge_matches_full_build():
    """The vectorized CSR merge for appended edges must produce exactly
    what a from-scratch build produces (same stable order), across
    interleaved node/edge appends and new labels."""
    import numpy.testing as npt

    rng = np.random.default_rng(9)
    engine = Engine()
    for i in range(50):
        _add(engine, "N", {"k": {"I64": i}})
    ids = engine.store.nodes_by_label["N"]
    for _ in range(200):
        engine.store.add_edge("rel", int(rng.choice(ids)), int(rng.choice(ids)), {})
    engine.snapshots.get()  # materialize, then extend incrementally
    for round_ in range(5):
        _add(engine, "N", {"k": {"I64": 1000 + round_}})
        ids = engine.store.nodes_by_label["N"]
        label = "rel" if round_ % 2 == 0 else f"rel{round_}"  # new labels too
        for _ in range(30):
            engine.store.add_edge(
                label, int(rng.choice(ids)), int(rng.choice(ids)), {})
        snap = engine.snapshots.get()
        snap.csr_arrays("out")  # materialize the kernel cache mid-chain
        fresh = GraphSnapshot(engine.store)
        npt.assert_array_equal(snap.out_indptr, fresh.out_indptr)
        npt.assert_array_equal(snap.out_edges, fresh.out_edges)
        npt.assert_array_equal(snap.in_indptr, fresh.in_indptr)
        npt.assert_array_equal(snap.in_edges, fresh.in_edges)
        npt.assert_array_equal(snap.edge_src, fresh.edge_src)
        npt.assert_array_equal(snap.edge_dst, fresh.edge_dst)
        npt.assert_array_equal(snap.edge_label_codes, fresh.edge_label_codes)
        for d in ("out", "in"):
            a = snap.csr_arrays(d)
            b = fresh.csr_arrays(d)
            for x, y in zip(a, b):
                npt.assert_array_equal(x, y)


def test_edge_property_patch():
    """Edge SetProperty patches cached edge columns (kind='edge')."""
    engine = Engine()
    _add(engine, "A", {"x": {"I64": 1}})
    _add(engine, "A", {"x": {"I64": 2}})
    a, b = engine.store.nodes_by_label["A"]
    e1 = engine.store.add_edge("rel", a, b, {"w": {"I64": 10}})
    e2 = engine.store.add_edge("rel", b, a, {"w": {"I64": 20}})

    def heavy():
        out = engine.execute({"request_type": "read", "query_name": "q",
            "query": {"queries": [{"Query": {"name": "r", "steps": [
                {"EWhere": {"And": [{"Eq": ["$label", {"String": "rel"}]},
                                     {"Gt": ["w", {"I64": 15}]}]}}, "Count"],
                "condition": None}}], "returns": ["r"]},
            "parameters": {}, "parameter_types": {}})
        return out["r"]

    assert heavy() == 1  # builds the edge column
    engine.store.set_property("edge", e1, "w", {"I64": 100})
    assert heavy() == 2
    engine.store.remove_property("edge", e2, "w")
    assert heavy() == 1


def test_edge_column_survives_edge_append():
    """Review finding: a cached edge column must extend when edges are
    appended (previously carried over stale -> IndexError, and a patch
    on the new edge poisoned the snapshot cache permanently)."""
    engine = Engine()
    _add(engine, "A", {"x": {"I64": 1}})
    _add(engine, "A", {"x": {"I64": 2}})
    a, b = engine.store.nodes_by_label["A"]
    engine.store.add_edge("rel", a, b, {"w": {"I64": 10}})

    def count_heavy():
        out = engine.execute({"request_type": "read", "query_name": "q",
            "query": {"queries": [{"Query": {"name": "r", "steps": [
                {"EWhere": {"And": [{"Eq": ["$label", {"String": "rel"}]},
                                     {"Gt": ["w", {"I64": 5}]}]}}, "Count"],
                "condition": None}}], "returns": ["r"]},
            "parameters": {}, "parameter_types": {}})
        return out["r"]

    assert count_heavy() == 1          # materialize the edge column
    e2 = engine.store.add_edge("rel", b, a, {"w": {"I64": 7}})
    assert count_heavy() == 2          # column extended, not stale
    engine.store.set_property("edge", e2, "w", {"I64": 1})
    assert count_heavy() == 1          # patch on the appended edge
    assert count_heavy() == 1          # and the cache is not poisoned


def test_big_int_fidelity_on_fast_paths():
    """Review finding: i64 values past 2^53 must round-trip exactly
    through Values/ValueMap/AggregateBy/OrderBy regardless of which
    path (columnar or per-row) serves the query."""
    engine = Engine()
    big = 9007199254740993  # 2^53 + 1
    for i in range(200):
        _add(engine, "B", {"v": {"I64": big + (i % 2)}})

    def read(steps):
        return engine.execute({"request_type": "read", "query_name": "q",
            "query": {"queries": [{"Query": {"name": "r", "steps":
                [{"NWhere": {"Eq": ["$label", {"String": "B"}]}}] + steps,
                "condition": None}}], "returns": ["r"]},
            "parameters": {}, "parameter_types": {}})["r"]

    vals = read([{"Values": ["v"]}])
    assert set(vals) == {big, big + 1} and vals.count(big) == 100
    vm = read([{"ValueMap": ["v"]}])
    assert vm[0]["v"] == big
    assert read([{"AggregateBy": ["Sum", "v"]}]) == 100 * big + 100 * (big + 1)
    assert read([{"AggregateBy": ["Max", "v"]}]) == big + 1
    ordered = read([{"OrderBy": ["v", "Desc"]}, {"Limit": 1}, {"Values": ["v"]}])
    assert ordered == [big + 1]
    # exact sums that overflow naive int64 accumulation
    assert read([{"AggregateBy": ["Mean", "v"]}]) == (200 * big + 100) / 200


def test_null_vs_missing_export_fidelity():
    """Review finding: explicit Null properties export as None on the
    columnar path, identical to the per-row path (not dropped)."""
    engine = Engine()
    for i in range(100):
        props = [["i", {"Value": {"I64": i}}]]
        if i % 3 == 0:
            props.append(["v", {"Value": "Null"}])
        elif i % 3 == 1:
            props.append(["v", {"Value": {"I64": i}}])
        # i % 3 == 2: property absent entirely
        engine.execute({"request_type": "write", "query_name": "w",
            "query": {"queries": [{"Query": {"name": "n", "steps": [
                {"AddN": {"label": "Z", "properties": props}}], "condition": None}}],
                "returns": []}, "parameters": {}, "parameter_types": {}})

    def read(steps):
        return engine.execute({"request_type": "read", "query_name": "q",
            "query": {"queries": [{"Query": {"name": "r", "steps":
                [{"NWhere": {"Eq": ["$label", {"String": "Z"}]}}] + steps,
                "condition": None}}], "returns": ["r"]},
            "parameters": {}, "parameter_types": {}})["r"]

    vals = read([{"Values": ["v"]}])
    # 34 Nulls (None) + 33 ints; 33 absent rows skipped
    assert len(vals) == 67 and vals.count(None) == 34
    vm = read([{"ValueMap": ["v"]}])
    assert vm[0] == {"v": None} and vm[1] == {"v": 1} and vm[2] == {}


def test_node_append_carries_csr_kernel_cache():
    """A node-only append must CARRY the materialized native-CSR cache
    (indptr extended with the terminal value; targets/labels shared),
    not drop it — and the carried arrays must equal a fresh build's."""
    import numpy.testing as npt

    rng = np.random.default_rng(4)
    engine = Engine()
    for i in range(30):
        _add(engine, "N", {"k": {"I64": i}})
    ids = engine.store.nodes_by_label["N"]
    for _ in range(120):
        engine.store.add_edge("rel", int(rng.choice(ids)), int(rng.choice(ids)), {})
    snap = engine.snapshots.get()
    cached = snap.csr_arrays("out")  # materialize
    snap.csr_arrays("in")

    for round_ in range(3):
        _add(engine, "N", {"k": {"I64": 500 + round_}})
        snap2 = engine.snapshots.get()
        # cache survived the node-only append: targets/labels are the
        # SAME arrays (no O(E) re-gather)
        carried = snap2._padded.get("csr:out")
        assert carried is not None, "node append dropped the CSR cache"
        assert carried[1] is cached[1] and carried[2] is cached[2]
        fresh = GraphSnapshot(engine.store)
        for d in ("out", "in"):
            a = snap2.csr_arrays(d)
            b = fresh.csr_arrays(d)
            for x, y in zip(a, b):
                npt.assert_array_equal(x, y)
        # an edge append after node appends still merges exactly
        engine.store.add_edge(
            "rel", int(rng.choice(ids)), int(rng.choice(ids)), {})
        snap3 = engine.snapshots.get()
        fresh3 = GraphSnapshot(engine.store)
        for d in ("out", "in"):
            for x, y in zip(snap3.csr_arrays(d), fresh3.csr_arrays(d)):
                npt.assert_array_equal(x, y)
        snap = snap3
        cached = snap.csr_arrays("out")

"""Regression tests for write-path atomicity (round-2 ADVICE findings).

Covers:
- returned-var payloads reflect assignment-time state when later entries
  in the same write batch invalidate their frames (AddN then Drop);
- multi-index insert atomicity in add_node/add_edge (a unique violation
  in a later index must not leak phantom entries into earlier ones);
- set_property index + props atomicity under unique violations.
"""

import pytest

from helix_tpu.dsl import NodeRef, g, read_batch, write_batch
from helix_tpu.engine import Engine, WriteError

from .test_engine_basic import run_read, run_write


@pytest.fixture
def engine():
    return Engine()


def _seed_unique_indexes(engine):
    run_write(
        engine,
        write_batch()
        .var_as(
            "i1",
            g().create_index(
                {"NodeEquality": {"label": "User", "property": "email", "unique": True}}
            ),
        )
        .var_as(
            "i2",
            g().create_index(
                {"NodeEquality": {"label": "User", "property": "handle", "unique": True}}
            ),
        ),
    )


def test_add_then_drop_returns_assignment_time_payload(engine):
    # n <- AddN; DROP all Users; returning n must NOT raise, must reflect
    # the node as it existed at assignment, and the drop must persist.
    out = run_write(
        engine,
        write_batch()
        .var_as("n", g().add_n("User", {"name": "ephemeral"}))
        .var_as("gone", g().n().has_label("User").drop()),
    )
    assert out["n"] is not None
    payload = out["n"]
    # Stream payloads are lists of per-element dicts with props.
    assert isinstance(payload, list) and len(payload) == 1
    assert payload[0]["name"] == "ephemeral"
    # The drop survived and the store is consistent.
    count = run_read(engine, read_batch().var_as("c", g().n().count()))
    assert count["c"] == 0


def test_add_then_drop_is_wal_consistent(tmp_path):
    # The same batch must reach the WAL and replay to the same state.
    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    run_write(
        eng,
        write_batch()
        .var_as("n", g().add_n("User", {"name": "ephemeral"}))
        .var_as("gone", g().n().has_label("User").drop()),
    )
    run_write(eng, write_batch().var_as("m", g().add_n("User", {"name": "kept"})))
    eng.close()

    eng2 = Engine(data_dir=str(data))
    out = run_read(eng2, read_batch().var_as("names", g().n().values(["name"])))
    assert out["names"] == ["kept"]
    eng2.close()


def test_unique_violation_does_not_leak_into_other_index(engine):
    _seed_unique_indexes(engine)
    run_write(
        engine,
        write_batch().var_as(
            "a", g().add_n("User", {"email": "a@x.com", "handle": "alpha"})
        ),
    )
    # email is fresh but handle collides -> whole write must fail ...
    with pytest.raises(WriteError):
        run_write(
            engine,
            write_batch().var_as(
                "b", g().add_n("User", {"email": "b@x.com", "handle": "alpha"})
            ),
        )
    # ... leaving NO phantom 'b@x.com' in the email index: a legitimate
    # later write of that email must succeed.
    run_write(
        engine,
        write_batch().var_as(
            "c", g().add_n("User", {"email": "b@x.com", "handle": "beta"})
        ),
    )
    out = run_read(
        engine, read_batch().var_as("n", g().n().has_label("User").count())
    )
    assert out["n"] == 2


def test_set_property_unique_violation_restores_indexes(engine):
    _seed_unique_indexes(engine)
    run_write(
        engine,
        write_batch()
        .var_as("a", g().add_n("User", {"email": "a@x.com", "handle": "alpha"}))
        .var_as("b", g().add_n("User", {"email": "b@x.com", "handle": "beta"})),
    )
    # Retagging b's email to a's collides; both the email index entry for
    # b@x.com and the property value must survive the failed write.
    with pytest.raises(WriteError):
        run_write(
            engine,
            write_batch().var_as(
                "upd",
                g()
                .n("All")
                .has("email", "b@x.com")
                .set_property("email", "a@x.com"),
            ),
        )
    # b@x.com still resolves through the (unique) index.
    out = run_read(
        engine,
        read_batch().var_as(
            "hit", g().n("All").has("email", "b@x.com").values(["handle"])
        ),
    )
    assert out["hit"] == ["beta"]
    # And the old value can still be looked up / the new value re-used.
    run_write(
        engine,
        write_batch().var_as(
            "c", g().add_n("User", {"email": "c@x.com", "handle": "gamma"})
        ),
    )


def test_pure_add_batches_stay_lazy(engine):
    # No invalidating steps -> the executor keeps lazy payload encoding
    # (the ingest fast path). Observable: unnamed-var writes still work
    # and returned vars encode correctly at batch end.
    out = run_write(
        engine,
        write_batch()
        .var_as("a", g().add_n("User", {"name": "a"}))
        .var_as("e", g().n(NodeRef.var("a")).add_e("FOLLOWS", NodeRef.var("a"))),
    )
    assert out["a"][0]["name"] == "a"


# ---------------------------------------------------------------------
# Hook-state atomicity (round-2 review findings): failed writes must
# unwind vector/text hook effects, not just scalar indexes and props.
# ---------------------------------------------------------------------


def _vsearch(engine, label, prop, vec, k=5, tenant=None):
    t = g().vector_search_nodes(label, prop, vec, k, tenant_value=tenant)
    return run_read(
        engine, read_batch().var_as("hits", t.value_map(["$id"]))
    )["hits"]


def test_add_node_failure_unwinds_vector_hook(engine):
    """Two vector indexes, second multitenant: a WriteError from the
    tenant check must remove the first index's entry — the next add
    reuses the id, and a leaked row would surface as a phantom hit."""
    run_write(
        engine,
        write_batch()
        .var_as("i1", g().create_vector_index_nodes("P", "emb"))
        .var_as(
            "i2",
            g().create_vector_index_nodes("P", "profile",
                                          tenant_property="org"),
        ),
    )
    with pytest.raises(WriteError, match="org"):
        run_write(
            engine,
            write_batch().var_as("bad", g().add_n("P", {
                "emb": [1.0, 0.0], "profile": [0.5, 0.5],  # no org
            })),
        )
    # id 1 is reused by a different node WITHOUT a vector
    run_write(
        engine,
        write_batch().var_as("ok", g().add_n("Org", {"name": "acme"})),
    )
    assert _vsearch(engine, "P", "emb", [1.0, 0.0]) == []


def test_set_property_failure_keeps_vector_searchable(engine):
    """A rejected property write must leave the OLD vector in the index
    (previously the remove survived while the insert failed)."""
    run_write(
        engine,
        write_batch()
        .var_as("i", g().create_vector_index_nodes("P", "emb",
                                                   tenant_property="org"))
        .var_as("n", g().add_n("P", {"emb": [1.0, 0.0], "org": "a"})),
    )
    assert len(_vsearch(engine, "P", "emb", [1.0, 0.0], tenant="a")) == 1
    # removing the tenant property fails (vector present, tenant gone)
    with pytest.raises(WriteError):
        run_write(
            engine,
            write_batch().var_as(
                "x", g().n({"Ids": [1]}).remove_property("org")
            ),
        )
    # the node is still searchable under its tenant, property intact
    assert len(_vsearch(engine, "P", "emb", [1.0, 0.0], tenant="a")) == 1
    out = run_read(
        engine,
        read_batch().var_as("v", g().n({"Ids": [1]}).values(["org"])),
    )
    assert out["v"] == ["a"]


def test_create_index_failed_backfill_not_registered(engine):
    """A failed vector-index backfill (existing element missing the
    tenant property) must leave NO index behind: search says 'no vector
    index' and a corrected retry succeeds."""
    run_write(
        engine,
        write_batch().var_as("n", g().add_n("P", {"emb": [1.0, 0.0]})),
    )
    with pytest.raises(WriteError, match="org"):
        run_write(
            engine,
            write_batch().var_as(
                "i", g().create_vector_index_nodes("P", "emb",
                                                   tenant_property="org"),
            ),
        )
    from helix_tpu.engine import QueryError

    with pytest.raises(QueryError, match="no vector index"):
        _vsearch(engine, "P", "emb", [1.0, 0.0], tenant="a")
    # retry as untenanted: must not hit 'index already exists'
    run_write(
        engine,
        write_batch().var_as("i", g().create_vector_index_nodes("P", "emb")),
    )
    assert len(_vsearch(engine, "P", "emb", [1.0, 0.0])) == 1


def test_bulk_rollback_survives_failing_unwind_hook():
    """A hook failing mid-batch whose own drop path ALSO raises must not
    mask the original error, skip the remaining unwind, or leave the id
    counter advanced."""
    from helix_tpu.engine.store import GraphStore

    class Bomb:
        def on_index_created(self, store, defn): pass
        def on_index_dropped(self, store, defn): pass
        def on_node_added(self, store, node): pass
        def on_nodes_added_bulk(self, store, nodes):
            raise RuntimeError("bulk hook exploded")
        def on_node_dropped(self, store, node):
            raise RuntimeError("unwind also explodes")
        def on_edge_added(self, store, edge): pass
        def on_edge_dropped(self, store, edge): pass
        def on_property_set(self, store, kind, element, name, old): pass

    store = GraphStore()
    store.add_write_hook(Bomb())
    before = store.save_counters()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="bulk hook exploded"):
        store.add_nodes_bulk("N", [{}, {}, {}])
    assert store.save_counters() == before  # ids not burned
    assert store.node_count() == 0


def test_high_degree_drop_node_batched_path():
    """drop_node over >64 incident edges takes the batched removal path;
    the resulting store state must match the per-edge path exactly."""
    from helix_tpu.engine.store import GraphStore

    def build(n_edges):
        s = GraphStore()
        hub = s.add_node("H", {})
        others = [s.add_node("O", {"i": {"I64": i}}) for i in range(n_edges)]
        eids = []
        for i, o in enumerate(others):
            if i % 2:
                eids.append(s.add_edge("E", hub, o, {}))
            else:
                eids.append(s.add_edge("E", o, hub, {}))
        # extra edge not touching the hub must survive
        keep = s.add_edge("E", others[0], others[1], {})
        return s, hub, keep

    for n_edges in (8, 100):   # small path and batched path
        s, hub, keep = build(n_edges)
        s.drop_node(hub)
        assert hub not in s.nodes
        assert s.edge_count() == 1 and keep in s.edges
        assert s.edge_order == [keep]
        assert list(s.edges_by_label["E"]) == [keep]
        # no dangling adjacency entries anywhere
        for adj in (s.out_adj, s.in_adj):
            for node_id, lst in adj.items():
                assert all(e in s.edges for e in lst), (node_id, lst)


def test_drop_high_degree_rollback_mid_failure():
    """A batched node drop that fails PARTWAY (hook explosion after
    some edges are gone) must still roll back every edge it removed —
    the undo entries are recorded before the drop and the raw restores
    are idempotent for elements the drop never reached."""
    from helix_tpu.dsl import DynamicQueryRequest, NodeRef, g, write_batch
    from helix_tpu.engine import Engine

    eng = Engine()

    def wreq(batch):
        return DynamicQueryRequest.write(batch).encode()

    eng.execute(wreq(write_batch().var_as("h", g().add_n("H"))))
    hub = eng.store.node_order[-1]
    for i in range(80):
        eng.execute(wreq(write_batch().var_as("o", g().add_n("O"))))
        other = eng.store.node_order[-1]
        eng.execute(wreq(write_batch().var_as(
            "e", g().n(NodeRef.ids([hub])).add_e("E", NodeRef.ids([other])))))
    assert eng.store.edge_count() == 80

    class Bomb:
        def __init__(self):
            self.count = 0
        def on_index_created(self, store, defn): pass
        def on_index_dropped(self, store, defn): pass
        def on_node_added(self, store, node): pass
        def on_edge_added(self, store, edge): pass
        def on_node_dropped(self, store, node): pass
        def on_property_set(self, store, kind, element, name, old): pass
        def on_edge_dropped(self, store, edge):
            self.count += 1
            if self.count == 40:  # explode mid-batch
                raise RuntimeError("hook exploded mid-drop")

    bomb = Bomb()
    eng.store.add_write_hook(bomb)
    try:
        import pytest as _pytest

        with _pytest.raises(Exception, match="exploded"):
            eng.execute(wreq(write_batch().var_as(
                "d", g().n(NodeRef.ids([hub])).drop())))
    finally:
        eng.store._write_hooks.remove(bomb)
    # full rollback: every edge and the hub are back, no duplicates
    assert eng.store.edge_count() == 80
    assert hub in eng.store.nodes
    for adj in (eng.store.out_adj, eng.store.in_adj):
        for node_id, lst in adj.items():
            assert len(lst) == len(set(lst)), (node_id, lst)
            assert all(e in eng.store.edges for e in lst)
    eng.close()

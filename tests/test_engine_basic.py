"""Engine end-to-end slice tests: the reference's e2e envelopes plus the
minimum traversal/mutation surface (SURVEY.md §7 minimum slice)."""

import pytest

from helix_tpu.dsl import (
    BatchCondition, NodeRef, Order, Predicate, SourcePredicate, g,
    read_batch, write_batch,
)
from helix_tpu.engine import Engine, QueryError, WriteError


def run_read(engine, batch, params=None, types=None):
    req = {
        "request_type": "read",
        "query_name": None,
        "query": batch.encode(),
        "parameters": params or {},
    }
    if types:
        req["parameter_types"] = types
    return engine.execute(req)


def run_write(engine, batch, params=None, types=None):
    req = {
        "request_type": "write",
        "query_name": None,
        "query": batch.encode(),
        "parameters": params or {},
    }
    if types:
        req["parameter_types"] = types
    return engine.execute(req)


@pytest.fixture
def engine():
    return Engine()


@pytest.fixture
def social(engine):
    """alice -FOLLOWS-> bob -FOLLOWS-> carol; alice -FOLLOWS-> carol."""
    run_write(
        engine,
        write_batch()
        .var_as("alice", g().add_n("User", {"name": "alice", "age": 30}))
        .var_as("bob", g().add_n("User", {"name": "bob", "age": 25}))
        .var_as("carol", g().add_n("User", {"name": "carol", "age": 41}))
        .var_as("e1", g().n(NodeRef.var("alice")).add_e("FOLLOWS", NodeRef.var("bob")))
        .var_as("e2", g().n(NodeRef.var("bob")).add_e("FOLLOWS", NodeRef.var("carol")))
        .var_as("e3", g().n(NodeRef.var("alice")).add_e("FOLLOWS", NodeRef.var("carol"), {"close": True})),
    )
    return engine


def test_e2e_write_then_count(engine):
    # The exact raw envelopes from reference e2e_runtime.rs:96-158.
    write_req = {
        "request_type": "write",
        "query_name": None,
        "query": {
            "queries": [{
                "Query": {
                    "name": "created",
                    "steps": [{
                        "AddN": {
                            "label": "E2EUser",
                            "properties": [
                                ["externalId", {"Value": {"String": "cli-e2e"}}],
                                ["name", {"Value": {"String": "CI User"}}],
                            ],
                        }
                    }],
                    "condition": None,
                }
            }],
            "returns": ["created"],
        },
        "parameters": {},
    }
    out = engine.execute(write_req)
    assert out["created"][0]["$label"] == "E2EUser"
    assert out["created"][0]["externalId"] == "cli-e2e"

    read_req = {
        "request_type": "read",
        "query_name": None,
        "query": {
            "queries": [{
                "Query": {
                    "name": "e2e_count",
                    "steps": [
                        {"NWhere": {"Eq": ["$label", {"String": "E2EUser"}]}},
                        "Count",
                    ],
                    "condition": None,
                }
            }],
            "returns": ["e2e_count"],
        },
        "parameters": {},
    }
    assert engine.execute(read_req) == {"e2e_count": 1}


def test_readiness_probe_batch(engine):
    # The readiness probe (local_runtime.rs:584): label scan + count on an
    # empty engine must return 0, not error.
    out = run_read(
        engine,
        read_batch().var_as(
            "ready", g().n_with_label("__HelixReadiness__").count()
        ),
    )
    assert out == {"ready": 0}


def test_out_traversal(social):
    out = run_read(
        social,
        read_batch().var_as(
            "friends",
            g().n_where(SourcePredicate.eq("name", "alice")).out("FOLLOWS").values(["name"]),
        ),
    )
    assert sorted(out["friends"]) == ["bob", "carol"]


def test_two_hop_with_filter(social):
    out = run_read(
        social,
        read_batch().var_as(
            "fof",
            g()
            .n_where(SourcePredicate.eq("name", "alice"))
            .out("FOLLOWS")
            .out("FOLLOWS")
            .where(Predicate.gt("age", 30))
            .values(["name"]),
        ),
    )
    assert out["fof"] == ["carol"]


def test_in_and_edge_steps(social):
    out = run_read(
        social,
        read_batch()
        .var_as(
            "carol_followers",
            g().n_where(SourcePredicate.eq("name", "carol")).in_("FOLLOWS").values(["name"]),
        )
        .var_as(
            "close_edges",
            g().e_with_label("FOLLOWS").where(Predicate.eq("close", True)).count(),
        ),
    )
    assert sorted(out["carol_followers"]) == ["alice", "bob"]
    assert out["close_edges"] == 1


def test_edge_endpoints(social):
    out = run_read(
        social,
        read_batch().var_as(
            "targets",
            g()
            .n_where(SourcePredicate.eq("name", "alice"))
            .out_e("FOLLOWS")
            .in_n()
            .values(["name"]),
        ),
    )
    assert sorted(out["targets"]) == ["bob", "carol"]


def test_other_n(social):
    out = run_read(
        social,
        read_batch().var_as(
            "others",
            g()
            .n_where(SourcePredicate.eq("name", "carol"))
            .both_e("FOLLOWS")
            .other_n()
            .values(["name"]),
        ),
    )
    assert sorted(out["others"]) == ["alice", "bob"]


def test_dedup_order_limit(social):
    out = run_read(
        social,
        read_batch().var_as(
            "ordered",
            g()
            .n_with_label("User")
            .order_by("age", Order.Desc)
            .limit(2)
            .values(["name"]),
        ),
    )
    assert out["ordered"] == ["carol", "alice"]

    out = run_read(
        social,
        read_batch().var_as(
            "deduped",
            g()
            .n_where(SourcePredicate.eq("name", "carol"))
            .in_("FOLLOWS")
            .out("FOLLOWS")
            .dedup()
            .count(),
        ),
    )
    # alice and bob both follow carol; their follows = {bob, carol} and
    # {carol} -> deduped {bob, carol}.
    assert out["deduped"] == 2


def test_value_map_and_project(social):
    out = run_read(
        social,
        read_batch().var_as(
            "rows",
            g()
            .n_where(SourcePredicate.eq("name", "alice"))
            .value_map(["$id", "$label", "name"]),
        ),
    )
    row = out["rows"][0]
    assert row["$label"] == "User" and row["name"] == "alice" and "$id" in row

    out = run_read(
        social,
        read_batch().var_as(
            "proj",
            g()
            .n_where(SourcePredicate.eq("name", "bob"))
            .project([
                {"source": "name", "alias": "user"},
                {"alias": "next_age", "expr": {"Add": [{"Property": "age"}, {"Constant": {"I64": 1}}]}},
            ]),
        ),
    )
    assert out["proj"] == [{"user": "bob", "next_age": 26}]


def test_var_chaining(social):
    out = run_read(
        social,
        read_batch()
        .var_as("alice", g().n_where(SourcePredicate.eq("name", "alice")))
        .var_as("friends", g().n(NodeRef.var("alice")).out("FOLLOWS").values(["name"]))
        .returning(["friends"]),
    )
    assert sorted(out["friends"]) == ["bob", "carol"]


def test_batch_condition_skips(social):
    out = run_read(
        social,
        read_batch()
        .var_as("ghosts", g().n_with_label("Ghost"))
        .var_as_if(
            "gated",
            BatchCondition.var_not_empty("ghosts"),
            g().n_with_label("User").count(),
        )
        .var_as_if(
            "open",
            BatchCondition.var_empty("ghosts"),
            g().n_with_label("User").count(),
        ),
    )
    assert out["gated"] == []
    assert out["open"] == 3


def test_set_and_remove_property(social):
    run_write(
        social,
        write_batch().var_as(
            "updated",
            g().n_where(SourcePredicate.eq("name", "bob")).set_property("age", 26),
        ),
    )
    out = run_read(
        social,
        read_batch().var_as(
            "bob", g().n_where(SourcePredicate.eq("name", "bob")).values(["age"])
        ),
    )
    assert out["bob"] == [26]

    run_write(
        social,
        write_batch().var_as(
            "removed",
            g().n_where(SourcePredicate.eq("name", "bob")).remove_property("age"),
        ),
    )
    out = run_read(
        social,
        read_batch().var_as(
            "ages", g().n_with_label("User").where(Predicate.is_null("age")).count()
        ),
    )
    assert out["ages"] == 1


def test_drop_cascades(social):
    run_write(
        social,
        write_batch().var_as(
            "dropped", g().n_where(SourcePredicate.eq("name", "bob")).drop()
        ),
    )
    out = run_read(
        social,
        read_batch()
        .var_as("users", g().n_with_label("User").count())
        .var_as("edges", g().e_with_label("FOLLOWS").count()),
    )
    assert out["users"] == 2
    assert out["edges"] == 1  # only alice->carol remains


def test_write_rollback_on_error(engine):
    with pytest.raises(QueryError):
        run_write(
            engine,
            write_batch()
            .var_as("a", g().add_n("User", {"name": "x"}))
            .var_as("bad", g().n(NodeRef.var("a")).add_e("E", NodeRef.ids([999]))),
        )
    out = run_read(engine, read_batch().var_as("n", g().n().count()))
    assert out["n"] == 0  # the whole batch rolled back


def test_unique_index_enforced(engine):
    run_write(
        engine,
        write_batch().var_as(
            "idx",
            g().create_index(
                {"NodeEquality": {"label": "User", "property": "email", "unique": True}}
            ),
        ),
    )
    run_write(
        engine,
        write_batch().var_as("u1", g().add_n("User", {"email": "a@x.com"})),
    )
    with pytest.raises(WriteError):
        run_write(
            engine,
            write_batch().var_as("u2", g().add_n("User", {"email": "a@x.com"})),
        )
    out = run_read(engine, read_batch().var_as("n", g().n().count()))
    assert out["n"] == 1


def test_equality_index_lookup(engine):
    run_write(
        engine,
        write_batch().var_as(
            "idx",
            g().create_index(
                {"NodeEquality": {"label": "User", "property": "name", "unique": False}}
            ),
        ),
    )
    for i in range(50):
        run_write(
            engine,
            write_batch().var_as("u", g().add_n("User", {"name": f"user{i}"})),
        )
    out = run_read(
        engine,
        read_batch().var_as(
            "hit",
            g()
            .n_where(SourcePredicate.and_([
                SourcePredicate.eq("$label", "User"),
                SourcePredicate.eq("name", "user7"),
            ]))
            .count(),
        ),
    )
    assert out["hit"] == 1


def test_vector_search_end_to_end(engine):
    run_write(
        engine,
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "embedding"))
        .var_as("a", g().add_n("Doc", {"title": "A", "embedding": [1.0, 0.0, 0.0]}))
        .var_as("b", g().add_n("Doc", {"title": "B", "embedding": [0.9, 0.1, 0.0]}))
        .var_as("c", g().add_n("Doc", {"title": "C", "embedding": [0.0, 1.0, 0.0]})),
    )
    out = run_read(
        engine,
        read_batch().var_as(
            "hits",
            g()
            .vector_search_nodes("Doc", "embedding", [1.0, 0.0, 0.0], 2)
            .value_map(["$id", "$distance", "title"]),
        ),
    )
    hits = out["hits"]
    assert [h["title"] for h in hits] == ["A", "B"]
    assert hits[0]["$distance"] == pytest.approx(0.0, abs=1e-5)
    assert hits[0]["$distance"] <= hits[1]["$distance"]


def test_vector_hits_seed_traversal(engine):
    run_write(
        engine,
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "embedding"))
        .var_as("d", g().add_n("Doc", {"title": "D", "embedding": [1.0, 0.0]}))
        .var_as("author", g().add_n("Person", {"name": "ann"}))
        .var_as("e", g().n(NodeRef.var("d")).add_e("AUTHORED_BY", NodeRef.var("author"))),
    )
    out = run_read(
        engine,
        read_batch()
        .var_as(
            "doc_hit_rows",
            g()
            .vector_search_nodes("Doc", "embedding", [1.0, 0.0], 5)
            .value_map(["$id", "$distance", "title"]),
        )
        .var_as(
            "authors",
            g().n(NodeRef.var("doc_hit_rows")).out("AUTHORED_BY").value_map(["$id", "name"]),
        ),
    )
    assert out["authors"][0]["name"] == "ann"


def test_vector_multitenancy(engine):
    run_write(
        engine,
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "embedding", "tenant_id"))
        .var_as(
            "a",
            g().add_n("Doc", {"tenant_id": "acme", "embedding": [1.0, 0.0]}),
        ),
    )
    # Search without tenant -> query error.
    with pytest.raises(QueryError):
        run_read(
            engine,
            read_batch().var_as(
                "hits", g().vector_search_nodes("Doc", "embedding", [1.0, 0.0], 5)
            ),
        )
    # Unknown tenant -> empty.
    out = run_read(
        engine,
        read_batch().var_as(
            "hits",
            g().vector_search_nodes("Doc", "embedding", [1.0, 0.0], 5, tenant_value="ghost"),
        ),
    )
    assert out["hits"] == []
    # Matching tenant -> hit.
    out = run_read(
        engine,
        read_batch().var_as(
            "hits",
            g().vector_search_nodes("Doc", "embedding", [1.0, 0.0], 5, tenant_value="acme"),
        ),
    )
    assert len(out["hits"]) == 1
    # Write without tenant property -> write error, rolled back.
    with pytest.raises(WriteError):
        run_write(
            engine,
            write_batch().var_as(
                "bad", g().add_n("Doc", {"embedding": [0.5, 0.5]})
            ),
        )


def test_text_search_bm25(engine):
    run_write(
        engine,
        write_batch()
        .var_as("idx", g().create_text_index_nodes("Doc", "body"))
        .var_as("a", g().add_n("Doc", {"title": "A", "body": "the quick brown fox"}))
        .var_as("b", g().add_n("Doc", {"title": "B", "body": "the lazy dog sleeps"}))
        .var_as("c", g().add_n("Doc", {"title": "C", "body": "quick quick quick fox runs"})),
    )
    out = run_read(
        engine,
        read_batch().var_as(
            "hits",
            g().text_search_nodes("Doc", "body", "quick fox", 2).value_map(["title", "$score"]),
        ),
    )
    titles = [h["title"] for h in out["hits"]]
    assert set(titles) <= {"A", "C"} and len(titles) == 2
    assert out["hits"][0]["$score"] >= out["hits"][1]["$score"]


def test_foreach_bulk_ingest(engine):
    batch = write_batch().for_each_param(
        "users",
        write_batch().var_as(
            "u",
            g().add_n("User", [("name", {"Expr": {"Param": "users.name"}})]),
        ),
    )
    run_write(
        engine,
        batch,
        params={"users": [{"name": "a"}, {"name": "b"}, {"name": "c"}]},
        types={"users": {"Array": "Object"}},
    )
    out = run_read(engine, read_batch().var_as("n", g().n_with_label("User").count()))
    assert out["n"] == 3


def test_foreach_bulk_unknown_field_raises(engine):
    """A missing field in ANY row fails the whole batch with the same
    error the per-iteration loop raises, leaving the store untouched."""
    batch = write_batch().for_each_param(
        "users",
        write_batch().var_as(
            "u",
            g().add_n("User", [("name", {"Expr": {"Param": "users.name"}})]),
        ),
    )
    with pytest.raises(QueryError, match="unknown parameter path: users.name"):
        run_write(
            engine, batch,
            params={"users": [{"name": "a"}, {"nom": "b"}]},
            types={"users": {"Array": "Object"}},
        )
    out = run_read(engine, read_batch().var_as("n", g().n_with_label("User").count()))
    assert out["n"] == 0


def test_foreach_bulk_mixed_column_types(engine):
    """A column mixing strings, ints, floats, nulls, and nested values
    tags per-cell exactly like scalar AddN would."""
    batch = write_batch().for_each_param(
        "rows",
        write_batch().var_as(
            "r",
            g().add_n("Thing", [("v", {"Expr": {"Param": "rows.v"}})]),
        ),
    )
    run_write(
        engine, batch,
        params={"rows": [{"v": "s"}, {"v": 3}, {"v": 2.5}, {"v": None},
                         {"v": [1, 2, 3]}]},
        types={"rows": {"Array": "Object"}},
    )
    out = run_read(
        engine,
        read_batch().var_as("vals", g().n_with_label("Thing").values(["v"])),
    )
    assert out["vals"] == ["s", 3, 2.5, None, [1, 2, 3]]


def test_foreach_bulk_nonfinite_float_rejected(engine):
    """float('inf') in a homogeneous float column must fail the write
    like the scalar coercion does (finite-float contract)."""
    batch = write_batch().for_each_param(
        "rows",
        write_batch().var_as(
            "r",
            g().add_n("Thing", [("v", {"Expr": {"Param": "rows.v"}})]),
        ),
    )
    with pytest.raises((QueryError, WriteError)):
        run_write(
            engine, batch,
            params={"rows": [{"v": 1.0}, {"v": float("inf")}]},
            types={"rows": {"Array": "Object"}},
        )
    out = run_read(engine, read_batch().var_as("n", g().n_with_label("Thing").count()))
    assert out["n"] == 0


def test_params_in_predicates(social):
    out = run_read(
        social,
        read_batch().var_as(
            "old",
            g().n_with_label("User").where(Predicate.gt_param("age", "min_age")).values(["name"]),
        ),
        params={"min_age": 28},
        types={"min_age": "I64"},
    )
    assert sorted(out["old"]) == ["alice", "carol"]


def test_group_count_and_aggregate(social):
    out = run_read(
        social,
        read_batch()
        .var_as("by_label", g().n().group_count("$label"))
        .var_as("mean_age", g().n_with_label("User").aggregate_by("Mean", "age")),
    )
    assert out["by_label"] == {"User": 3}
    assert out["mean_age"] == pytest.approx(32.0)


def test_returns_empty_returns_all(social):
    out = run_read(
        social,
        read_batch()
        .var_as("a", g().n_with_label("User").count())
        .var_as("b", g().e_with_label("FOLLOWS").count()),
    )
    assert out == {"a": 3, "b": 3}


def test_bm25_disabled_rejects_text_index():
    eng = Engine(bm25=False)
    with pytest.raises(QueryError, match="BM25"):
        run_write(
            eng, write_batch().var_as("idx", g().create_text_index_nodes("Doc", "body"))
        )
    # Vector indexes unaffected.
    run_write(
        eng, write_batch().var_as("idx", g().create_vector_index_nodes("Doc", "emb"))
    )


def test_param_point_lookup_uses_index(monkeypatch):
    """The stored-route point-lookup shape — NWhere(And(Eq($label),
    EqExpr(prop, Param))) — must plan through the equality index, not
    materialize the label table or full-scan (measured 57 ms/lookup
    unplanned vs ~70 us planned at 100k rows)."""
    import helix_tpu.engine.exec as exec_mod

    eng = Engine(secondary_indices=["User.email"])
    for i in range(500):
        run_write(
            eng,
            write_batch().var_as(
                "u", g().add_n("User", {"email": f"u{i}@x", "n": i})
            ),
        )
    seen = {}
    orig = exec_mod.predicate_mask

    def spy(snap, store, frame, slots, predicate, ctx):
        seen["candidates"] = len(frame)
        return orig(snap, store, frame, slots, predicate, ctx)

    monkeypatch.setattr(exec_mod, "predicate_mask", spy)
    out = eng.execute({
        "request_type": "read", "query_name": "get_user",
        "query": {"queries": [{"Query": {"name": "u", "steps": [
            {"NWhere": {"And": [
                {"Eq": ["$label", {"String": "User"}]},
                {"EqExpr": ["email", {"Param": "email"}]},
            ]}},
            {"ValueMap": ["n"]}], "condition": None}}], "returns": ["u"]},
        "parameters": {"email": "u123@x"},
        "parameter_types": {"email": "String"},
    })
    assert out == {"u": [{"n": 123}]}
    assert seen["candidates"] == 1, seen  # index hit, not the 500-row label
    # static arithmetic folds too (range index absent -> label table is
    # the best source; just assert correctness)
    out = eng.execute({
        "request_type": "read", "query_name": "gt",
        "query": {"queries": [{"Query": {"name": "u", "steps": [
            {"NWhere": {"And": [
                {"Eq": ["$label", {"String": "User"}]},
                {"EqExpr": ["email", {"Add": [
                    {"Constant": {"String": "u44"}},
                    {"Constant": {"String": ""}},
                ]}]},
            ]}}, "Count"], "condition": None}}], "returns": ["u"]},
        "parameters": {}, "parameter_types": {},
    })
    assert out == {"u": 0}  # "u44" (no @x) matches nothing, but folds safely


def test_secondary_indices_bootstrap():
    eng = Engine(secondary_indices=["User.email", "Post.slug"])
    assert ("NodeEquality", "User", "email") in eng.store.indexes
    assert ("NodeEquality", "Post", "slug") in eng.store.indexes
    run_write(eng, write_batch().var_as("u", g().add_n("User", {"email": "a@x"})))
    out = run_read(
        eng,
        read_batch().var_as(
            "hit",
            g().n_where(SourcePredicate.and_([
                SourcePredicate.eq("$label", "User"),
                SourcePredicate.eq("email", "a@x"),
            ])).count(),
        ),
    )
    assert out["hit"] == 1


def test_foreach_bulk_zero_property_addn(engine):
    """ForEach bulk AddN with an empty properties list must create one
    bare node per item (the fast path's zip(*[]) collapsed to zero)."""
    batch = write_batch().for_each_param(
        "items", write_batch().var_as("u", g().add_n("Thing", []))
    )
    run_write(
        engine, batch,
        params={"items": [{}, {}, {}]},
        types={"items": {"Array": "Object"}},
    )
    out = run_read(
        engine, read_batch().var_as("n", g().n_with_label("Thing").count())
    )
    assert out["n"] == 3


def test_id_predicate_beyond_2p53(engine):
    """$id comparisons must be exact past 2^53 (no float64 round-trip)."""
    big = (1 << 53) + 2  # adjacent even ids collapse under f64
    run_write(engine, write_batch().var_as("a", g().add_n("B", {"i": 1})))
    # forge a large-id node directly in the store (ids are u64 by contract)
    node_id = engine.store.node_order[-1]
    node = engine.store.nodes.pop(node_id)
    engine.store.node_order.remove(node_id)
    engine.store.nodes_by_label["B"].remove(node_id)
    node.id = big
    engine.store.nodes[big] = node
    engine.store.node_order.append(big)
    engine.store.nodes_by_label["B"].append(big)
    engine.store.out_adj[big] = engine.store.out_adj.pop(node_id)
    engine.store.in_adj[big] = engine.store.in_adj.pop(node_id)
    engine.store.bump()

    # Eq on the NEIGHBOURING float-equal integer must NOT match
    out = run_read(
        engine,
        read_batch().var_as(
            "n", g().n_with_label("B")
            .where(Predicate.eq("$id", big + 1)).count()
        ),
    )
    assert out["n"] == 0
    out = run_read(
        engine,
        read_batch().var_as(
            "n", g().n_with_label("B")
            .where(Predicate.eq("$id", big)).count()
        ),
    )
    assert out["n"] == 1
    # order ops exact at the boundary
    out = run_read(
        engine,
        read_batch().var_as(
            "n", g().n_with_label("B")
            .where(Predicate.gt("$id", big)).count()
        ),
    )
    assert out["n"] == 0
    out = run_read(
        engine,
        read_batch().var_as(
            "n", g().n_with_label("B")
            .where(Predicate.gte("$id", big)).count()
        ),
    )
    assert out["n"] == 1


def test_unknown_expression_variant_is_query_error(engine):
    """A bare-string Expr unit variant other than Id/Timestamp/
    DateTimeNow must raise the typed QueryError, not TypeError."""
    req = {
        "request_type": "read",
        "query_name": None,
        "query": {
            "queries": [{"Query": {"name": "n", "steps": [
                {"N": "All"},
                {"Where": {"Compare": {
                    "left": "Foo", "op": "Eq",
                    "right": {"Constant": {"I64": 1}},
                }}},
                "Count",
            ], "condition": None}}],
            "returning": [],
        },
        "parameters": {},
    }
    run_write(engine, write_batch().var_as("a", g().add_n("X")))
    with pytest.raises(QueryError, match="unknown expression variant"):
        engine.execute(req)


def test_haskey_counts_explicit_nulls_vectorized(engine):
    """HasKey over the vectorized mask path: explicit Null counts as
    having the key; absent does not (column null_mask route)."""
    batch = write_batch()
    batch = batch.var_as("a", g().add_n("K", {"p": 1}))
    batch = batch.var_as("b", g().add_n("K", {"p": None}))
    batch = batch.var_as("c", g().add_n("K", {"q": 2}))
    run_write(engine, batch)
    out = run_read(
        engine,
        read_batch().var_as(
            "n", g().n_with_label("K").has_key("p").count()
        ),
    )
    assert out["n"] == 2  # value + explicit Null, not the absent row


def test_dim_mismatch_is_query_error_without_batcher():
    """The unbatched path must raise the same clean QueryError on a
    query-vector dimension mismatch as the batched one (it used to
    surface a numpy ValueError 500)."""
    eng = Engine(batch_window_ms=None)
    run_write(
        eng,
        write_batch()
        .var_as("i", g().create_vector_index_nodes("D", "v"))
        .var_as("a", g().add_n("D", {"v": [1.0, 0.0, 0.0]})),
    )
    with pytest.raises(QueryError, match="dimension"):
        run_read(
            eng,
            read_batch().var_as(
                "h", g().vector_search_nodes("D", "v", [1.0, 0.0], 1)
            ),
        )
    eng.close()


def test_bulk_null_string_matches_eager_path(engine):
    """The wire encodes null as the bare string "Null"; the deferred
    bulk column path (>64 items) must store the same null the eager
    path does — not the literal string."""
    batch = write_batch().for_each_param(
        "xs", write_batch().var_as("u", g().add_n("B", [
            ("s", {"Expr": {"Param": "xs.s"}})]))
    )
    run_write(engine, batch,
              params={"xs": [{"s": "Null"}] * 70},
              types={"xs": {"Array": "Object"}})
    out = run_read(engine, read_batch().var_as(
        "n", g().n_with_label("B").where(Predicate.is_null("s")).count()))
    assert out["n"] == 70


def test_add_e_param_stale_id_errors_and_rolls_back(engine):
    """AddE to a Param target holding a stale id must error + roll back
    (the documented strict contract), not silently write nothing."""
    run_write(engine, write_batch().var_as("a", g().add_n("S")))
    src_id = engine.store.node_order[-1]
    with pytest.raises(QueryError, match="unknown node id"):
        run_write(
            engine,
            write_batch()
            .var_as("marker", g().add_n("M"))
            .var_as("e", g().n(NodeRef.ids([src_id]))
                    .add_e("REL", {"Param": "target"})),
            params={"target": 999_999},
            types={"target": "I64"},
        )
    out = run_read(engine, read_batch().var_as(
        "n", g().n_with_label("M").count()))
    assert out["n"] == 0  # the whole batch rolled back


def test_values_and_value_map_empty_props_row_count(engine):
    """Empty property selections behave identically at any stream size
    (the >64-row dense paths used to crash / drop rows)."""
    batch = write_batch().for_each_param(
        "xs", write_batch().var_as("u", g().add_n("V", [
            ("i", {"Expr": {"Param": "xs.i"}})]))
    )
    run_write(engine, batch,
              params={"xs": [{"i": i} for i in range(70)]},
              types={"xs": {"Array": "Object"}})
    out = run_read(engine, read_batch().var_as(
        "v", g().n_with_label("V").values([])))
    assert out["v"] == []
    out = run_read(engine, read_batch().var_as(
        "m", g().n_with_label("V").value_map([])))
    assert out["m"] == [{}] * 70


def test_typed_array_params_validate_cells(engine):
    """Array parameter cells validate like the scalar paths: no silent
    coercion of strings/bools into numbers or null into 'None'."""
    def req(value, ty):
        return (
            write_batch().var_as("u", g().add_n("T", [
                ("p", {"Expr": {"Param": "a"}})])),
            {"a": value}, {"a": {"Array": ty}},
        )

    for value, ty in (
        (["12", 3], "I64"),
        ([True, 1], "I64"),
        ([1.5, "x"], "F64"),
        (["ok", None], "String"),
    ):
        batch, params, types = req(value, ty)
        with pytest.raises(Exception, match="must be"):
            run_write(engine, batch, params=params, types=types)
    # valid arrays still land
    batch, params, types = req([1, 2, 3], "I64")
    run_write(engine, batch, params=params, types=types)


def test_drop_high_degree_node_via_query(engine):
    """DropN over a >64-degree node takes the store's batched removal;
    state must match, and a later failure must roll the drop back."""
    run_write(engine, write_batch().var_as("hub", g().add_n("H")))
    hub = engine.store.node_order[-1]
    others = []
    for i in range(80):
        run_write(engine, write_batch().var_as("o", g().add_n("O")))
        others.append(engine.store.node_order[-1])
        run_write(engine, write_batch().var_as(
            "e", g().n(NodeRef.ids([hub])).add_e("E", NodeRef.ids([others[-1]]))))
    assert engine.store.edge_count() == 80

    # failing batch: the drop must roll back completely
    with pytest.raises(Exception):
        run_write(
            engine,
            write_batch()
            .var_as("d", g().n(NodeRef.ids([hub])).drop())
            .var_as("bad", g().n(NodeRef.ids([others[0]]))
                    .add_e("E", NodeRef.ids([999_999]))),
        )
    assert engine.store.edge_count() == 80
    assert hub in engine.store.nodes

    run_write(engine, write_batch().var_as(
        "d", g().n(NodeRef.ids([hub])).drop()))
    assert engine.store.edge_count() == 0
    assert hub not in engine.store.nodes
    assert engine.store.node_count() == 80

"""Parity fixture generator.

Mirrors the reference's three fixture buckets
(``sdks/tests/parity/README.md:1-20``, generator
``sdks/rust/examples/generate_parity_fixtures.rs``):

- ``runtime/``  — ordered request fixtures replayed against a live engine
  (writes seed the dataset; reads assert behavior)
- ``combo/``    — the source x filter x bound x terminal permutation
  matrix (3 x 4 x 4 x 4 = 192 read requests)
- ``json-only/``— exhaustive-AST fixtures that must validate and
  round-trip but are not executed

Run ``python tests/parity/gen.py`` to (re)generate ``fixtures/``; the
replay test asserts results against ``expected/`` goldens.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from helix_tpu import wire
from helix_tpu.dsl import (
    BatchCondition, BindingProjection, BindingRef, DynamicQueryRequest, Expr,
    IndexSpec, NodeRef, Order, Predicate, Projection, PropertyValue,
    RepeatConfig, SourcePredicate, define_params, g, param, read_batch, sub,
    write_batch,
)

HERE = Path(__file__).resolve().parent
FIXTURES = HERE / "fixtures"


def runtime_fixtures() -> list[tuple[str, DynamicQueryRequest]]:
    """Ordered fixtures: writes seed, reads assert (replayed in order)."""
    out: list[tuple[str, DynamicQueryRequest]] = []

    def add(name: str, req: DynamicQueryRequest) -> None:
        out.append((name, req))

    add(
        "001-write-setup-indexes",
        DynamicQueryRequest.write(
            write_batch()
            .var_as(
                "name_idx",
                g().create_index(IndexSpec.node_equality("ParityUser", "externalId")),
            )
            .var_as(
                "age_idx",
                g().create_index(IndexSpec.node_range("ParityUser", "age")),
            )
            .var_as("vec_idx", g().create_vector_index_nodes("ParityDoc", "embedding"))
            .var_as("txt_idx", g().create_text_index_nodes("ParityDoc", "body"))
            .returning(["name_idx", "age_idx", "vec_idx", "txt_idx"])
        ),
    )
    add(
        "002-write-seed-users",
        DynamicQueryRequest.write(
            write_batch()
            .var_as(
                "alice",
                g().add_n("ParityUser", {
                    "externalId": "user-alice", "name": "Alice", "age": 34,
                    "status": "active", "score": 91.5,
                }),
            )
            .var_as(
                "bob",
                g().add_n("ParityUser", {
                    "externalId": "user-bob", "name": "Bob", "age": 27,
                    "status": "inactive", "score": 55.0,
                }),
            )
            .var_as(
                "carol",
                g().add_n("ParityUser", {
                    "externalId": "user-carol", "name": "Carol", "age": 41,
                    "status": "active", "score": 73.25,
                }),
            )
            .returning(["alice", "bob", "carol"])
        ),
    )
    add(
        "003-write-seed-edges",
        DynamicQueryRequest.write(
            write_batch()
            .var_as("alice", g().n_where(SourcePredicate.eq("externalId", "user-alice")))
            .var_as("bob", g().n_where(SourcePredicate.eq("externalId", "user-bob")))
            .var_as("carol", g().n_where(SourcePredicate.eq("externalId", "user-carol")))
            .var_as(
                "f1",
                g().n(NodeRef.var("alice")).add_e("FOLLOWS", NodeRef.var("bob"), {"since": 2020}),
            )
            .var_as(
                "f2",
                g().n(NodeRef.var("bob")).add_e("FOLLOWS", NodeRef.var("carol"), {"since": 2021}),
            )
            .var_as(
                "f3",
                g().n(NodeRef.var("alice")).add_e("FOLLOWS", NodeRef.var("carol"), {"since": 2022}),
            )
            .returning([])
        ),
    )
    add(
        "004-write-seed-docs",
        DynamicQueryRequest.write(
            write_batch()
            .var_as(
                "d1",
                g().add_n("ParityDoc", {
                    "title": "intro", "body": "graph databases store nodes and edges",
                    "embedding": PropertyValue.f32_array([1.0, 0.0, 0.0, 0.0]),
                }),
            )
            .var_as(
                "d2",
                g().add_n("ParityDoc", {
                    "title": "vectors", "body": "vector search finds nearest neighbors",
                    "embedding": PropertyValue.f32_array([0.0, 1.0, 0.0, 0.0]),
                }),
            )
            .var_as(
                "d3",
                g().add_n("ParityDoc", {
                    "title": "hybrid", "body": "hybrid queries mix graph and vector search",
                    "embedding": PropertyValue.f32_array([0.7, 0.7, 0.0, 0.0]),
                }),
            )
            .returning([])
        ),
    )
    add(
        "005-read-order-range-values",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "ordered",
                g()
                .n_with_label("ParityUser")
                .order_by_multiple([("status", Order.Asc), ("age", Order.Desc)])
                .range(0, 2)
                .value_map(["externalId", "age", "status"]),
            )
            .returning(["ordered"])
        ),
    )
    add(
        "006-read-edge-count",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "edge_count",
                g()
                .n_with_label("ParityUser")
                .where(Predicate.eq("externalId", "user-alice"))
                .out_e("FOLLOWS")
                .count(),
            )
            .returning(["edge_count"])
        ),
    )
    add(
        "007-read-edge-properties",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "edges",
                g()
                .e_with_label("FOLLOWS")
                .edge_has("since", 2021)
                .edge_properties(),
            )
            .returning(["edges"])
        ),
    )
    add(
        "008-read-edge-endpoints",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "from_nodes",
                g()
                .e_with_label("FOLLOWS")
                .edge_has_label("FOLLOWS")
                .in_n()
                .value_map(["externalId", "name"]),
            )
            .var_as(
                "to_nodes",
                g()
                .e_with_label("FOLLOWS")
                .out_n()
                .value_map(["externalId", "name"]),
            )
            .returning(["from_nodes", "to_nodes"])
        ),
    )
    add(
        "009-read-conditional-var-not-empty",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "alice",
                g()
                .n_with_label("ParityUser")
                .where(Predicate.eq("externalId", "user-alice")),
            )
            .var_as_if(
                "friends",
                BatchCondition.var_not_empty("alice"),
                g().n(NodeRef.var("alice")).out("FOLLOWS").value_map(["externalId", "name"]),
            )
            .returning(["alice", "friends"])
        ),
    )
    add(
        "010-read-count-all-users",
        DynamicQueryRequest.read(
            read_batch()
            .var_as("user_count", g().n_with_label("ParityUser").count())
            .returning(["user_count"])
        ),
    )
    add(
        "011-read-filtered-values",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "actives",
                g()
                .n_with_label("ParityUser")
                .where(Predicate.eq("status", "active"))
                .order_by("name", Order.Asc)
                .values(["name"]),
            )
            .returning(["actives"])
        ),
    )
    add(
        "012-read-two-hop",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "fof",
                g()
                .n_where(SourcePredicate.eq("externalId", "user-alice"))
                .out("FOLLOWS")
                .out("FOLLOWS")
                .dedup()
                .values(["name"]),
            )
            .returning(["fof"])
        ),
    )
    add(
        "013-read-projection-expr",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "alice",
                g()
                .n_with_label("ParityUser")
                .where(Predicate.eq("externalId", "user-alice"))
                .project([
                    Projection.property("externalId", "id"),
                    Projection.property("name"),
                    Projection.expr(
                        "score_plus_one", Expr.prop("score").add(Expr.val(1.0))
                    ),
                    Projection.expr(
                        "status_label",
                        Expr.case(
                            [(Predicate.eq("status", "active"), Expr.val("enabled"))],
                            Expr.val("disabled"),
                        ),
                    ),
                ]),
            )
            .returning(["alice"])
        ),
    )
    add(
        "014-read-vector-search",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "hits",
                g()
                .vector_search_nodes("ParityDoc", "embedding", [1.0, 0.05, 0.0, 0.0], 2)
                .value_map(["title", "$distance"]),
            )
            .returning(["hits"])
        ),
    )
    add(
        "015-read-text-search",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "hits",
                g()
                .text_search_nodes("ParityDoc", "body", "vector search", 2)
                .value_map(["title"]),
            )
            .returning(["hits"])
        ),
    )
    add(
        "016-read-vector-then-graph",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "seed",
                g()
                .vector_search_nodes("ParityDoc", "embedding", [0.6, 0.6, 0.0, 0.0], 1)
                .value_map(["$id", "title", "$distance"]),
            )
            .var_as(
                "count_from_seed",
                g().n(NodeRef.var("seed")).count(),
            )
            .returning(["seed", "count_from_seed"])
        ),
    )
    add(
        "017-read-edge-source",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "recent",
                g()
                .e_with_label("FOLLOWS")
                .where(Predicate.gte("since", 2021))
                .order_by("since", Order.Desc)
                .edge_properties(),
            )
            .returning(["recent"])
        ),
    )
    add(
        "018-read-group-aggregate",
        DynamicQueryRequest.read(
            read_batch()
            .var_as("by_status", g().n_with_label("ParityUser").group_count("status"))
            .var_as("mean_age", g().n_with_label("ParityUser").aggregate_by("Mean", "age"))
            .returning(["by_status", "mean_age"])
        ),
    )
    add(
        "019-read-conditional-batch",
        DynamicQueryRequest.read(
            read_batch()
            .var_as("ghosts", g().n_with_label("Ghost"))
            .var_as_if(
                "gated",
                BatchCondition.var_not_empty("ghosts"),
                g().n_with_label("ParityUser").count(),
            )
            .var_as_if(
                "open",
                BatchCondition.var_empty("ghosts"),
                g().n_with_label("ParityUser").count(),
            )
            .returning(["gated", "open"])
        ),
    )
    add(
        "020-read-union-coalesce",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "fanout",
                g()
                .n_where(SourcePredicate.eq("externalId", "user-alice"))
                .union([sub().out("FOLLOWS"), sub().out("FOLLOWS")])
                .count(),
            )
            .var_as(
                "first_hop",
                g()
                .n_with_label("ParityUser")
                .coalesce([sub().out("FOLLOWS"), sub().out_e("FOLLOWS")])
                .dedup()
                .count(),
            )
            .returning(["fanout", "first_hop"])
        ),
    )
    add(
        "021-read-repeat",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "reach",
                g()
                .n_where(SourcePredicate.eq("externalId", "user-alice"))
                .repeat(RepeatConfig(sub().out("FOLLOWS")).times(2))
                .dedup()
                .values(["name"]),
            )
            .returning(["reach"])
        ),
    )
    add(
        "022-read-row-bindings",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "pairs",
                g()
                .n_with_label("ParityUser")
                .bind("follower")
                .out("FOLLOWS")
                .project_bindings(
                    [
                        BindingProjection.binding("follower", "name", "from_name"),
                        BindingProjection.current("name", "to_name"),
                        BindingProjection.coalesce(
                            [
                                BindingRef.current("nickname"),
                                BindingRef.current("name"),
                            ],
                            "display",
                        ),
                    ],
                    distinct=True,
                ),
            )
            .returning(["pairs"])
        ),
    )
    p23 = define_params({"min_age": param.i64(), "want": param.string()})
    add(
        "023-read-parameters",
        read_batch()
        .var_as(
            "grown",
            g()
            .n_with_label("ParityUser")
            .where(Predicate.gt("age", p23.min_age))
            .where(Predicate.eq("status", p23.want))
            .order_by("age", Order.Asc)
            .values(["name"]),
        )
        .returning(["grown"])
        .to_dynamic_request(p23, {"min_age": 30, "want": "active"}),
    )
    p24 = define_params({"users": param.array(param.object())})
    add(
        "024-write-foreach-param-create",
        write_batch()
        .for_each_param(
            "users",
            write_batch().var_as(
                "u",
                g().add_n("ImportedUser", [("name", Expr.param("users.name"))]),
            ),
        )
        .var_as("imported", g().n_with_label("ImportedUser").count())
        .returning(["imported"])
        .to_dynamic_request(
            p24, {"users": [{"name": "Zed"}, {"name": "Yan"}]}
        ),
    )
    add(
        "025-write-set-remove-property",
        DynamicQueryRequest.write(
            write_batch()
            .var_as(
                "bumped",
                g()
                .n_where(SourcePredicate.eq("externalId", "user-bob"))
                .set_property("age", Expr.prop("age").add(Expr.val(1)))
                .values(["age"]),
            )
            .var_as(
                "cleaned",
                g()
                .n_where(SourcePredicate.eq("externalId", "user-bob"))
                .remove_property("score")
                .value_map(["name", "score"]),
            )
            .returning(["bumped", "cleaned"])
        ),
    )
    add(
        "026-read-within-without",
        DynamicQueryRequest.read(
            read_batch()
            .var_as("followed", g().n_with_label("ParityUser").out("FOLLOWS").dedup())
            .var_as(
                "roots",
                g().n_with_label("ParityUser").without("followed").values(["name"]),
            )
            .returning(["roots"])
        ),
    )
    add(
        "027-write-drop-edge",
        DynamicQueryRequest.write(
            write_batch()
            .var_as("carol", g().n_where(SourcePredicate.eq("externalId", "user-carol")))
            .var_as(
                "cut",
                g()
                .n_where(SourcePredicate.eq("externalId", "user-bob"))
                .drop_edge_labeled(NodeRef.var("carol"), "FOLLOWS"),
            )
            .var_as("remaining", g().e_with_label("FOLLOWS").count())
            .returning(["remaining"])
        ),
    )
    add(
        "028-write-drop-node-cascades",
        DynamicQueryRequest.write(
            write_batch()
            .var_as(
                "gone",
                g().n_where(SourcePredicate.eq("externalId", "user-bob")).drop(),
            )
            .var_as("users", g().n_with_label("ParityUser").count())
            .var_as("edges", g().e_with_label("FOLLOWS").count())
            .returning(["users", "edges"])
        ),
    )
    add(
        "029-read-reserved-noops",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "still_counts",
                g().n_with_label("ParityUser").fold().unfold().path()
                .simple_path().with_sack(0).sack_set("s").sack_add("s")
                .sack_get().count(),
            )
            .returning(["still_counts"])
        ),
    )
    add(
        "030-read-order-multi-limit",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "page",
                g()
                .n_with_label("ParityUser")
                .order_by_multiple([("status", Order.Asc), ("age", Order.Desc)])
                .limit(2)
                .values(["name"]),
            )
            .returning(["page"])
        ),
    )
    add(
        "031-read-exists-id-label",
        DynamicQueryRequest.read(
            read_batch()
            .var_as("has_users", g().n_with_label("ParityUser").exists())
            .var_as("has_ghosts", g().n_with_label("Ghost").exists())
            .var_as(
                "labels",
                g().n_where(SourcePredicate.eq("externalId", "user-alice")).label(),
            )
            .returning(["has_users", "has_ghosts", "labels"])
        ),
    )
    add(
        "032-read-edge-endpoints",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "targets",
                g()
                .n_where(SourcePredicate.eq("externalId", "user-alice"))
                .out_e("FOLLOWS")
                .in_n()
                .order_by("name", Order.Asc)
                .values(["name"]),
            )
            .returning(["targets"])
        ),
    )
    return out


def combo_fixtures() -> list[tuple[str, DynamicQueryRequest]]:
    """3 sources x 4 filters x 4 bounds x 4 terminals = 192 permutations
    (mirrors the reference combo matrix,
    ``generate_parity_fixtures.rs:870-893``)."""
    sources = [
        ("n-all", lambda: g().n()),
        ("n-label", lambda: g().n_with_label("ParityUser")),
        ("e-label", lambda: g().e_with_label("FOLLOWS")),
    ]
    filters = [
        ("nofilter", lambda t: t),
        ("has", lambda t: t.has("status", "active")),
        ("where-gt", lambda t: t.where(Predicate.gt("age", 20))),
        ("dedup", lambda t: t.dedup()),
    ]
    bounds = [
        ("nobound", lambda t: t),
        ("limit", lambda t: t.limit(2)),
        ("skip", lambda t: t.skip(1)),
        ("range", lambda t: t.range(0, 2)),
    ]
    terminals = [
        ("count", lambda t: t.count()),
        ("exists", lambda t: t.exists()),
        ("id", lambda t: t.id()),
        ("valuemap", lambda t: t.value_map(["name", "since"])),
    ]
    out = []
    index = 0
    for sname, source in sources:
        for fname, filt in filters:
            for bname, bound in bounds:
                for tname, term in terminals:
                    index += 1
                    name = f"{index:03d}-{sname}-{fname}-{bname}-{tname}"
                    traversal = term(bound(filt(source())))
                    req = DynamicQueryRequest.read(
                        read_batch().var_as("result", traversal).returning(["result"])
                    )
                    out.append((name, req))
    return out


def json_only_fixtures() -> list[tuple[str, DynamicQueryRequest]]:
    """Exhaustive-AST fixtures: serialize/validate/round-trip only."""
    out = []

    out.append((
        "001-all-predicates",
        DynamicQueryRequest.read(
            read_batch().var_as(
                "x",
                g().n().where(Predicate.and_([
                    Predicate.eq("a", 1), Predicate.neq("b", "s"),
                    Predicate.gt("c", 1.5), Predicate.gte("d", 0),
                    Predicate.lt("e", 10), Predicate.lte("f", 10),
                    Predicate.between("grange", 1, 5),
                    Predicate.has_key("h"), Predicate.is_null("i"),
                    Predicate.is_not_null("j"),
                    Predicate.starts_with("k", "pre"),
                    Predicate.ends_with("l", "post"),
                    Predicate.contains("m", "mid"),
                    Predicate.contains_param("n", "needle"),
                    Predicate.is_in("o", [1, 2, 3]),
                    Predicate.is_in_param("p", "choices"),
                    Predicate.or_([Predicate.not_(Predicate.eq("q", False))]),
                    Predicate.compare(
                        Expr.prop("r").mul(Expr.val(2)), "Gte", Expr.param("s")
                    ),
                ])),
            )
        ),
    ))
    out.append((
        "002-all-property-values",
        DynamicQueryRequest.write(
            write_batch().var_as(
                "x",
                g().add_n("Kitchen", [
                    ("null", None), ("bool", True), ("i64", 42),
                    ("f64", 2.5), ("f32", PropertyValue.f32(1.25)),
                    ("string", "text"),
                    ("datetime", PropertyValue.date_time(1700000000000)),
                    ("bytes", PropertyValue.bytes(b"\x00\x01\xff")),
                    ("i64arr", [1, 2, 3]), ("f64arr", [1.5, 2.5]),
                    ("f32arr", PropertyValue.f32_array([0.5])),
                    ("strarr", ["a", "b"]),
                    ("mixed", PropertyValue.array([1, "two", None])),
                    ("obj", {"nested": {"deep": 1}}),
                ]),
            )
        ),
    ))
    out.append((
        "003-all-exprs",
        DynamicQueryRequest.read(
            read_batch().var_as(
                "x",
                g().n().project([
                    Projection.expr("a", Expr.prop("p") + Expr.val(1)),
                    Projection.expr("b", Expr.prop("p") - Expr.val(1)),
                    Projection.expr("c", Expr.prop("p") * Expr.val(2)),
                    Projection.expr("d", Expr.prop("p") / Expr.val(2)),
                    Projection.expr("e", Expr.prop("p") % Expr.val(2)),
                    Projection.expr("f", -Expr.prop("p")),
                    Projection.expr("g", Expr.id()),
                    Projection.expr("h", Expr.timestamp()),
                    Projection.expr("i", Expr.date_time_now()),
                    Projection.expr("j", Expr.param("q")),
                    Projection.expr("k", Expr.case(
                        [(Predicate.eq("x", 1), Expr.val("one"))], Expr.val("other")
                    )),
                ]),
            )
        ),
    ))
    out.append((
        "004-all-index-specs",
        DynamicQueryRequest.write(
            write_batch()
            .var_as("a", g().create_index(IndexSpec.node_equality("L", "p")))
            .var_as("b", g().create_index(IndexSpec.node_unique_equality("L", "q")))
            .var_as("c", g().create_index(IndexSpec.node_range("L", "r")))
            .var_as("d", g().create_index(IndexSpec.node_range_desc("L", "s")))
            .var_as("e", g().create_index(IndexSpec.edge_equality("E", "p")))
            .var_as("f", g().create_index(IndexSpec.edge_range("E", "q")))
            .var_as("g2", g().create_index(IndexSpec.node_vector("L", "v", "tenant")))
            .var_as("h", g().create_index(IndexSpec.node_text("L", "t")))
            .var_as("i", g().create_index(IndexSpec.edge_vector("E", "v")))
            .var_as("j", g().create_index(IndexSpec.edge_text("E", "t")))
            .var_as("k", g().drop_index(IndexSpec.node_equality("L", "p")))
        ),
    ))
    out.append((
        "005-all-navigation",
        DynamicQueryRequest.read(
            read_batch().var_as(
                "x",
                g().n().out("A").in_("B").both().out_e("C").out_n()
                .both_e(None).other_n().in_e("D").in_n().count(),
            )
        ),
    ))
    out.append((
        "006-edge-search-steps",
        DynamicQueryRequest.read(
            read_batch()
            .var_as(
                "v",
                g().vector_search_edges("SIM", "emb", [1.0, 0.0], 5, tenant_value="t1"),
            )
            .var_as("t", g().text_search_edges("SIM", "note", "query text", 3))
        ),
    ))
    out.append((
        "007-repeat-full-config",
        DynamicQueryRequest.read(
            read_batch().var_as(
                "x",
                g().n().repeat(
                    RepeatConfig(sub().out("NEXT"))
                    .until(Predicate.eq("leaf", True))
                    .emit_if(Predicate.gt("depth", 1))
                    .max_depth(7)
                ).count(),
            )
        ),
    ))
    out.append((
        "008-choose-optional",
        DynamicQueryRequest.read(
            read_batch().var_as(
                "x",
                g().n()
                .choose(Predicate.eq("kind", "a"), sub().out(), sub().in_())
                .optional(sub().out("MAYBE"))
                .count(),
            )
        ),
    ))
    out.append((
        "009-mutations",
        DynamicQueryRequest.write(
            write_batch().var_as(
                "x",
                g().n(NodeRef.ids([1, 2]))
                .add_e("REL", NodeRef.param("targets"), {"w": 1})
                .set_property("touched", True)
                .remove_property("stale")
                .drop_edge(NodeRef.var("others"))
                .drop_edge_labeled(NodeRef.ids([3]), "REL")
                .drop_edge_by_id({"Ids": [7]})
                .drop(),
            )
        ),
    ))
    out.append((
        "010-stream-bounds",
        DynamicQueryRequest.read(
            read_batch().var_as(
                "x",
                g().n().limit(Expr.param("lim")).skip(2)
                .range(Expr.param("lo"), Expr.param("hi")).count(),
            )
        ),
    ))
    out.append((
        "011-batch-conditions",
        DynamicQueryRequest.read(
            read_batch()
            .var_as("a", g().n())
            .var_as_if("b", BatchCondition.var_not_empty("a"), g().n().count())
            .var_as_if("c", BatchCondition.var_empty("a"), g().n().count())
            .var_as_if("d", BatchCondition.var_min_size("a", 3), g().n().count())
            .var_as_if("e", BatchCondition.prev_not_empty, g().n().count())
        ),
    ))
    out.append((
        "012-big-u64-ids",
        DynamicQueryRequest.read(
            read_batch().var_as(
                "x", g().n(NodeRef.ids([2**63 + 11, 2**53 + 1])).id()
            )
        ),
    ))
    return out


def write_bucket(bucket: str, fixtures: list[tuple[str, DynamicQueryRequest]]) -> None:
    directory = FIXTURES / bucket
    directory.mkdir(parents=True, exist_ok=True)
    for name, req in fixtures:
        body = req.encode()
        wire.validate_request(body)
        path = directory / f"{name}.json"
        path.write_text(
            json.dumps(body, indent=2, ensure_ascii=False) + "\n", encoding="utf-8"
        )


def main() -> None:
    write_bucket("runtime", runtime_fixtures())
    write_bucket("combo", combo_fixtures())
    write_bucket("json-only", json_only_fixtures())
    counts = {
        bucket: len(list((FIXTURES / bucket).glob("*.json")))
        for bucket in ("runtime", "combo", "json-only")
    }
    print(f"generated fixtures: {counts}")


if __name__ == "__main__":
    main()

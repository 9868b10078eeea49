"""Advanced step-catalog coverage: control flow, row bindings, aggregation,
dotted paths, expressions — the long tail of the interpreter contract."""

import pytest

from helix_tpu.dsl import (
    AggregateFunction, BindingProjection, BindingRef, Expr, NodeRef, Order,
    Predicate, RepeatConfig, SourcePredicate, SubTraversal, g, read_batch, sub,
    write_batch,
)
from helix_tpu.engine import Engine, QueryError


def run(engine, batch, params=None, types=None):
    req = {
        "request_type": "write" if batch.kind == "write" else "read",
        "query_name": None,
        "query": batch.encode(),
        "parameters": params or {},
    }
    if types:
        req["parameter_types"] = types
    return engine.execute(req)


@pytest.fixture
def engine():
    eng = Engine()
    run(
        eng,
        write_batch()
        .var_as("a", g().add_n("Person", {"name": "ann", "age": 30, "meta": {"city": "oslo", "rank": 1}}))
        .var_as("b", g().add_n("Person", {"name": "ben", "age": 25, "meta": {"city": "rome", "rank": 2}}))
        .var_as("c", g().add_n("Person", {"name": "cat", "age": 35}))
        .var_as("p1", g().add_n("Post", {"title": "hello world"}))
        .var_as("p2", g().add_n("Post", {"title": "second post"}))
        .var_as("e1", g().n(NodeRef.var("a")).add_e("POSTED", NodeRef.var("p1"), {"weight": 0.9}))
        .var_as("e2", g().n(NodeRef.var("b")).add_e("POSTED", NodeRef.var("p2"), {"weight": 0.4}))
        .var_as("e3", g().n(NodeRef.var("a")).add_e("FOLLOWS", NodeRef.var("b")))
        .var_as("e4", g().n(NodeRef.var("b")).add_e("FOLLOWS", NodeRef.var("c"))),
    )
    return eng


def test_union(engine):
    out = run(
        engine,
        read_batch().var_as(
            "both",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .union([sub().out("POSTED"), sub().out("FOLLOWS")])
            .count(),
        ),
    )
    assert out["both"] == 2


def test_choose_with_else(engine):
    # Young people -> their posts; others -> who they follow.
    out = run(
        engine,
        read_batch().var_as(
            "routed",
            g()
            .n_with_label("Person")
            .choose(
                Predicate.lt("age", 28),
                sub().out("POSTED"),
                sub().out("FOLLOWS"),
            )
            .value_map(["title", "name"]),
        ),
    )
    rows = out["routed"]
    # ben (25) -> post p2; ann (30) -> follows ben; cat (35) -> follows nobody.
    assert {"title": "second post"} in rows
    assert {"name": "ben"} in rows
    assert len(rows) == 2


def test_choose_without_else_passthrough(engine):
    out = run(
        engine,
        read_batch().var_as(
            "kept",
            g()
            .n_with_label("Person")
            .choose(Predicate.lt("age", 28), sub().out("POSTED"))
            .value_map(["title", "name"]),
        ),
    )
    rows = out["kept"]
    assert {"title": "second post"} in rows  # ben routed
    names = {r.get("name") for r in rows if "name" in r}
    assert names == {"ann", "cat"}  # pass-through untouched


def test_coalesce_per_traverser(engine):
    # First non-empty branch per traverser: posts, else follows.
    out = run(
        engine,
        read_batch().var_as(
            "pick",
            g()
            .n_with_label("Person")
            .coalesce([sub().out("POSTED"), sub().out("FOLLOWS")])
            .value_map(["title", "name"]),
        ),
    )
    rows = out["pick"]
    # ann has a post -> p1 (not her follow); ben -> p2; cat -> nothing.
    assert {"title": "hello world"} in rows
    assert {"title": "second post"} in rows
    assert len(rows) == 2


def test_optional(engine):
    out = run(
        engine,
        read_batch().var_as(
            "opt",
            g()
            .n_with_label("Person")
            .optional(sub().out("POSTED"))
            .count(),
        ),
    )
    # ann->p1, ben->p2, cat stays cat.
    assert out["opt"] == 3


def test_repeat_times(engine):
    out = run(
        engine,
        read_batch().var_as(
            "hops",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .repeat(RepeatConfig(sub().out("FOLLOWS")).times(2))
            .values(["name"]),
        ),
    )
    assert out["hops"] == ["cat"]


def test_repeat_emit_all(engine):
    out = run(
        engine,
        read_batch().var_as(
            "trail",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .repeat(RepeatConfig(sub().out("FOLLOWS")).times(2).emit_all())
            .values(["name"]),
        ),
    )
    # All = every distinct frontier state once: ann (initial), ben, cat.
    assert sorted(out["trail"]) == ["ann", "ben", "cat"]


def test_repeat_until(engine):
    out = run(
        engine,
        read_batch().var_as(
            "stop_at_cat",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .repeat(
                RepeatConfig(sub().out("FOLLOWS")).until(Predicate.eq("name", "cat")).max_depth(10)
            )
            .values(["name"]),
        ),
    )
    assert out["stop_at_cat"] == ["cat"]


def test_as_select(engine):
    out = run(
        engine,
        read_batch().var_as(
            "back",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .as_("me")
            .out("FOLLOWS")
            .select("me")
            .values(["name"]),
        ),
    )
    assert out["back"] == ["ann"]


def test_within_without(engine):
    out = run(
        engine,
        read_batch()
        .var_as("followed", g().n_with_label("Person").out("FOLLOWS"))
        .var_as(
            "not_followed",
            g().n_with_label("Person").without("followed").values(["name"]),
        )
        .var_as(
            "followed_names",
            g().n_with_label("Person").within("followed").values(["name"]),
        ),
    )
    assert out["not_followed"] == ["ann"]
    assert sorted(out["followed_names"]) == ["ben", "cat"]


def test_bind_project_bindings(engine):
    out = run(
        engine,
        read_batch().var_as(
            "rows",
            g()
            .n_with_label("Person")
            .bind("person")
            .out("POSTED")
            .project_bindings([
                BindingProjection.binding("person", "name", "author"),
                BindingProjection.current("title", "post"),
                BindingProjection.coalesce(
                    [BindingRef.current("missing"), BindingRef.binding("person", "age")],
                    "age_fallback",
                ),
            ]),
        ),
    )
    rows = sorted(out["rows"], key=lambda r: r["author"])
    assert rows == [
        {"author": "ann", "post": "hello world", "age_fallback": 30},
        {"author": "ben", "post": "second post", "age_fallback": 25},
    ]


def test_project_bindings_distinct(engine):
    out = run(
        engine,
        read_batch().var_as(
            "labels",
            g()
            .n_with_label("Person")
            .out()
            .project_bindings(
                [BindingProjection.current("$label", "kind")], distinct=True
            ),
        ),
    )
    assert sorted(r["kind"] for r in out["labels"]) == ["Person", "Post"]


def test_dotted_property_paths(engine):
    out = run(
        engine,
        read_batch()
        .var_as(
            "oslo",
            g().n_with_label("Person").where(Predicate.eq("meta.city", "oslo")).values(["name"]),
        )
        .var_as(
            "ranked",
            g()
            .n_with_label("Person")
            .where(Predicate.is_not_null("meta.rank"))
            .order_by("meta.rank", Order.Desc)
            .values(["name"]),
        ),
    )
    assert out["oslo"] == ["ann"]
    assert out["ranked"] == ["ben", "ann"]


def test_order_by_multiple(engine):
    run(
        engine,
        write_batch().var_as("d", g().add_n("Person", {"name": "abe", "age": 25})),
    )
    out = run(
        engine,
        read_batch().var_as(
            "sorted",
            g()
            .n_with_label("Person")
            .order_by_multiple([("age", Order.Asc), ("name", Order.Asc)])
            .values(["name"]),
        ),
    )
    assert out["sorted"] == ["abe", "ben", "ann", "cat"]


def test_group_and_aggregate(engine):
    out = run(
        engine,
        read_batch()
        .var_as("by_city", g().n_with_label("Person").group_count("meta.city"))
        .var_as("sum_age", g().n_with_label("Person").aggregate_by(AggregateFunction.Sum, "age"))
        .var_as("min_age", g().n_with_label("Person").aggregate_by(AggregateFunction.Min, "age"))
        .var_as("groups", g().n_with_label("Person").group("meta.city")),
    )
    assert out["by_city"] == {"oslo": 1, "rome": 1, "null": 1}
    assert out["sum_age"] == 90
    assert out["min_age"] == 25
    assert {r["name"] for r in out["groups"]["oslo"]} == {"ann"}


def test_expr_case_and_arithmetic(engine):
    out = run(
        engine,
        read_batch().var_as(
            "proj",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .project([
                {"alias": "next", "expr": (Expr.prop("age") + Expr.val(1)).node},
                {"alias": "half", "expr": (Expr.prop("age") / Expr.val(2.0)).node},
                {
                    "alias": "bucket",
                    "expr": Expr.case(
                        [(Predicate.gte("age", 30), Expr.val("old"))],
                        Expr.val("young"),
                    ).node,
                },
            ]),
        ),
    )
    assert out["proj"] == [{"next": 31, "half": 15.0, "bucket": "old"}]


def test_compare_predicate(engine):
    out = run(
        engine,
        read_batch().var_as(
            "heavy",
            g()
            .e_with_label("POSTED")
            .where(
                Predicate.compare(
                    Expr.prop("weight").mul(Expr.val(10)), "Gt", Expr.val(5)
                )
            )
            .count(),
        ),
    )
    assert out["heavy"] == 1


def test_is_in_and_string_predicates(engine):
    out = run(
        engine,
        read_batch()
        .var_as(
            "listed",
            g().n_with_label("Person").where(Predicate.is_in("name", ["ann", "cat", "zoe"])).count(),
        )
        .var_as(
            "prefixed",
            g().n_with_label("Post").where(Predicate.starts_with("title", "hello")).count(),
        )
        .var_as(
            "containing",
            g().n_with_label("Post").where(Predicate.contains("title", "cond")).count(),
        ),
    )
    assert out == {"listed": 2, "prefixed": 1, "containing": 1}


def test_between(engine):
    out = run(
        engine,
        read_batch().var_as(
            "mid",
            g().n_with_label("Person").where(Predicate.between("age", 26, 34)).values(["name"]),
        ),
    )
    assert out["mid"] == ["ann"]


def test_skip_and_range(engine):
    out = run(
        engine,
        read_batch()
        .var_as("skipped", g().n_with_label("Person").skip(1).count())
        .var_as("ranged", g().n_with_label("Person").range(1, 3).count()),
    )
    assert out == {"skipped": 2, "ranged": 2}


def test_store_and_inject(engine):
    out = run(
        engine,
        read_batch().var_as(
            "posts",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .store("anns")
            .out("POSTED")
            .inject("anns")
            .values(["name"]),
        ),
    )
    assert out["posts"] == ["ann"]


def test_edge_properties_terminal(engine):
    out = run(
        engine,
        read_batch().var_as(
            "edges",
            g().e_with_label("POSTED").where(Predicate.gt("weight", 0.5)).edge_properties(),
        ),
    )
    assert len(out["edges"]) == 1
    row = out["edges"][0]
    assert row["weight"] == 0.9 and "$from" in row and "$to" in row


def test_drop_edge_variants(engine):
    run(
        engine,
        write_batch().var_as(
            "cut",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .drop_edge_labeled(NodeRef.var("cut_targets"), "FOLLOWS")
            if False
            else g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .drop_edge(
                NodeRef.ids([2])  # ben is node 2 in insertion order
            ),
        ),
    )
    out = run(
        engine,
        read_batch().var_as("follows", g().e_with_label("FOLLOWS").count()),
    )
    assert out["follows"] == 1  # only ben->cat remains


def test_set_property_with_expr(engine):
    run(
        engine,
        write_batch().var_as(
            "bumped",
            g()
            .n_with_label("Person")
            .set_property("age", Expr.prop("age") + Expr.val(1)),
        ),
    )
    out = run(
        engine,
        read_batch().var_as(
            "ages",
            g().n_with_label("Person").order_by("age", Order.Asc).values(["age"]),
        ),
    )
    assert out["ages"] == [26, 31, 36]


def test_mutation_in_read_rejected(engine):
    with pytest.raises(QueryError):
        engine.execute({
            "request_type": "read",
            "query": {
                "queries": [{"Query": {"name": "x", "steps": [
                    {"AddN": {"label": "Hack", "properties": []}}
                ], "condition": None}}],
                "returns": [],
            },
        })


def test_limit_by_param(engine):
    out = run(
        engine,
        read_batch().var_as(
            "page",
            g().n_with_label("Person").limit({"Expr": {"Param": "n"}} and None or None)
            if False
            else g().n_with_label("Person").limit(Expr.param("n")).count(),
        ),
        params={"n": 2},
        types={"n": "I64"},
    )
    assert out["page"] == 2


def test_timestamp_and_datetime_now(engine):
    out = run(
        engine,
        read_batch().var_as(
            "t",
            g()
            .n_where(SourcePredicate.eq("name", "ann"))
            .project([
                {"alias": "ts", "expr": "Timestamp"},
                {"alias": "now", "expr": "DateTimeNow"},
            ]),
        ),
    )
    row = out["t"][0]
    assert isinstance(row["ts"], int) and row["ts"] > 1_600_000_000_000
    assert isinstance(row["now"], str) and row["now"].endswith("Z")


def test_reserved_noops_pass_through(engine):
    out = run(
        engine,
        read_batch().var_as(
            "n",
            g().n_with_label("Person").fold().unfold().path().simple_path()
            .with_sack(0).sack_set("x").sack_add("y").sack_get().count(),
        ),
    )
    assert out["n"] == 3


def test_order_by_desc_array_properties(engine):
    """Desc ordering on array-valued properties must actually invert
    (numarr/strarr sort-key families; review finding)."""
    from helix_tpu.dsl import DynamicQueryRequest, g, read_batch, write_batch

    eng = Engine()
    batch = write_batch()
    for i, arr in enumerate([[1, 2], [3, 0], [2, 9]]):
        batch = batch.var_as(
            f"a{i}", g().add_n("Arr", {"v": {"I64Array": arr}, "i": i})
        )
    eng.execute(DynamicQueryRequest.write(batch).encode())
    asc = eng.execute(DynamicQueryRequest.read(
        read_batch().var_as(
            "r", g().n_with_label("Arr").order_by("v").values(["i"])
        ).returning(["r"])
    ).encode())["r"]
    desc = eng.execute(DynamicQueryRequest.read(
        read_batch().var_as(
            "r", g().n_with_label("Arr").order_by("v", "Desc").values(["i"])
        ).returning(["r"])
    ).encode())["r"]
    assert asc == [0, 2, 1]
    assert desc == [1, 2, 0]


def test_ordering_grouping_fast_paths_match_slow(monkeypatch):
    """The vectorized OrderBy/GroupCount/AggregateBy paths must agree
    exactly with the per-row implementations across mixed int/float/
    string/missing data (and bail identically on bool values)."""
    import random

    import helix_tpu.engine.exec as exec_mod
    from helix_tpu.engine import Engine

    rng = random.Random(3)
    for trial, allow_bool in ((0, False), (1, False), (2, True)):
        engine = Engine()
        rows = []
        for i in range(300):
            roll = rng.random()
            if roll < 0.3:
                v = {"I64": rng.randint(-5, 5)}
            elif roll < 0.55:
                v = {"F64": rng.choice([-2.5, 0.0, 1.0, 3.25, 5.0])}
            elif roll < 0.75:
                v = {"String": rng.choice(["a", "b", "zz", "5", "null"])}
            elif roll < 0.8:
                v = {"DateTime": rng.randint(0, 2_000_000_000_000)}
            elif roll < 0.9 and allow_bool:
                v = {"Bool": rng.random() < 0.5}
            else:
                v = None  # missing
            props = [["i", {"Value": {"I64": i}}]]
            if v is not None:
                props.append(["v", {"Value": v}])
            rows.append(props)
            engine.execute({"request_type": "write", "query_name": "w",
                "query": {"queries": [{"Query": {"name": "n", "steps": [
                    {"AddN": {"label": "M", "properties": props}}],
                    "condition": None}}], "returns": []},
                "parameters": {}, "parameter_types": {}})

        def run(steps):
            return engine.execute({"request_type": "read", "query_name": "q",
                "query": {"queries": [{"Query": {"name": "r", "steps":
                    [{"NWhere": {"Eq": ["$label", {"String": "M"}]}}] + steps,
                    "condition": None}}], "returns": ["r"]},
                "parameters": {}, "parameter_types": {}})

        queries = [
            [{"Values": ["v"]}],
            [{"Values": ["v", "i"]}],
            [{"ValueMap": ["v", "i"]}],
            [{"OrderBy": ["v", "Asc"]}, {"Values": ["i"]}],
            [{"OrderBy": ["v", "Desc"]}, {"Values": ["i"]}],
            [{"OrderByMultiple": [["v", "Asc"], ["i", "Desc"]]},
             {"Values": ["i"]}],
            [{"GroupCount": "v"}],
            [{"AggregateBy": ["Sum", "v"]}],
            [{"AggregateBy": ["Min", "v"]}],
            [{"AggregateBy": ["Max", "v"]}],
            [{"AggregateBy": ["Mean", "v"]}],
        ]
        fast = [run(q) for q in queries]
        # disable every fast path and rerun
        monkeypatch.setattr(
            exec_mod._QueryState, "_frame_column",
            lambda self, frame, prop: None,
        )
        slow = [run(q) for q in queries]
        monkeypatch.undo()
        for q, f, s in zip(queries, fast, slow):
            assert f == s, (trial, q, f, s)
            # int-vs-float fidelity, not just equality
            assert repr(f) == repr(s), (trial, q, f, s)


def test_both_e_empty_then_other_n(engine):
    """An all-empty edge concat must stay an EDGE stream: BothE on a
    node with no matching edges followed by OtherN returns empty, not
    QueryError('endpoint step requires an edge stream')."""
    run(engine, write_batch().var_as("p", g().add_n("P")))
    out = run(
        engine,
        read_batch().var_as(
            "n", g().n_with_label("P").both_e("NOPE").other_n().count()
        ),
    )
    assert out["n"] == 0


def test_optional_over_coalesce_provenance(engine):
    """Nested Optional(Coalesce(...)): the Coalesce result's provenance
    must be in the enclosing basis, or Optional mis-attributes which
    input rows were covered (confirmed wrong-rows repro)."""
    batch = (
        write_batch()
        .var_as("n1", g().add_n("U", {"name": "n1"}))
        .var_as("n2", g().add_n("U", {"name": "n2"}))
        .var_as("n3", g().add_n("U", {"name": "n3"}))
        .var_as("x", g().add_n("T", {"name": "x"}))
        .var_as("y", g().add_n("T", {"name": "y"}))
        .var_as("e1", g().n(NodeRef.var("n1")).add_e("POSTED", NodeRef.var("x")))
        .var_as("e2", g().n(NodeRef.var("n3")).add_e("COMMENTED", NodeRef.var("y")))
    )
    run(engine, batch)
    out = run(
        engine,
        read_batch().var_as(
            "r",
            g().n_with_label("U")
            .optional(SubTraversal(({"Coalesce": [
                sub().out("POSTED").encode(),
                sub().out("COMMENTED").encode(),
            ]},)))
            .values(["name"]),
        ),
    )
    # n1 -> x (coalesce branch 1), n3 -> y (branch 2), n2 uncovered ->
    # kept as itself.  The bug returned [x, y, n3] (n2 mis-covered).
    assert sorted(out["r"]) == ["n2", "x", "y"]


def test_binding_distance_survives_union_merge(engine):
    """A Bind capture made on a vector-hit stream keeps $distance
    through a Union merge (concat used to drop binding dist/score)."""
    batch = (
        write_batch()
        .var_as("i", g().create_vector_index_nodes("D", "v"))
        .var_as("a", g().add_n("D", {"name": "a", "v": [1.0, 0.0]}))
        .var_as("b", g().add_n("D", {"name": "b", "v": [0.0, 1.0]}))
    )
    run(engine, batch)
    out = run(
        engine,
        read_batch().var_as(
            "r",
            g().vector_search_nodes("D", "v", [1.0, 0.0], 2)
            .bind("hit")
            .union([
                sub().limit(1),
                sub().skip(1),
            ])
            .project_bindings([
                BindingProjection.binding("hit", "$distance", "d"),
            ]),
        ),
    )
    dists = [row["d"] for row in out["r"]]
    assert len(dists) == 2 and all(d is not None for d in dists)
    assert min(dists) < 1e-6  # the exact hit's distance survived

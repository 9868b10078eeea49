"""Golden wire-format tests.

The expected JSON shapes are transcribed from the reference's own golden
tests and scaffolds (reference: ``sdks/rust/src/lib.rs:673-881`` predicate
shapes, ``helix-cli/src/commands/init.rs:183-212`` scaffold request,
``helix-cli/tests/e2e_runtime.rs:96-158`` e2e envelopes) so the wire format
is frozen against the engine contract.
"""

import json

from helix_tpu import wire
from helix_tpu.dsl import (
    BatchCondition, BindingProjection, BindingRef, DateTime,
    DynamicQueryRequest, Expr, IndexSpec, NodeRef, Order, Predicate,
    Projection, PropertyValue, RepeatConfig, SourcePredicate,
    define_params, define_queries, g, param, read_batch, register_read,
    register_write, sub, write_batch,
)


def enc(traversal):
    return list(traversal.steps)


def test_predicate_eq_shape():
    assert Predicate.eq("username", "alice").node == {
        "Eq": ["username", {"String": "alice"}]
    }


def test_predicate_numeric_coercion():
    assert Predicate.gt("age", 21).node == {"Gt": ["age", {"I64": 21}]}
    assert Predicate.lte("score", 1.5).node == {"Lte": ["score", {"F64": 1.5}]}
    assert Predicate.eq("ok", True).node == {"Eq": ["ok", {"Bool": True}]}


def test_predicate_param_promotes_to_expr_variant():
    p = define_params({"tenant_id": param.string()})
    assert Predicate.eq("tenantId", p.tenant_id).node == {
        "EqExpr": ["tenantId", {"Param": "tenant_id"}]
    }


def test_predicate_compound():
    node = Predicate.and_(
        [Predicate.eq("a", 1), Predicate.or_([Predicate.is_null("b"), Predicate.not_(Predicate.has_key("c"))])]
    ).node
    assert node == {
        "And": [
            {"Eq": ["a", {"I64": 1}]},
            {"Or": [{"IsNull": "b"}, {"Not": {"HasKey": "c"}}]},
        ]
    }


def test_predicate_compare_struct():
    node = Predicate.compare(Expr.prop("a") + Expr.val(1), "Gt", Expr.param("t")).node
    assert node == {
        "Compare": {
            "left": {"Add": [{"Property": "a"}, {"Constant": {"I64": 1}}]},
            "op": "Gt",
            "right": {"Param": "t"},
        }
    }


def test_source_predicate_rejects_non_source_variants():
    import pytest

    with pytest.raises(Exception):
        SourcePredicate({"Contains": ["a", "b"]})
    with pytest.raises(Exception):
        SourcePredicate({"Not": {"Eq": ["a", {"I64": 1}]}})


def test_scaffold_request_shape():
    # Mirrors the init scaffold (reference init.rs:183-212).
    request = DynamicQueryRequest.read(
        read_batch()
        .var_as("node_count", g().n_with_label("User").count())
        .returning(["node_count"])
    )
    expected = {
        "request_type": "read",
        "query_name": None,
        "query": {
            "queries": [
                {
                    "Query": {
                        "name": "node_count",
                        "steps": [
                            {"NWhere": {"Eq": ["$label", {"String": "User"}]}},
                            "Count",
                        ],
                        "condition": None,
                    }
                }
            ],
            "returns": ["node_count"],
        },
    }
    assert request.encode() == expected


def test_e2e_write_envelope_shape():
    # Mirrors the raw write envelope in e2e_runtime.rs:96-122.
    request = DynamicQueryRequest.write(
        write_batch()
        .var_as(
            "created",
            g().add_n(
                "E2EUser",
                [("externalId", "cli-e2e"), ("name", "CI User")],
            ),
        )
        .returning(["created"])
    )
    body = request.encode()
    assert body["query"]["queries"][0]["Query"]["steps"] == [
        {
            "AddN": {
                "label": "E2EUser",
                "properties": [
                    ["externalId", {"Value": {"String": "cli-e2e"}}],
                    ["name", {"Value": {"String": "CI User"}}],
                ],
            }
        }
    ]
    wire.validate_request(body)


def test_vector_search_step_shape():
    steps = enc(
        g().vector_search_nodes("Doc", "embedding", [1.0, 0.0, 0.25], 5)
    )
    assert steps == [
        {
            "VectorSearchNodes": {
                "label": "Doc",
                "property": "embedding",
                "query_vector": {"Value": {"F32Array": [1.0, 0.0, 0.25]}},
                "k": {"Literal": 5},
            }
        }
    ]


def test_vector_search_with_tenant():
    steps = enc(
        g().vector_search_nodes("Doc", "embedding", [1.0], 5, tenant_value="acme")
    )
    assert steps[0]["VectorSearchNodes"]["tenant_value"] == {
        "Value": {"String": "acme"}
    }


def test_text_search_step_shape():
    steps = enc(g().text_search_nodes("Doc", "body", "hello world", 10))
    assert steps == [
        {
            "TextSearchNodes": {
                "label": "Doc",
                "property": "body",
                "query_text": {"Value": {"String": "hello world"}},
                "k": {"Literal": 10},
            }
        }
    ]


def test_navigation_and_filter_steps():
    steps = enc(
        g()
        .n(NodeRef.var("seeds"))
        .out("FOLLOWS")
        .where(Predicate.eq("active", True))
        .in_e()
        .out_n()
        .both(None)
        .dedup()
        .limit(10)
        .skip(2)
        .range(1, 5)
        .count()
    )
    assert steps == [
        {"N": {"Var": "seeds"}},
        {"Out": "FOLLOWS"},
        {"Where": {"Eq": ["active", {"Bool": True}]}},
        {"InE": None},
        "OutN",
        {"Both": None},
        "Dedup",
        {"Limit": 10},
        {"Skip": 2},
        {"Range": [1, 5]},
        "Count",
    ]


def test_limit_by_param():
    p = define_params({"n": param.i64()})
    steps = enc(g().n("All").limit(p.n))
    assert steps == [{"N": "All"}, {"LimitBy": {"Param": "n"}}]


def test_order_by_and_value_map():
    steps = enc(
        g().n_with_label("User").order_by("age", Order.Desc).value_map(["$id", "name"])
    )
    assert steps[1] == {"OrderBy": ["age", "Desc"]}
    assert steps[2] == {"ValueMap": ["$id", "name"]}
    assert enc(g().n("All").value_map())[1] == {"ValueMap": None}


def test_projection_shapes():
    steps = enc(
        g()
        .e_with_label("DESCRIBES")
        .project(
            [
                Projection.from_endpoint("resource_id", "from_id"),
                Projection.to_endpoint("resource_id", "to_id"),
                Projection.property("$id", "edge_id"),
                Projection.expr("score2", Expr.prop("score").mul(Expr.val(2))),
            ]
        )
    )
    assert steps[1] == {
        "Project": [
            {"source": "$from.resource_id", "alias": "from_id"},
            {"source": "$to.resource_id", "alias": "to_id"},
            {"source": "$id", "alias": "edge_id"},
            {
                "alias": "score2",
                "expr": {"Mul": [{"Property": "score"}, {"Constant": {"I64": 2}}]},
            },
        ]
    }


def test_project_bindings_shape():
    steps = enc(
        g()
        .n_with_label("Service")
        .bind("service")
        .out("DEPENDS_ON")
        .project_bindings(
            [
                BindingProjection.binding("service", "$id", "service_id"),
                BindingProjection.current("name", "dep_name"),
                BindingProjection.coalesce(
                    [BindingRef.current("nick"), BindingRef.binding("service", "name")],
                    "display",
                ),
            ],
            distinct=True,
        )
    )
    assert steps[1] == {"Bind": "service"}
    assert steps[3] == {
        "ProjectBindings": {
            "projections": [
                {
                    "kind": "Property",
                    "target": {"Binding": "service"},
                    "source": "$id",
                    "alias": "service_id",
                },
                {
                    "kind": "Property",
                    "target": "Current",
                    "source": "name",
                    "alias": "dep_name",
                },
                {
                    "kind": "Coalesce",
                    "refs": [
                        {"target": "Current", "source": "nick"},
                        {"target": {"Binding": "service"}, "source": "name"},
                    ],
                    "alias": "display",
                },
            ],
            "distinct": True,
        }
    }


def test_repeat_config_shape():
    steps = enc(
        g()
        .n(NodeRef.id(1))
        .repeat(RepeatConfig(sub().out("KNOWS")).times(3).emit_all())
        .count()
    )
    assert steps[1] == {
        "Repeat": {
            "traversal": {"steps": [{"Out": "KNOWS"}]},
            "times": 3,
            "until": None,
            "emit": "All",
            "emit_predicate": None,
            "max_depth": 100,
        }
    }


def test_control_flow_shapes():
    steps = enc(
        g()
        .n("All")
        .union([sub().out("A"), sub().in_("B")])
        .choose(Predicate.eq("x", 1), sub().out(), sub().in_())
        .coalesce([sub().out("POSTED"), sub().out("COMMENTED")])
        .optional(sub().out("MAYBE"))
        .count()
    )
    assert steps[1] == {"Union": [{"steps": [{"Out": "A"}]}, {"steps": [{"In": "B"}]}]}
    assert steps[2]["Choose"]["condition"] == {"Eq": ["x", {"I64": 1}]}
    assert steps[2]["Choose"]["else_traversal"] == {"steps": [{"In": None}]}
    assert steps[3] == {
        "Coalesce": [
            {"steps": [{"Out": "POSTED"}]},
            {"steps": [{"Out": "COMMENTED"}]},
        ]
    }
    assert steps[4] == {"Optional": {"steps": [{"Out": "MAYBE"}]}}


def test_index_spec_shapes():
    assert IndexSpec.node_equality("User", "email") == {
        "NodeEquality": {"label": "User", "property": "email", "unique": False}
    }
    assert IndexSpec.node_unique_equality("User", "email") == {
        "NodeEquality": {"label": "User", "property": "email", "unique": True}
    }
    # Asc direction is omitted on the wire; Desc serializes.
    assert IndexSpec.node_range("User", "age") == {
        "NodeRange": {"label": "User", "property": "age"}
    }
    assert IndexSpec.node_range_desc("User", "age") == {
        "NodeRange": {"label": "User", "property": "age", "direction": "Desc"}
    }
    assert IndexSpec.node_vector("Doc", "embedding") == {
        "NodeVector": {"label": "Doc", "property": "embedding"}
    }
    assert IndexSpec.node_vector("Doc", "embedding", "tenant_id") == {
        "NodeVector": {
            "label": "Doc",
            "property": "embedding",
            "tenant_property": "tenant_id",
        }
    }


def test_create_index_step():
    steps = enc(g().create_vector_index_nodes("Doc", "embedding"))
    assert steps == [
        {
            "CreateIndex": {
                "spec": {"NodeVector": {"label": "Doc", "property": "embedding"}},
                "if_not_exists": True,
            }
        }
    ]


def test_mutation_steps():
    steps = enc(
        g()
        .n(NodeRef.var("alice"))
        .add_e("FOLLOWS", NodeRef.var("bob"), [("since", "2026-01-01")])
        .set_property("active", True)
        .remove_property("legacy")
        .drop_edge_labeled(NodeRef.var("bob"), "FOLLOWS")
    )
    assert steps[1] == {
        "AddE": {
            "label": "FOLLOWS",
            "to": {"Var": "bob"},
            "properties": [["since", {"Value": {"String": "2026-01-01"}}]],
        }
    }
    assert steps[2] == {"SetProperty": ["active", {"Value": {"Bool": True}}]}
    assert steps[3] == {"RemoveProperty": "legacy"}
    assert steps[4] == {
        "DropEdgeLabeled": {"to": {"Var": "bob"}, "label": "FOLLOWS"}
    }


def test_batch_condition_shapes():
    assert BatchCondition.var_not_empty("x") == {"VarNotEmpty": "x"}
    assert BatchCondition.var_empty("x") == {"VarEmpty": "x"}
    assert BatchCondition.var_min_size("x", 3) == {"VarMinSize": ["x", 3]}
    assert BatchCondition.prev_not_empty == "PrevNotEmpty"


def test_for_each_entry_shape():
    batch = write_batch().for_each_param(
        "users", write_batch().var_as("u", g().add_n("User", [("name", "x")]))
    )
    assert batch.encode()["queries"][0] == {
        "ForEach": {
            "param": "users",
            "body": [
                {
                    "Query": {
                        "name": "u",
                        "steps": [
                            {
                                "AddN": {
                                    "label": "User",
                                    "properties": [["name", {"Value": {"String": "x"}}]],
                                }
                            }
                        ],
                        "condition": None,
                    }
                }
            ],
        }
    }


def test_read_batch_rejects_write_traversal():
    import pytest

    with pytest.raises(Exception):
        read_batch().var_as("x", g().add_n("User"))


def test_dynamic_request_with_params():
    p = define_params({"tenant_id": param.string(), "limit": param.i64()})
    req = (
        read_batch()
        .var_as(
            "users",
            g().n_with_label("User").where(Predicate.eq("tenantId", p.tenant_id)).limit(p.limit),
        )
        .returning(["users"])
        .to_dynamic_request(p, {"tenant_id": "acme", "limit": 5})
    )
    body = req.encode()
    assert body["parameters"] == {"tenant_id": "acme", "limit": 5}
    assert body["parameter_types"] == {"tenant_id": "String", "limit": "I64"}
    wire.validate_request(body)


def test_datetime_param_renders_rfc3339():
    p = define_params({"since": param.date_time()})
    req = (
        read_batch()
        .var_as("r", g().n_where(SourcePredicate.gt("created", p.since)))
        .to_dynamic_request(p, {"since": 1700000000000})
    )
    assert req.parameters["since"] == "2023-11-14T22:13:20.000Z"


def test_bytes_param_rejected_on_json_route():
    import pytest

    p = define_params({"blob": param.bytes()})
    with pytest.raises(Exception, match="bytes"):
        read_batch().var_as("r", g().n("All")).to_dynamic_request(p, {"blob": b"\x01"})


def test_array_param_schema():
    p = define_params({"names": param.array(param.string())})
    req = read_batch().var_as("r", g().n("All")).to_dynamic_request(
        p, {"names": ["a", "b"]}
    )
    assert req.parameters == {"names": ["a", "b"]}
    assert req.parameter_types == {"names": {"Array": "String"}}


def test_query_bundle_v5():
    p = define_params({"tenant_id": param.string()})
    queries = define_queries(
        {
            "read": {
                "find_users": register_read(
                    lambda pp: read_batch()
                    .var_as(
                        "users",
                        g().n_with_label("User").where(Predicate.eq("tenantId", pp.tenant_id)),
                    )
                    .returning(["users"]),
                    p,
                )
            },
            "write": {
                "add_user": register_write(
                    lambda pp: write_batch()
                    .var_as("user", g().add_n("User", [("tenantId", pp.tenant_id)]))
                    .returning(["user"]),
                    p,
                )
            },
        }
    )
    bundle = queries.build_query_bundle()
    assert bundle["version"] == 5
    assert list(bundle["read_routes"]) == ["find_users"]
    assert list(bundle["write_routes"]) == ["add_user"]
    assert bundle["read_parameters"]["find_users"] == [
        {"name": "tenant_id", "ty": "String"}
    ]
    req = queries.call.find_users({"tenant_id": "acme"})
    assert req.query_name == "find_users"
    assert req.parameters == {"tenant_id": "acme"}


def test_stored_route_request_roundtrip_json():
    request = DynamicQueryRequest.read(
        read_batch().var_as("c", g().n_with_label("User").count()).returning(["c"])
    )
    text = request.to_json_string()
    parsed = json.loads(text)
    assert parsed["query_name"] is None  # null query_name still serializes
    assert "parameters" not in parsed  # unset params are omitted
    wire.validate_request(parsed)


def test_validate_rejects_mutation_in_read_batch():
    import pytest

    body = {
        "request_type": "read",
        "query": {
            "queries": [
                {"Query": {"name": "x", "steps": [{"AddN": {"label": "U", "properties": []}}], "condition": None}}
            ],
            "returns": [],
        },
    }
    with pytest.raises(wire.WireError, match="AddN"):
        wire.validate_request(body)


def test_validate_rejects_unknown_step():
    import pytest

    body = {
        "request_type": "read",
        "query": {"queries": [{"Query": {"name": None, "steps": ["Bogus"], "condition": None}}], "returns": []},
    }
    with pytest.raises(wire.WireError, match="Bogus"):
        wire.validate_request(body)


def test_reserved_noop_steps_roundtrip():
    steps = enc(
        g().n("All").fold().unfold().path().simple_path().with_sack(0)
        .sack_set("x").sack_add("y").sack_get().count()
    )
    assert "Fold" in steps and {"WithSack": {"I64": 0}} in steps
    body = {
        "request_type": "read",
        "query": {
            "queries": [{"Query": {"name": None, "steps": steps, "condition": None}}],
            "returns": [],
        },
    }
    wire.validate_request(body)


def test_datetime_roundtrip():
    dt = DateTime.parse_rfc3339("2024-05-01T12:30:00.250Z")
    assert dt.to_rfc3339() == "2024-05-01T12:30:00.250Z"
    assert PropertyValue.of(dt) == {"DateTime": dt.millis}


def test_property_value_coercions():
    assert PropertyValue.of(None) == "Null"
    assert PropertyValue.of([1, 2, 3]) == {"I64Array": [1, 2, 3]}
    assert PropertyValue.of([1.5, 2]) == {"F64Array": [1.5, 2.0]}
    assert PropertyValue.of(["a", "b"]) == {"StringArray": ["a", "b"]}
    assert PropertyValue.of([1, "a"]) == {
        "Array": [{"I64": 1}, {"String": "a"}]
    }
    assert PropertyValue.of({"k": 1}) == {"Object": {"k": {"I64": 1}}}
    assert PropertyValue.of(b"\x00\xff") == {"Bytes": [0, 255]}


def test_large_u64_ids_roundtrip():
    # Node IDs are u64 and may exceed 2^53; Python ints preserve them.
    big = 2**63 + 11
    steps = enc(g().n(NodeRef.ids([big])))
    assert steps == [{"N": {"Ids": [big]}}]
    assert json.loads(wire.dumps(steps))[0]["N"]["Ids"][0] == big


def test_malformed_steps_and_foreach_body_are_wire_errors():
    """Non-list steps / ForEach bodies must raise the typed WireError
    (they used to TypeError into a 500)."""
    import pytest

    from helix_tpu import wire

    with pytest.raises(wire.WireError, match="steps"):
        wire.validate_batch(
            {"queries": [{"Query": {"steps": 5, "condition": None}}],
             "returns": []},
            write=False,
        )
    with pytest.raises(wire.WireError, match="ForEach body"):
        wire.validate_batch(
            {"queries": [{"ForEach": {"param": "xs", "body": 7}}],
             "returns": []},
            write=True,
        )


def test_dsl_guardrails():
    """Builder-layer enforcement added after the dsl review: typestate,
    section typos, kind mismatches, bytes/str confusion."""
    import pytest

    from helix_tpu.dsl import (
        DslError, NodeRef, Predicate, SourcePredicate, bytes_,
        define_params, define_queries, g, read_batch, register_read,
        register_write, write_batch,
    )

    # steps after a terminal raise at build time
    with pytest.raises(DslError, match="after a terminal"):
        g().n().count().out("F")

    # mutation bodies cannot nest into a ReadBatch ForEach
    with pytest.raises(DslError, match="read-only"):
        read_batch().for_each_param(
            "xs", write_batch().var_as("m", g().add_n("X"))
        )
    # read bodies still fine
    read_batch().for_each_param(
        "xs", read_batch().var_as("n", g().n().count())
    )

    # source-predicate members are validated recursively
    with pytest.raises(DslError, match="source predicate"):
        SourcePredicate.and_([
            SourcePredicate.eq("a", 1), Predicate.is_null("x"),
        ])

    # bytes cannot masquerade as node ids; str cannot masquerade as bytes
    with pytest.raises(DslError, match="bytes"):
        NodeRef.of(b"\x01\x02")
    with pytest.raises(DslError, match="not str"):
        bytes_("12")

    # properties errors are typed
    with pytest.raises(DslError, match="properties"):
        g().add_n("L", "oops")

    # bundle section typos and kind mismatches are loud
    p = define_params({})
    rq = register_write(
        lambda pp: write_batch().var_as("w", g().add_n("X")), p
    )
    with pytest.raises(DslError, match="unknown query section"):
        define_queries({"reads": {}})
    with pytest.raises(DslError, match="register_write"):
        define_queries({"read": {"oops": rq}})
    rr = register_read(
        lambda pp: read_batch().var_as("n", g().n().count()), p
    )
    define_queries({"read": {"ok": rr}}).build_query_bundle()


def test_wire_dumps_array_payloads():
    """array('d') payloads serialize as lists; NaN inside them is still
    rejected by the non-finite guard."""
    import array

    import pytest

    from helix_tpu import wire

    out = wire.dumps({"F64Array": array.array("d", [1.5, 2.5])})
    assert out == '{"F64Array":[1.5,2.5]}'
    with pytest.raises(wire.WireError, match="non-finite"):
        wire.dumps({"F64Array": array.array("d", [float("nan")])})

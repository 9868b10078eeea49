//! Rust-side parity fixture generator.
//!
//! Emits the same corpus as the Python generator (`tests/parity/gen.py`):
//! 27 ordered `runtime/` fixtures, 192 `combo/` permutations
//! (3 sources x 4 filters x 4 bounds x 4 terminals) and 12 `json-only/`
//! exhaustive-AST fixtures — the cross-SDK wire-parity proof that this
//! SDK can express the full catalog (reference analog:
//! `sdks/rust/examples/generate_parity_fixtures.rs`).
//!
//! Output is structurally identical to the committed corpus; key order
//! inside objects may differ (serde_json sorts map keys) — the parity
//! diff is structural, matching `tests/parity/replay.py`.
//!
//! Usage: `cargo run --example generate_parity_fixtures -- <out_dir>`

use std::fs;
use std::path::Path;

use helix_tpu::dsl::*;
use serde_json::{json, Value};

fn write_fixture(dir: &Path, name: &str, body: Value) {
    fs::create_dir_all(dir).expect("mkdir");
    let path = dir.join(format!("{name}.json"));
    let text = serde_json::to_string_pretty(&body).expect("serialize");
    fs::write(path, text + "\n").expect("write fixture");
}

fn req_read(batch: ReadBatch) -> Value {
    batch.to_dynamic_request().encode()
}

fn req_write(batch: WriteBatch) -> Value {
    batch.to_dynamic_request().encode()
}

fn runtime(dir: &Path) {
    write_fixture(dir, "001-write-setup-indexes", req_write(
        write_batch()
            .var_as("name_idx", g().create_index_if_not_exists(IndexSpec::node_equality("ParityUser", "externalId", false)))
            .var_as("age_idx", g().create_index_if_not_exists(IndexSpec::node_range("ParityUser", "age")))
            .var_as("vec_idx", g().create_vector_index_nodes("ParityDoc", "embedding", None))
            .var_as("txt_idx", g().create_text_index_nodes("ParityDoc", "body", None))
            .returning(&["name_idx", "age_idx", "vec_idx", "txt_idx"]),
    ));
    write_fixture(dir, "002-write-seed-users", req_write(
        write_batch()
            .var_as("alice", g().add_n("ParityUser", vec![
                ("externalId", json!("user-alice").into()), ("name", json!("Alice").into()),
                ("age", json!(34).into()), ("status", json!("active").into()),
                ("score", json!(91.5).into()),
            ]))
            .var_as("bob", g().add_n("ParityUser", vec![
                ("externalId", json!("user-bob").into()), ("name", json!("Bob").into()),
                ("age", json!(27).into()), ("status", json!("inactive").into()),
                ("score", json!(55.0).into()),
            ]))
            .var_as("carol", g().add_n("ParityUser", vec![
                ("externalId", json!("user-carol").into()), ("name", json!("Carol").into()),
                ("age", json!(41).into()), ("status", json!("active").into()),
                ("score", json!(73.25).into()),
            ]))
            .returning(&["alice", "bob", "carol"]),
    ));
    write_fixture(dir, "003-write-seed-edges", req_write(
        write_batch()
            .var_as("alice", g().n_where(SourcePredicate::eq("externalId", json!("user-alice"))))
            .var_as("bob", g().n_where(SourcePredicate::eq("externalId", json!("user-bob"))))
            .var_as("carol", g().n_where(SourcePredicate::eq("externalId", json!("user-carol"))))
            .var_as("f1", g().n(NodeRef::var("alice")).add_e("FOLLOWS", NodeRef::var("bob"), vec![("since", json!(2020).into())]))
            .var_as("f2", g().n(NodeRef::var("bob")).add_e("FOLLOWS", NodeRef::var("carol"), vec![("since", json!(2021).into())]))
            .var_as("f3", g().n(NodeRef::var("alice")).add_e("FOLLOWS", NodeRef::var("carol"), vec![("since", json!(2022).into())]))
            .returning(&[]),
    ));
    write_fixture(dir, "004-write-seed-docs", req_write(
        write_batch()
            .var_as("d1", g().add_n("ParityDoc", vec![
                ("title", json!("intro").into()),
                ("body", json!("graph databases store nodes and edges").into()),
                ("embedding", f32_array(&[1.0, 0.0, 0.0, 0.0]).into()),
            ]))
            .var_as("d2", g().add_n("ParityDoc", vec![
                ("title", json!("vectors").into()),
                ("body", json!("vector search finds nearest neighbors").into()),
                ("embedding", f32_array(&[0.0, 1.0, 0.0, 0.0]).into()),
            ]))
            .var_as("d3", g().add_n("ParityDoc", vec![
                ("title", json!("hybrid").into()),
                ("body", json!("hybrid queries mix graph and vector search").into()),
                ("embedding", f32_array(&[0.7, 0.7, 0.0, 0.0]).into()),
            ]))
            .returning(&[]),
    ));
    write_fixture(dir, "005-read-order-range-values", req_read(
        read_batch()
            .var_as("ordered", g().n_with_label("ParityUser")
                .order_by_multiple(&[("status", "Asc"), ("age", "Desc")])
                .range(0, 2)
                .value_map(Some(&["externalId", "age", "status"])))
            .returning(&["ordered"]),
    ));
    write_fixture(dir, "006-read-edge-count", req_read(
        read_batch()
            .var_as("edge_count", g().n_with_label("ParityUser")
                .where_(Predicate::eq("externalId", json!("user-alice")))
                .out_e(Some("FOLLOWS"))
                .count())
            .returning(&["edge_count"]),
    ));
    write_fixture(dir, "007-read-edge-properties", req_read(
        read_batch()
            .var_as("edges", g().e_with_label("FOLLOWS")
                .edge_has("since", json!(2021))
                .edge_properties())
            .returning(&["edges"]),
    ));
    write_fixture(dir, "008-read-edge-endpoints", req_read(
        read_batch()
            .var_as("from_nodes", g().e_with_label("FOLLOWS")
                .edge_has_label("FOLLOWS")
                .in_n()
                .value_map(Some(&["externalId", "name"])))
            .var_as("to_nodes", g().e_with_label("FOLLOWS")
                .out_n()
                .value_map(Some(&["externalId", "name"])))
            .returning(&["from_nodes", "to_nodes"]),
    ));
    write_fixture(dir, "009-read-conditional-var-not-empty", req_read(
        read_batch()
            .var_as("alice", g().n_with_label("ParityUser")
                .where_(Predicate::eq("externalId", json!("user-alice"))))
            .var_as_if("friends", BatchCondition::var_not_empty("alice"),
                g().n(NodeRef::var("alice"))
                    .out(Some("FOLLOWS"))
                    .value_map(Some(&["externalId", "name"])))
            .returning(&["alice", "friends"]),
    ));
    write_fixture(dir, "010-read-count-all-users", req_read(
        read_batch()
            .var_as("user_count", g().n_with_label("ParityUser").count())
            .returning(&["user_count"]),
    ));
    write_fixture(dir, "011-read-filtered-values", req_read(
        read_batch()
            .var_as("actives", g().n_with_label("ParityUser")
                .where_(Predicate::eq("status", json!("active")))
                .order_by("name", "Asc")
                .values(&["name"]))
            .returning(&["actives"]),
    ));
    write_fixture(dir, "012-read-two-hop", req_read(
        read_batch()
            .var_as("fof", g().n_where(SourcePredicate::eq("externalId", json!("user-alice")))
                .out(Some("FOLLOWS")).out(Some("FOLLOWS")).dedup().values(&["name"]))
            .returning(&["fof"]),
    ));
    write_fixture(dir, "013-read-projection-expr", req_read(
        read_batch()
            .var_as("alice", g().n_with_label("ParityUser")
                .where_(Predicate::eq("externalId", json!("user-alice")))
                .project(vec![
                    Projection::property("externalId", "id"),
                    Projection::property("name", "name"),
                    Projection::expr("score_plus_one", Expr::prop("score").add(Expr::val(json!(1.0)))),
                    Projection::expr("status_label", Expr::case(
                        vec![(Predicate::eq("status", json!("active")), Expr::val(json!("enabled")))],
                        Some(Expr::val(json!("disabled"))),
                    )),
                ]))
            .returning(&["alice"]),
    ));
    write_fixture(dir, "014-read-vector-search", req_read(
        read_batch()
            .var_as("hits", g().vector_search_nodes(
                "ParityDoc", "embedding", f32_array(&[1.0, 0.05, 0.0, 0.0]), 2u64,
            ).value_map(Some(&["title", "$distance"])))
            .returning(&["hits"]),
    ));
    write_fixture(dir, "015-read-text-search", req_read(
        read_batch()
            .var_as("hits", g().text_search_nodes(
                "ParityDoc", "body", json!("vector search"), 2u64,
            ).value_map(Some(&["title"])))
            .returning(&["hits"]),
    ));
    write_fixture(dir, "016-read-vector-then-graph", req_read(
        read_batch()
            .var_as("seed", g().vector_search_nodes(
                "ParityDoc", "embedding", f32_array(&[0.6, 0.6, 0.0, 0.0]), 1u64,
            ).value_map(Some(&["$id", "title", "$distance"])))
            .var_as("count_from_seed", g().n(NodeRef::var("seed")).count())
            .returning(&["seed", "count_from_seed"]),
    ));
    write_fixture(dir, "017-read-edge-source", req_read(
        read_batch()
            .var_as("recent", g().e_with_label("FOLLOWS")
                .where_(Predicate::gte("since", json!(2021)))
                .order_by("since", "Desc")
                .edge_properties())
            .returning(&["recent"]),
    ));
    write_fixture(dir, "018-read-group-aggregate", req_read(
        read_batch()
            .var_as("by_status", g().n_with_label("ParityUser").group_count("status"))
            .var_as("mean_age", g().n_with_label("ParityUser").aggregate_by("Mean", "age"))
            .returning(&["by_status", "mean_age"]),
    ));
    write_fixture(dir, "019-read-conditional-batch", req_read(
        read_batch()
            .var_as("ghosts", g().n_with_label("Ghost"))
            .var_as_if("gated", BatchCondition::var_not_empty("ghosts"),
                g().n_with_label("ParityUser").count())
            .var_as_if("open", BatchCondition::var_empty("ghosts"),
                g().n_with_label("ParityUser").count())
            .returning(&["gated", "open"]),
    ));
    write_fixture(dir, "020-read-union-coalesce", req_read(
        read_batch()
            .var_as("fanout", g().n_where(SourcePredicate::eq("externalId", json!("user-alice")))
                .union(vec![sub().out(Some("FOLLOWS")), sub().out(Some("FOLLOWS"))])
                .count())
            .var_as("first_hop", g().n_with_label("ParityUser")
                .coalesce(vec![sub().out(Some("FOLLOWS")), sub().out_e(Some("FOLLOWS"))])
                .dedup()
                .count())
            .returning(&["fanout", "first_hop"]),
    ));
    write_fixture(dir, "021-read-repeat", req_read(
        read_batch()
            .var_as("reach", g().n_where(SourcePredicate::eq("externalId", json!("user-alice")))
                .repeat(RepeatConfig::new(sub().out(Some("FOLLOWS"))).times(2))
                .dedup()
                .values(&["name"]))
            .returning(&["reach"]),
    ));
    write_fixture(dir, "022-read-row-bindings", req_read(
        read_batch()
            .var_as("pairs", g().n_with_label("ParityUser")
                .bind("follower")
                .out(Some("FOLLOWS"))
                .project_bindings(vec![
                    BindingProjection::binding("follower", "name", "from_name"),
                    BindingProjection::current("name", "to_name"),
                    BindingProjection::coalesce(vec![
                        BindingRef::current("nickname"),
                        BindingRef::current("name"),
                    ], "display"),
                ], true))
            .returning(&["pairs"]),
    ));
    write_fixture(dir, "023-read-parameters",
        read_batch()
            .var_as("grown", g().n_with_label("ParityUser")
                .where_(Predicate::gt_param("age", "min_age"))
                .where_(Predicate::eq_param("status", "want"))
                .order_by("age", "Asc")
                .values(&["name"]))
            .returning(&["grown"])
            .to_dynamic_request()
            .with_parameter("min_age", json!("I64"), json!(30))
            .with_parameter("want", json!("String"), json!("active"))
            .encode(),
    );
    write_fixture(dir, "024-write-foreach-param-create",
        write_batch()
            .for_each_param("users", write_batch().var_as(
                "u", g().add_n("ImportedUser", vec![("name", Expr::param("users.name").into())]),
            ))
            .var_as("imported", g().n_with_label("ImportedUser").count())
            .returning(&["imported"])
            .to_dynamic_request()
            .with_parameter("users", json!({"Array": "Object"}),
                json!([{"name": "Zed"}, {"name": "Yan"}]))
            .encode(),
    );
    write_fixture(dir, "025-write-set-remove-property", req_write(
        write_batch()
            .var_as("bumped", g().n_where(SourcePredicate::eq("externalId", json!("user-bob")))
                .set_property("age", Expr::prop("age").add(Expr::val(json!(1))))
                .values(&["age"]))
            .var_as("cleaned", g().n_where(SourcePredicate::eq("externalId", json!("user-bob")))
                .remove_property("score")
                .value_map(Some(&["name", "score"])))
            .returning(&["bumped", "cleaned"]),
    ));
    write_fixture(dir, "026-read-within-without", req_read(
        read_batch()
            .var_as("followed", g().n_with_label("ParityUser").out(Some("FOLLOWS")).dedup())
            .var_as("roots", g().n_with_label("ParityUser").without("followed").values(&["name"]))
            .returning(&["roots"]),
    ));
    write_fixture(dir, "027-write-drop-edge", req_write(
        write_batch()
            .var_as("carol", g().n_where(SourcePredicate::eq("externalId", json!("user-carol"))))
            .var_as("cut", g().n_where(SourcePredicate::eq("externalId", json!("user-bob")))
                .drop_edge_labeled(NodeRef::var("carol"), "FOLLOWS"))
            .var_as("remaining", g().e_with_label("FOLLOWS").count())
            .returning(&["remaining"]),
    ));
    write_fixture(dir, "028-write-drop-node-cascades", req_write(
        write_batch()
            .var_as("gone", g().n_where(SourcePredicate::eq("externalId", json!("user-bob"))).drop())
            .var_as("users", g().n_with_label("ParityUser").count())
            .var_as("edges", g().e_with_label("FOLLOWS").count())
            .returning(&["users", "edges"]),
    ));
    write_fixture(dir, "029-read-reserved-noops", req_read(
        read_batch()
            .var_as("still_counts", g().n_with_label("ParityUser")
                .fold().unfold().path().simple_path()
                .with_sack(json!(0)).sack_set("s").sack_add("s").sack_get()
                .count())
            .returning(&["still_counts"]),
    ));
    write_fixture(dir, "030-read-order-multi-limit", req_read(
        read_batch()
            .var_as("page", g().n_with_label("ParityUser")
                .order_by_multiple(&[("status", "Asc"), ("age", "Desc")])
                .limit(2)
                .values(&["name"]))
            .returning(&["page"]),
    ));
    write_fixture(dir, "031-read-exists-id-label", req_read(
        read_batch()
            .var_as("has_users", g().n_with_label("ParityUser").exists())
            .var_as("has_ghosts", g().n_with_label("Ghost").exists())
            .var_as("labels", g().n_where(SourcePredicate::eq("externalId", json!("user-alice"))).label())
            .returning(&["has_users", "has_ghosts", "labels"]),
    ));
    write_fixture(dir, "032-read-edge-endpoints", req_read(
        read_batch()
            .var_as("targets", g().n_where(SourcePredicate::eq("externalId", json!("user-alice")))
                .out_e(Some("FOLLOWS"))
                .in_n()
                .order_by("name", "Asc")
                .values(&["name"]))
            .returning(&["targets"]),
    ));
}

/// Combo matrix: the node and edge pipelines share shape but differ in
/// stream type, so the matrix is expanded per source family (the
/// typestate makes a single generic pipeline a type error by design).
fn combos(dir: &Path) {
    let filters = ["nofilter", "has", "where-gt", "dedup"];
    let bounds = ["nobound", "limit", "skip", "range"];
    let terminals = ["count", "exists", "id", "valuemap"];

    fn apply_filter<S: ActiveStream, M>(t: Traversal<S, M>, f: &str) -> Traversal<S, M> {
        match f {
            "has" => t.has("status", json!("active")),
            "where-gt" => t.where_(Predicate::gt("age", json!(20))),
            "dedup" => t.dedup(),
            _ => t,
        }
    }
    fn apply_bound<S: ActiveStream, M>(t: Traversal<S, M>, b: &str) -> Traversal<S, M> {
        match b {
            "limit" => t.limit(2),
            "skip" => t.skip(1),
            "range" => t.range(0, 2),
            _ => t,
        }
    }
    fn apply_terminal<S: ActiveStream, M>(t: Traversal<S, M>, term: &str) -> Traversal<Done, M> {
        match term {
            "count" => t.count(),
            "exists" => t.exists(),
            "id" => t.id(),
            _ => t.value_map(Some(&["name", "since"])),
        }
    }

    let mut index = 0;
    for sname in ["n-all", "n-label", "e-label"] {
        for fname in filters {
            for bname in bounds {
                for tname in terminals {
                    index += 1;
                    let name = format!("{index:03}-{sname}-{fname}-{bname}-{tname}");
                    let body = if sname == "e-label" {
                        let t = g().e_with_label("FOLLOWS");
                        let t = apply_terminal(apply_bound(apply_filter(t, fname), bname), tname);
                        req_read(read_batch().var_as("result", t).returning(&["result"]))
                    } else {
                        let t = if sname == "n-all" {
                            g().n(NodeRef::all())
                        } else {
                            g().n_with_label("ParityUser")
                        };
                        let t = apply_terminal(apply_bound(apply_filter(t, fname), bname), tname);
                        req_read(read_batch().var_as("result", t).returning(&["result"]))
                    };
                    write_fixture(dir, &name, body);
                }
            }
        }
    }
}

fn json_only(dir: &Path) {
    write_fixture(dir, "001-all-predicates", req_read(
        read_batch().var_as("x", g().n(NodeRef::all()).where_(Predicate::and(vec![
            Predicate::eq("a", json!(1)), Predicate::neq("b", json!("s")),
            Predicate::gt("c", json!(1.5)), Predicate::gte("d", json!(0)),
            Predicate::lt("e", json!(10)), Predicate::lte("f", json!(10)),
            Predicate::between("grange", json!(1), json!(5)),
            Predicate::has_key("h"), Predicate::is_null("i"),
            Predicate::is_not_null("j"),
            Predicate::starts_with("k", "pre"),
            Predicate::ends_with("l", "post"),
            Predicate::contains("m", "mid"),
            Predicate::contains_param("n", "needle"),
            Predicate::is_in("o", json!([1, 2, 3])),
            Predicate::is_in_param("p", "choices"),
            Predicate::or(vec![Predicate::not(Predicate::eq("q", json!(false)))]),
            Predicate::compare(
                Expr::prop("r").mul(Expr::val(json!(2))), "Gte", Expr::param("s"),
            ),
        ]))),
    ));
    write_fixture(dir, "002-all-property-values", req_write(
        write_batch().var_as("x", g().add_n("Kitchen", vec![
            ("null", json!(null).into()), ("bool", json!(true).into()),
            ("i64", json!(42).into()), ("f64", json!(2.5).into()),
            ("f32", f32_value(1.25).into()), ("string", json!("text").into()),
            ("datetime", datetime_millis(1700000000000).into()),
            ("bytes", bytes_value(&[0x00, 0x01, 0xff]).into()),
            ("i64arr", json!([1, 2, 3]).into()),
            ("f64arr", json!([1.5, 2.5]).into()),
            ("f32arr", f32_array(&[0.5]).into()),
            ("strarr", json!(["a", "b"]).into()),
            ("mixed", json!([1, "two", null]).into()),
            ("obj", json!({"nested": {"deep": 1}}).into()),
        ])),
    ));
    write_fixture(dir, "003-all-exprs", req_read(
        read_batch().var_as("x", g().n(NodeRef::all()).project(vec![
            Projection::expr("a", Expr::prop("p").add(Expr::val(json!(1)))),
            Projection::expr("b", Expr::prop("p").sub(Expr::val(json!(1)))),
            Projection::expr("c", Expr::prop("p").mul(Expr::val(json!(2)))),
            Projection::expr("d", Expr::prop("p").div(Expr::val(json!(2)))),
            Projection::expr("e", Expr::prop("p").modulo(Expr::val(json!(2)))),
            Projection::expr("f", Expr::prop("p").neg()),
            Projection::expr("g", Expr::id()),
            Projection::expr("h", Expr::timestamp()),
            Projection::expr("i", Expr::date_time_now()),
            Projection::expr("j", Expr::param("q")),
            Projection::expr("k", Expr::case(
                vec![(Predicate::eq("x", json!(1)), Expr::val(json!("one")))],
                Some(Expr::val(json!("other"))),
            )),
        ])),
    ));
    write_fixture(dir, "004-all-index-specs", req_write(
        write_batch()
            .var_as("a", g().create_index_if_not_exists(IndexSpec::node_equality("L", "p", false)))
            .var_as("b", g().create_index_if_not_exists(IndexSpec::node_equality("L", "q", true)))
            .var_as("c", g().create_index_if_not_exists(IndexSpec::node_range("L", "r")))
            .var_as("d", g().create_index_if_not_exists(IndexSpec::node_range_desc("L", "s")))
            .var_as("e", g().create_index_if_not_exists(IndexSpec::edge_equality("E", "p")))
            .var_as("f", g().create_index_if_not_exists(IndexSpec::edge_range("E", "q")))
            .var_as("g2", g().create_index_if_not_exists(IndexSpec::node_vector("L", "v", Some("tenant"))))
            .var_as("h", g().create_index_if_not_exists(IndexSpec::node_text("L", "t", None)))
            .var_as("i", g().create_index_if_not_exists(IndexSpec::edge_vector("E", "v", None)))
            .var_as("j", g().create_index_if_not_exists(IndexSpec::edge_text("E", "t", None)))
            .var_as("k", g().drop_index(IndexSpec::node_equality("L", "p", false))),
    ));
    write_fixture(dir, "005-all-navigation", req_read(
        read_batch().var_as("x", g().n(NodeRef::all())
            .out(Some("A")).in_(Some("B")).both(None)
            .out_e(Some("C")).out_n()
            .both_e(None).other_n()
            .in_e(Some("D")).in_n()
            .count()),
    ));
    write_fixture(dir, "006-edge-search-steps", req_read(
        read_batch()
            .var_as("v", g().vector_search_edges_tenant(
                "SIM", "emb", f32_array(&[1.0, 0.0]), 5u64, json!("t1"),
            ))
            .var_as("t", g().text_search_edges("SIM", "note", json!("query text"), 3u64)),
    ));
    write_fixture(dir, "007-repeat-full-config", req_read(
        read_batch().var_as("x", g().n(NodeRef::all()).repeat(
            RepeatConfig::new(sub().out(Some("NEXT")))
                .until(Predicate::eq("leaf", json!(true)))
                .emit_if(Predicate::gt("depth", json!(1)))
                .max_depth(7),
        ).count()),
    ));
    write_fixture(dir, "008-choose-optional", req_read(
        read_batch().var_as("x", g().n(NodeRef::all())
            .choose(Predicate::eq("kind", json!("a")), sub().out(None), Some(sub().in_(None)))
            .optional(sub().out(Some("MAYBE")))
            .count()),
    ));
    write_fixture(dir, "009-mutations", req_write(
        write_batch().var_as("x", g().n(NodeRef::ids(&[1, 2]))
            .add_e("REL", NodeRef::param("targets"), vec![("w", json!(1).into())])
            .set_property("touched", json!(true))
            .remove_property("stale")
            .drop_edge(NodeRef::var("others"))
            .drop_edge_labeled(NodeRef::ids(&[3]), "REL")
            .drop_edge_by_id(EdgeRef::ids(&[7]))
            .drop()),
    ));
    write_fixture(dir, "010-stream-bounds", req_read(
        read_batch().var_as("x", g().n(NodeRef::all())
            .limit_by(Expr::param("lim"))
            .skip(2)
            .range_by(Expr::param("lo"), Expr::param("hi"))
            .count()),
    ));
    write_fixture(dir, "011-batch-conditions", req_read(
        read_batch()
            .var_as("a", g().n(NodeRef::all()))
            .var_as_if("b", BatchCondition::var_not_empty("a"), g().n(NodeRef::all()).count())
            .var_as_if("c", BatchCondition::var_empty("a"), g().n(NodeRef::all()).count())
            .var_as_if("d", BatchCondition::var_min_size("a", 3), g().n(NodeRef::all()).count())
            .var_as_if("e", BatchCondition::prev_not_empty(), g().n(NodeRef::all()).count()),
    ));
    write_fixture(dir, "012-big-u64-ids", req_read(
        read_batch().var_as("x", g().n(NodeRef::ids(&[
            (1u64 << 63) + 11, (1u64 << 53) + 1,
        ])).id()),
    ));
}

fn main() {
    let args: Vec<String> = std::env::args().collect();
    let out = Path::new(args.get(1).map(String::as_str).unwrap_or("fixtures"));
    runtime(&out.join("runtime"));
    combos(&out.join("combo"));
    json_only(&out.join("json-only"));
    println!("fixtures written under {}", out.display());
}

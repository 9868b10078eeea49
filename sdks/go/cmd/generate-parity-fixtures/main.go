// Go parity-fixture generator.
//
// Emits the runtime + combo fixture corpora from the Go DSL so they can
// be diffed structurally against the Python-generated fixtures in
// tests/parity/fixtures/ (the reference's cross-SDK parity discipline:
// every SDK generates the same wire JSON; its Go emitter lives at
// sdks/go/cmd/generate-parity-fixtures/main.go).
//
// Usage (requires a Go toolchain; not available in the round-1 build
// image — source-only until then):
//
//	go run ./cmd/generate-parity-fixtures <outdir>
//
// Then compare structurally, e.g. with the TS harness:
//
//	npx tsx sdks/typescript/scripts/compare-json.ts \
//	    <outdir>/runtime tests/parity/fixtures/runtime
package main

import (
	"encoding/json"
	"fmt"
	"os"
	"path/filepath"

	helix "github.com/helix-tpu/helix-tpu-go"
)

type fixture struct {
	name string
	req  *helix.DynamicQueryRequest
}

func runtimeFixtures() []fixture {
	out := []fixture{}
	add := func(name string, req *helix.DynamicQueryRequest) {
		out = append(out, fixture{name, req})
	}

	add("001-write-setup-indexes", helix.Write(
		helix.WriteBatch().
			VarAs("name_idx", helix.G().CreateIndexIfNotExists(
				helix.NodeEqualityIndex("ParityUser", "externalId", false))).
			VarAs("age_idx", helix.G().CreateIndexIfNotExists(
				helix.NodeRangeIndex("ParityUser", "age"))).
			VarAs("vec_idx", helix.G().CreateVectorIndexNodes("ParityDoc", "embedding", "")).
			VarAs("txt_idx", helix.G().CreateTextIndexNodes("ParityDoc", "body", "")).
			Returning("name_idx", "age_idx", "vec_idx", "txt_idx")))

	user := func(id, name string, age int, status string, score float64) helix.Traversal {
		return helix.G().AddNOrdered("ParityUser", []helix.PropPair{
			{Key: "externalId", Value: id}, {Key: "name", Value: name},
			{Key: "age", Value: age}, {Key: "status", Value: status},
			{Key: "score", Value: score},
		})
	}
	add("002-write-seed-users", helix.Write(
		helix.WriteBatch().
			VarAs("alice", user("user-alice", "Alice", 34, "active", 91.5)).
			VarAs("bob", user("user-bob", "Bob", 27, "inactive", 55.0)).
			VarAs("carol", user("user-carol", "Carol", 41, "active", 73.25)).
			Returning("alice", "bob", "carol")))

	add("003-write-seed-edges", helix.Write(
		helix.WriteBatch().
			VarAs("alice", helix.G().NWhere(helix.Eq("externalId", "user-alice"))).
			VarAs("bob", helix.G().NWhere(helix.Eq("externalId", "user-bob"))).
			VarAs("carol", helix.G().NWhere(helix.Eq("externalId", "user-carol"))).
			VarAs("f1", helix.G().N(helix.NodeVar("alice")).AddEOrdered(
				"FOLLOWS", helix.NodeVar("bob"),
				[]helix.PropPair{{Key: "since", Value: 2020}})).
			VarAs("f2", helix.G().N(helix.NodeVar("bob")).AddEOrdered(
				"FOLLOWS", helix.NodeVar("carol"),
				[]helix.PropPair{{Key: "since", Value: 2021}})).
			VarAs("f3", helix.G().N(helix.NodeVar("alice")).AddEOrdered(
				"FOLLOWS", helix.NodeVar("carol"),
				[]helix.PropPair{{Key: "since", Value: 2022}})).
			Returning()))

	doc := func(title, body string, embedding []float64) helix.Traversal {
		return helix.G().AddNOrdered("ParityDoc", []helix.PropPair{
			{Key: "title", Value: title}, {Key: "body", Value: body},
			{Key: "embedding", Value: helix.F32Array(embedding)},
		})
	}
	add("004-write-seed-docs", helix.Write(
		helix.WriteBatch().
			VarAs("d1", doc("intro", "graph databases store nodes and edges",
				[]float64{1.0, 0.0, 0.0, 0.0})).
			VarAs("d2", doc("vectors", "vector search finds nearest neighbors",
				[]float64{0.0, 1.0, 0.0, 0.0})).
			VarAs("d3", doc("hybrid", "hybrid queries mix graph and vector search",
				[]float64{0.7, 0.7, 0.0, 0.0})).
			Returning()))

	add("005-read-order-range-values", helix.Read(
		helix.ReadBatch().
			VarAs("ordered", helix.G().NWithLabel("ParityUser").
				OrderByMultiple([][2]string{{"status", "Asc"}, {"age", "Desc"}}).
				Range(0, 2).
				ValueMap([]string{"externalId", "age", "status"})).
			Returning("ordered")))

	add("006-read-edge-count", helix.Read(
		helix.ReadBatch().
			VarAs("edge_count", helix.G().NWithLabel("ParityUser").
				Where(helix.Eq("externalId", "user-alice")).
				OutE("FOLLOWS").
				Count()).
			Returning("edge_count")))

	add("007-read-edge-properties", helix.Read(
		helix.ReadBatch().
			VarAs("edges", helix.G().EWithLabel("FOLLOWS").
				EdgeHas("since", 2021).
				EdgeProperties()).
			Returning("edges")))

	add("008-read-edge-endpoints", helix.Read(
		helix.ReadBatch().
			VarAs("from_nodes", helix.G().EWithLabel("FOLLOWS").
				EdgeHasLabel("FOLLOWS").
				InN().
				ValueMap([]string{"externalId", "name"})).
			VarAs("to_nodes", helix.G().EWithLabel("FOLLOWS").
				OutN().
				ValueMap([]string{"externalId", "name"})).
			Returning("from_nodes", "to_nodes")))

	add("009-read-conditional-var-not-empty", helix.Read(
		helix.ReadBatch().
			VarAs("alice", helix.G().NWithLabel("ParityUser").
				Where(helix.Eq("externalId", "user-alice"))).
			VarAsIf("friends", helix.VarNotEmpty("alice"),
				helix.G().N(helix.NodeVar("alice")).
					Out("FOLLOWS").
					ValueMap([]string{"externalId", "name"})).
			Returning("alice", "friends")))

	add("010-read-count-all-users", helix.Read(
		helix.ReadBatch().
			VarAs("user_count", helix.G().NWithLabel("ParityUser").Count()).
			Returning("user_count")))

	add("011-read-filtered-values", helix.Read(
		helix.ReadBatch().
			VarAs("actives", helix.G().NWithLabel("ParityUser").
				Where(helix.Eq("status", "active")).
				OrderBy("name", "Asc").
				Values("name")).
			Returning("actives")))

	add("012-read-two-hop", helix.Read(
		helix.ReadBatch().
			VarAs("fof", helix.G().NWhere(helix.Eq("externalId", "user-alice")).
				Out("FOLLOWS").Out("FOLLOWS").Dedup().Values("name")).
			Returning("fof")))

	add("013-read-projection-expr", helix.Read(
		helix.ReadBatch().
			VarAs("alice", helix.G().NWithLabel("ParityUser").
				Where(helix.Eq("externalId", "user-alice")).
				Project(
					helix.ProjectProp("externalId", "id"),
					helix.ProjectProp("name", "name"),
					helix.ProjectExpr("score_plus_one",
						helix.Prop("score").Add(helix.Val(1.0))),
					helix.ProjectExpr("status_label", helix.Case(
						[]helix.WhenThen{{
							When: helix.Eq("status", "active"),
							Then: helix.Val("enabled"),
						}},
						helix.Val("disabled"))),
				)).
			Returning("alice")))

	add("014-read-vector-search", helix.Read(
		helix.ReadBatch().
			VarAs("hits", helix.G().VectorSearchNodes(
				"ParityDoc", "embedding", []float64{1.0, 0.05, 0.0, 0.0}, 2).
				ValueMap([]string{"title", "$distance"})).
			Returning("hits")))

	add("015-read-text-search", helix.Read(
		helix.ReadBatch().
			VarAs("hits", helix.G().TextSearchNodes(
				"ParityDoc", "body", "vector search", 2).
				ValueMap([]string{"title"})).
			Returning("hits")))

	add("016-read-vector-then-graph", helix.Read(
		helix.ReadBatch().
			VarAs("seed", helix.G().VectorSearchNodes(
				"ParityDoc", "embedding", []float64{0.6, 0.6, 0.0, 0.0}, 1).
				ValueMap([]string{"$id", "title", "$distance"})).
			VarAs("count_from_seed", helix.G().N(helix.NodeVar("seed")).Count()).
			Returning("seed", "count_from_seed")))

	add("017-read-edge-source", helix.Read(
		helix.ReadBatch().
			VarAs("recent", helix.G().EWithLabel("FOLLOWS").
				Where(helix.Gte("since", 2021)).
				OrderBy("since", "Desc").
				EdgeProperties()).
			Returning("recent")))

	add("018-read-group-aggregate", helix.Read(
		helix.ReadBatch().
			VarAs("by_status", helix.G().NWithLabel("ParityUser").GroupCount("status")).
			VarAs("mean_age", helix.G().NWithLabel("ParityUser").AggregateBy("Mean", "age")).
			Returning("by_status", "mean_age")))

	add("019-read-conditional-batch", helix.Read(
		helix.ReadBatch().
			VarAs("ghosts", helix.G().NWithLabel("Ghost")).
			VarAsIf("gated", helix.VarNotEmpty("ghosts"),
				helix.G().NWithLabel("ParityUser").Count()).
			VarAsIf("open", helix.VarEmpty("ghosts"),
				helix.G().NWithLabel("ParityUser").Count()).
			Returning("gated", "open")))

	add("020-read-union-coalesce", helix.Read(
		helix.ReadBatch().
			VarAs("fanout", helix.G().NWhere(helix.Eq("externalId", "user-alice")).
				Union(helix.G().Out("FOLLOWS"), helix.G().Out("FOLLOWS")).
				Count()).
			VarAs("first_hop", helix.G().NWithLabel("ParityUser").
				Coalesce(helix.G().Out("FOLLOWS"), helix.G().OutE("FOLLOWS")).
				Dedup().Count()).
			Returning("fanout", "first_hop")))

	add("021-read-repeat", helix.Read(
		helix.ReadBatch().
			VarAs("reach", helix.G().NWhere(helix.Eq("externalId", "user-alice")).
				Repeat(helix.NewRepeat(helix.G().Out("FOLLOWS")).Times(2)).
				Dedup().Values("name")).
			Returning("reach")))

	add("022-read-row-bindings", helix.Read(
		helix.ReadBatch().
			VarAs("pairs", helix.G().NWithLabel("ParityUser").
				Bind("follower").
				Out("FOLLOWS").
				ProjectBindings([]helix.J{
					helix.BindingProp(helix.Binding("follower"), "name", "from_name"),
					helix.BindingProp(helix.Current, "name", "to_name"),
					helix.BindingCoalesce([]helix.J{
						helix.BindingRefOf(helix.Current, "nickname"),
						helix.BindingRefOf(helix.Current, "name"),
					}, "display"),
				}, true)).
			Returning("pairs")))

	add("023-read-parameters", helix.Read(
		helix.ReadBatch().
			VarAs("grown", helix.G().NWithLabel("ParityUser").
				Where(helix.Gt("age", helix.Param("min_age"))).
				Where(helix.Eq("status", helix.Param("want"))).
				OrderBy("age", "Asc").
				Values("name")).
			Returning("grown")).
		WithParameter("min_age", "I64", 30).
		WithParameter("want", "String", "active"))

	add("024-write-foreach-param-create", helix.Write(
		helix.WriteBatch().
			ForEachParam("users", helix.WriteBatch().
				VarAs("u", helix.G().AddNOrdered("ImportedUser", []helix.PropPair{
					{Key: "name", Value: helix.Param("users.name")},
				}))).
			VarAs("imported", helix.G().NWithLabel("ImportedUser").Count()).
			Returning("imported")).
		WithParameter("users", map[string]helix.J{"Array": "Object"},
			[]helix.J{
				map[string]helix.J{"name": "Zed"},
				map[string]helix.J{"name": "Yan"},
			}))

	add("025-write-set-remove-property", helix.Write(
		helix.WriteBatch().
			VarAs("bumped", helix.G().NWhere(helix.Eq("externalId", "user-bob")).
				SetProperty("age", helix.Prop("age").Add(helix.Val(1))).
				Values("age")).
			VarAs("cleaned", helix.G().NWhere(helix.Eq("externalId", "user-bob")).
				RemoveProperty("score").
				ValueMap([]string{"name", "score"})).
			Returning("bumped", "cleaned")))

	add("026-read-within-without", helix.Read(
		helix.ReadBatch().
			VarAs("followed", helix.G().NWithLabel("ParityUser").Out("FOLLOWS").Dedup()).
			VarAs("roots", helix.G().NWithLabel("ParityUser").
				Without("followed").Values("name")).
			Returning("roots")))

	add("027-write-drop-edge", helix.Write(
		helix.WriteBatch().
			VarAs("carol", helix.G().NWhere(helix.Eq("externalId", "user-carol"))).
			VarAs("cut", helix.G().NWhere(helix.Eq("externalId", "user-bob")).
				DropEdgeLabeled(helix.NodeVar("carol"), "FOLLOWS")).
			VarAs("remaining", helix.G().EWithLabel("FOLLOWS").Count()).
			Returning("remaining")))

	add("028-write-drop-node-cascades", helix.Write(
		helix.WriteBatch().
			VarAs("gone", helix.G().NWhere(helix.Eq("externalId", "user-bob")).Drop()).
			VarAs("users", helix.G().NWithLabel("ParityUser").Count()).
			VarAs("edges", helix.G().EWithLabel("FOLLOWS").Count()).
			Returning("users", "edges")))

	add("029-read-reserved-noops", helix.Read(
		helix.ReadBatch().
			VarAs("still_counts", helix.G().NWithLabel("ParityUser").
				Fold().Unfold().Path().SimplePath().
				WithSack(0).SackSet("s").SackAdd("s").SackGet().
				Count()).
			Returning("still_counts")))

	add("030-read-order-multi-limit", helix.Read(
		helix.ReadBatch().
			VarAs("page", helix.G().NWithLabel("ParityUser").
				OrderByMultiple([][2]string{{"status", "Asc"}, {"age", "Desc"}}).
				Limit(2).
				Values("name")).
			Returning("page")))

	add("031-read-exists-id-label", helix.Read(
		helix.ReadBatch().
			VarAs("has_users", helix.G().NWithLabel("ParityUser").Exists()).
			VarAs("has_ghosts", helix.G().NWithLabel("Ghost").Exists()).
			VarAs("labels", helix.G().NWhere(helix.Eq("externalId", "user-alice")).Label()).
			Returning("has_users", "has_ghosts", "labels")))

	add("032-read-edge-endpoints", helix.Read(
		helix.ReadBatch().
			VarAs("targets", helix.G().NWhere(helix.Eq("externalId", "user-alice")).
				OutE("FOLLOWS").InN().
				OrderBy("name", "Asc").
				Values("name")).
			Returning("targets")))

	return out
}

func comboFixtures() []fixture {
	type namedSource struct {
		name string
		make func() helix.Traversal
	}
	type namedStage struct {
		name  string
		apply func(helix.Traversal) helix.Traversal
	}
	sources := []namedSource{
		{"n-all", func() helix.Traversal { return helix.G().N(helix.NodeAll) }},
		{"n-label", func() helix.Traversal { return helix.G().NWithLabel("ParityUser") }},
		{"e-label", func() helix.Traversal { return helix.G().EWithLabel("FOLLOWS") }},
	}
	filters := []namedStage{
		{"nofilter", func(t helix.Traversal) helix.Traversal { return t }},
		{"has", func(t helix.Traversal) helix.Traversal { return t.Has("status", "active") }},
		{"where-gt", func(t helix.Traversal) helix.Traversal { return t.Where(helix.Gt("age", 20)) }},
		{"dedup", func(t helix.Traversal) helix.Traversal { return t.Dedup() }},
	}
	bounds := []namedStage{
		{"nobound", func(t helix.Traversal) helix.Traversal { return t }},
		{"limit", func(t helix.Traversal) helix.Traversal { return t.Limit(2) }},
		{"skip", func(t helix.Traversal) helix.Traversal { return t.Skip(1) }},
		{"range", func(t helix.Traversal) helix.Traversal { return t.Range(0, 2) }},
	}
	terminals := []namedStage{
		{"count", func(t helix.Traversal) helix.Traversal { return t.Count() }},
		{"exists", func(t helix.Traversal) helix.Traversal { return t.Exists() }},
		{"id", func(t helix.Traversal) helix.Traversal { return t.IDs() }},
		{"valuemap", func(t helix.Traversal) helix.Traversal {
			return t.ValueMap([]string{"name", "since"})
		}},
	}
	out := []fixture{}
	index := 0
	for _, s := range sources {
		for _, f := range filters {
			for _, b := range bounds {
				for _, term := range terminals {
					index++
					name := fmt.Sprintf("%03d-%s-%s-%s-%s",
						index, s.name, f.name, b.name, term.name)
					traversal := term.apply(b.apply(f.apply(s.make())))
					out = append(out, fixture{name, helix.Read(
						helix.ReadBatch().
							VarAs("result", traversal).
							Returning("result"))})
				}
			}
		}
	}
	return out
}

func jsonOnlyFixtures() []fixture {
	out := []fixture{}
	add := func(name string, req *helix.DynamicQueryRequest) {
		out = append(out, fixture{name, req})
	}

	add("001-all-predicates", helix.Read(
		helix.ReadBatch().
			VarAs("x", helix.G().N(helix.NodeAll).Where(helix.And(
				helix.Eq("a", 1), helix.Neq("b", "s"),
				helix.Gt("c", 1.5), helix.Gte("d", 0),
				helix.Lt("e", 10), helix.Lte("f", 10),
				helix.Between("grange", 1, 5),
				helix.HasKeyPred("h"), helix.IsNull("i"),
				helix.IsNotNull("j"),
				helix.StartsWith("k", "pre"),
				helix.EndsWith("l", "post"),
				helix.Contains("m", "mid"),
				helix.ContainsExpr("n", helix.Param("needle")),
				helix.IsIn("o", []int{1, 2, 3}),
				helix.IsInExpr("p", helix.Param("choices")),
				helix.Or(helix.Not(helix.Eq("q", false))),
				helix.Compare(helix.Prop("r").Mul(helix.Val(2)), "Gte", helix.Param("s")),
			)))))

	add("002-all-property-values", helix.Write(
		helix.WriteBatch().
			VarAs("x", helix.G().AddNOrdered("Kitchen", []helix.PropPair{
				{Key: "null", Value: nil}, {Key: "bool", Value: true},
				{Key: "i64", Value: 42}, {Key: "f64", Value: 2.5},
				{Key: "f32", Value: helix.F32(1.25)}, {Key: "string", Value: "text"},
				{Key: "datetime", Value: helix.DateTimeMillis(1700000000000)},
				{Key: "bytes", Value: helix.Bytes([]byte{0x00, 0x01, 0xff})},
				{Key: "i64arr", Value: []int{1, 2, 3}},
				{Key: "f64arr", Value: []float64{1.5, 2.5}},
				{Key: "f32arr", Value: helix.F32Array([]float64{0.5})},
				{Key: "strarr", Value: []string{"a", "b"}},
				{Key: "mixed", Value: []interface{}{1, "two", nil}},
				{Key: "obj", Value: map[string]interface{}{
					"nested": map[string]interface{}{"deep": 1},
				}},
			}))))

	add("003-all-exprs", helix.Read(
		helix.ReadBatch().
			VarAs("x", helix.G().N(helix.NodeAll).Project(
				helix.ProjectExpr("a", helix.Prop("p").Add(helix.Val(1))),
				helix.ProjectExpr("b", helix.Prop("p").Sub(helix.Val(1))),
				helix.ProjectExpr("c", helix.Prop("p").Mul(helix.Val(2))),
				helix.ProjectExpr("d", helix.Prop("p").Div(helix.Val(2))),
				helix.ProjectExpr("e", helix.Prop("p").Mod(helix.Val(2))),
				helix.ProjectExpr("f", helix.Prop("p").Neg()),
				helix.ProjectExpr("g", helix.ExprID()),
				helix.ProjectExpr("h", helix.Timestamp()),
				helix.ProjectExpr("i", helix.DateTimeNow()),
				helix.ProjectExpr("j", helix.Param("q")),
				helix.ProjectExpr("k", helix.Case([]helix.WhenThen{
					{When: helix.Eq("x", 1), Then: helix.Val("one")},
				}, helix.Val("other"))),
			))))

	add("004-all-index-specs", helix.Write(
		helix.WriteBatch().
			VarAs("a", helix.G().CreateIndexIfNotExists(helix.NodeEqualityIndex("L", "p", false))).
			VarAs("b", helix.G().CreateIndexIfNotExists(helix.NodeEqualityIndex("L", "q", true))).
			VarAs("c", helix.G().CreateIndexIfNotExists(helix.NodeRangeIndex("L", "r"))).
			VarAs("d", helix.G().CreateIndexIfNotExists(helix.NodeRangeIndexDesc("L", "s"))).
			VarAs("e", helix.G().CreateIndexIfNotExists(helix.EdgeEqualityIndex("E", "p"))).
			VarAs("f", helix.G().CreateIndexIfNotExists(helix.EdgeRangeIndex("E", "q"))).
			VarAs("g2", helix.G().CreateIndexIfNotExists(helix.NodeVectorIndex("L", "v", "tenant"))).
			VarAs("h", helix.G().CreateIndexIfNotExists(helix.NodeTextIndex("L", "t", ""))).
			VarAs("i", helix.G().CreateIndexIfNotExists(helix.EdgeVectorIndex("E", "v", ""))).
			VarAs("j", helix.G().CreateIndexIfNotExists(helix.EdgeTextIndex("E", "t", ""))).
			VarAs("k", helix.G().DropIndex(helix.NodeEqualityIndex("L", "p", false)))))

	add("005-all-navigation", helix.Read(
		helix.ReadBatch().
			VarAs("x", helix.G().N(helix.NodeAll).
				Out("A").In("B").Both("").
				OutE("C").OutN().
				BothE("").OtherN().
				InE("D").InN().
				Count())))

	add("006-edge-search-steps", helix.Read(
		helix.ReadBatch().
			VarAs("v", helix.G().VectorSearchEdgesTenant("SIM", "emb", []float64{1.0, 0.0}, 5, "t1")).
			VarAs("t", helix.G().TextSearchEdges("SIM", "note", "query text", 3))))

	add("007-repeat-full-config", helix.Read(
		helix.ReadBatch().
			VarAs("x", helix.G().N(helix.NodeAll).Repeat(
				helix.NewRepeat(helix.G().Out("NEXT")).
					Until(helix.Eq("leaf", true)).
					EmitIf(helix.Gt("depth", 1)).
					MaxDepth(7)).
				Count())))

	add("008-choose-optional", helix.Read(
		helix.ReadBatch().
			VarAs("x", func() helix.Traversal {
				elseBranch := helix.G().In("")
				return helix.G().N(helix.NodeAll).
					Choose(helix.Eq("kind", "a"), helix.G().Out(""), &elseBranch).
					Optional(helix.G().Out("MAYBE")).
					Count()
			}())))

	add("009-mutations", helix.Write(
		helix.WriteBatch().
			VarAs("x", helix.G().N(helix.NodeIDs(1, 2)).
				AddEOrdered("REL", helix.NodeParam("targets"),
					[]helix.PropPair{{Key: "w", Value: 1}}).
				SetProperty("touched", true).
				RemoveProperty("stale").
				DropEdge(helix.NodeVar("others")).
				DropEdgeLabeled(helix.NodeIDs(3), "REL").
				DropEdgeByID(helix.EdgeIDs(7)).
				Drop())))

	add("010-stream-bounds", helix.Read(
		helix.ReadBatch().
			VarAs("x", helix.G().N(helix.NodeAll).
				Limit(helix.Param("lim")).
				Skip(2).
				RangeBy(helix.Param("lo"), helix.Param("hi")).
				Count())))

	add("011-batch-conditions", helix.Read(
		helix.ReadBatch().
			VarAs("a", helix.G().N(helix.NodeAll)).
			VarAsIf("b", helix.VarNotEmpty("a"), helix.G().N(helix.NodeAll).Count()).
			VarAsIf("c", helix.VarEmpty("a"), helix.G().N(helix.NodeAll).Count()).
			VarAsIf("d", helix.VarMinSize("a", 3), helix.G().N(helix.NodeAll).Count()).
			VarAsIf("e", helix.PrevNotEmpty(), helix.G().N(helix.NodeAll).Count())))

	add("012-big-u64-ids", helix.Read(
		helix.ReadBatch().
			VarAs("x", helix.G().N(helix.NodeIDs(
				(uint64(1)<<63)+11, (uint64(1)<<53)+1)).IDs())))

	return out
}

func writeBucket(root, bucket string, fixtures []fixture) error {
	dir := filepath.Join(root, bucket)
	if err := os.MkdirAll(dir, 0o755); err != nil {
		return err
	}
	for _, fx := range fixtures {
		body, err := json.MarshalIndent(fx.req, "", "  ")
		if err != nil {
			return fmt.Errorf("%s: %w", fx.name, err)
		}
		path := filepath.Join(dir, fx.name+".json")
		if err := os.WriteFile(path, append(body, '\n'), 0o644); err != nil {
			return err
		}
	}
	return nil
}

func main() {
	if len(os.Args) != 2 {
		fmt.Fprintln(os.Stderr, "usage: generate-parity-fixtures <outdir>")
		os.Exit(2)
	}
	root := os.Args[1]
	runtime := runtimeFixtures()
	combo := comboFixtures()
	jsonOnly := jsonOnlyFixtures()
	if err := writeBucket(root, "runtime", runtime); err != nil {
		fmt.Fprintln(os.Stderr, err)
		os.Exit(1)
	}
	if err := writeBucket(root, "combo", combo); err != nil {
		fmt.Fprintln(os.Stderr, err)
		os.Exit(1)
	}
	if err := writeBucket(root, "json-only", jsonOnly); err != nil {
		fmt.Fprintln(os.Stderr, err)
		os.Exit(1)
	}
	fmt.Printf("generated fixtures: runtime=%d combo=%d json-only=%d\n",
		len(runtime), len(combo), len(jsonOnly))
}

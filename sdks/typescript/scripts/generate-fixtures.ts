/**
 * TypeScript-side parity fixture generator.
 *
 * Emits the same corpus as the Python generator (tests/parity/gen.py):
 * 32 ordered runtime/ fixtures, 192 combo/ permutations and 12
 * json-only/ exhaustive-AST fixtures (reference analog:
 * sdks/typescript/scripts/parity/generate-fixtures.ts).
 *
 * Usage: npx tsx generate-fixtures.ts <outDir>
 */

import { mkdirSync, writeFileSync } from "node:fs";
import { join } from "node:path";

import {
  BatchCondition,
  BindingProjection,
  BindingRef,
  DynamicQueryRequest,
  Expr,
  IndexSpec,
  NodeRef,
  EdgeRef,
  Predicate,
  Projection,
  PropertyValue,
  RepeatConfig,
  SourcePredicate,
  Traversal,
  defineParams,
  g,
  param,
  readBatch,
  stringifyJson,
  sub,
  writeBatch,
} from "../src/dsl";

type Fixture = [string, DynamicQueryRequest];

const runtime: Fixture[] = [];
const addRuntime = (name: string, req: DynamicQueryRequest) => {
  runtime.push([name, req]);
};

addRuntime(
  "001-write-setup-indexes",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs("name_idx", g().createIndexIfNotExists(IndexSpec.nodeEquality("ParityUser", "externalId")))
      .varAs("age_idx", g().createIndexIfNotExists(IndexSpec.nodeRange("ParityUser", "age")))
      .varAs("vec_idx", g().createVectorIndexNodes("ParityDoc", "embedding"))
      .varAs("txt_idx", g().createTextIndexNodes("ParityDoc", "body"))
      .returning(["name_idx", "age_idx", "vec_idx", "txt_idx"]),
  ),
);

// score must be PINNED as F64: a JS number like 55.0 is
// indistinguishable from the integer 55, so the unpinned coercion
// would emit {I64: 55} and break cross-SDK parity (caught by the
// interpreted-serializer replay, tests/test_sdk_serializers.py)
const user = (id: string, name: string, age: number, status: string, score: number) =>
  g().addN("ParityUser", [
    ["externalId", id],
    ["name", name],
    ["age", age],
    ["status", status],
    ["score", PropertyValue.f64(score)],
  ]);

addRuntime(
  "002-write-seed-users",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs("alice", user("user-alice", "Alice", 34, "active", 91.5))
      .varAs("bob", user("user-bob", "Bob", 27, "inactive", 55.0))
      .varAs("carol", user("user-carol", "Carol", 41, "active", 73.25))
      .returning(["alice", "bob", "carol"]),
  ),
);

addRuntime(
  "003-write-seed-edges",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs("alice", g().nWhere(SourcePredicate.eq("externalId", "user-alice")))
      .varAs("bob", g().nWhere(SourcePredicate.eq("externalId", "user-bob")))
      .varAs("carol", g().nWhere(SourcePredicate.eq("externalId", "user-carol")))
      .varAs("f1", g().n(NodeRef.var_("alice")).addE("FOLLOWS", NodeRef.var_("bob"), [["since", 2020]]))
      .varAs("f2", g().n(NodeRef.var_("bob")).addE("FOLLOWS", NodeRef.var_("carol"), [["since", 2021]]))
      .varAs("f3", g().n(NodeRef.var_("alice")).addE("FOLLOWS", NodeRef.var_("carol"), [["since", 2022]]))
      .returning([]),
  ),
);

const doc = (title: string, body: string, embedding: number[]) =>
  g().addN("ParityDoc", [
    ["title", title],
    ["body", body],
    ["embedding", PropertyValue.f32Array(embedding)],
  ]);

addRuntime(
  "004-write-seed-docs",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs("d1", doc("intro", "graph databases store nodes and edges", [1.0, 0.0, 0.0, 0.0]))
      .varAs("d2", doc("vectors", "vector search finds nearest neighbors", [0.0, 1.0, 0.0, 0.0]))
      .varAs("d3", doc("hybrid", "hybrid queries mix graph and vector search", [0.7, 0.7, 0.0, 0.0]))
      .returning([]),
  ),
);

addRuntime(
  "005-read-order-range-values",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "ordered",
        g()
          .nWithLabel("ParityUser")
          .orderByMultiple([["status", "Asc"], ["age", "Desc"]])
          .range(0, 2)
          .valueMap(["externalId", "age", "status"]),
      )
      .returning(["ordered"]),
  ),
);

addRuntime(
  "006-read-edge-count",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "edge_count",
        g()
          .nWithLabel("ParityUser")
          .where(Predicate.eq("externalId", "user-alice"))
          .outE("FOLLOWS")
          .count(),
      )
      .returning(["edge_count"]),
  ),
);

addRuntime(
  "007-read-edge-properties",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("edges", g().eWithLabel("FOLLOWS").edgeHas("since", 2021).edgeProperties())
      .returning(["edges"]),
  ),
);

addRuntime(
  "008-read-edge-endpoints",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "from_nodes",
        g().eWithLabel("FOLLOWS").edgeHasLabel("FOLLOWS").inN().valueMap(["externalId", "name"]),
      )
      .varAs("to_nodes", g().eWithLabel("FOLLOWS").outN().valueMap(["externalId", "name"]))
      .returning(["from_nodes", "to_nodes"]),
  ),
);

addRuntime(
  "009-read-conditional-var-not-empty",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("alice", g().nWithLabel("ParityUser").where(Predicate.eq("externalId", "user-alice")))
      .varAsIf(
        "friends",
        BatchCondition.varNotEmpty("alice"),
        g().n(NodeRef.var_("alice")).out("FOLLOWS").valueMap(["externalId", "name"]),
      )
      .returning(["alice", "friends"]),
  ),
);

addRuntime(
  "010-read-count-all-users",
  DynamicQueryRequest.read(
    readBatch().varAs("user_count", g().nWithLabel("ParityUser").count()).returning(["user_count"]),
  ),
);

addRuntime(
  "011-read-filtered-values",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "actives",
        g()
          .nWithLabel("ParityUser")
          .where(Predicate.eq("status", "active"))
          .orderBy("name", "Asc")
          .values(["name"]),
      )
      .returning(["actives"]),
  ),
);

addRuntime(
  "012-read-two-hop",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "fof",
        g()
          .nWhere(SourcePredicate.eq("externalId", "user-alice"))
          .out("FOLLOWS")
          .out("FOLLOWS")
          .dedup()
          .values(["name"]),
      )
      .returning(["fof"]),
  ),
);

addRuntime(
  "013-read-projection-expr",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "alice",
        g()
          .nWithLabel("ParityUser")
          .where(Predicate.eq("externalId", "user-alice"))
          .project([
            Projection.property("externalId", "id"),
            Projection.property("name"),
            Projection.expr("score_plus_one", Expr.prop("score").add(Expr.val(PropertyValue.f64(1.0)))),
            Projection.expr(
              "status_label",
              Expr.case_(
                [[Predicate.eq("status", "active"), Expr.val("enabled")]],
                Expr.val("disabled"),
              ),
            ),
          ]),
      )
      .returning(["alice"]),
  ),
);

addRuntime(
  "014-read-vector-search",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "hits",
        g()
          .vectorSearchNodes("ParityDoc", "embedding", [1.0, 0.05, 0.0, 0.0], 2)
          .valueMap(["title", "$distance"]),
      )
      .returning(["hits"]),
  ),
);

addRuntime(
  "015-read-text-search",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("hits", g().textSearchNodes("ParityDoc", "body", "vector search", 2).valueMap(["title"]))
      .returning(["hits"]),
  ),
);

addRuntime(
  "016-read-vector-then-graph",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "seed",
        g()
          .vectorSearchNodes("ParityDoc", "embedding", [0.6, 0.6, 0.0, 0.0], 1)
          .valueMap(["$id", "title", "$distance"]),
      )
      .varAs("count_from_seed", g().n(NodeRef.var_("seed")).count())
      .returning(["seed", "count_from_seed"]),
  ),
);

addRuntime(
  "017-read-edge-source",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "recent",
        g()
          .eWithLabel("FOLLOWS")
          .where(Predicate.gte("since", 2021))
          .orderBy("since", "Desc")
          .edgeProperties(),
      )
      .returning(["recent"]),
  ),
);

addRuntime(
  "018-read-group-aggregate",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("by_status", g().nWithLabel("ParityUser").groupCount("status"))
      .varAs("mean_age", g().nWithLabel("ParityUser").aggregateBy("Mean", "age"))
      .returning(["by_status", "mean_age"]),
  ),
);

addRuntime(
  "019-read-conditional-batch",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("ghosts", g().nWithLabel("Ghost"))
      .varAsIf("gated", BatchCondition.varNotEmpty("ghosts"), g().nWithLabel("ParityUser").count())
      .varAsIf("open", BatchCondition.varEmpty("ghosts"), g().nWithLabel("ParityUser").count())
      .returning(["gated", "open"]),
  ),
);

addRuntime(
  "020-read-union-coalesce",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "fanout",
        g()
          .nWhere(SourcePredicate.eq("externalId", "user-alice"))
          .union([sub().out("FOLLOWS"), sub().out("FOLLOWS")])
          .count(),
      )
      .varAs(
        "first_hop",
        g()
          .nWithLabel("ParityUser")
          .coalesce([sub().out("FOLLOWS"), sub().outE("FOLLOWS")])
          .dedup()
          .count(),
      )
      .returning(["fanout", "first_hop"]),
  ),
);

addRuntime(
  "021-read-repeat",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "reach",
        g()
          .nWhere(SourcePredicate.eq("externalId", "user-alice"))
          .repeat(new RepeatConfig(sub().out("FOLLOWS")).times(2))
          .dedup()
          .values(["name"]),
      )
      .returning(["reach"]),
  ),
);

addRuntime(
  "022-read-row-bindings",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "pairs",
        g()
          .nWithLabel("ParityUser")
          .bind("follower")
          .out("FOLLOWS")
          .projectBindings(
            [
              BindingProjection.binding("follower", "name", "from_name"),
              BindingProjection.current("name", "to_name"),
              BindingProjection.coalesce(
                [BindingRef.current("nickname"), BindingRef.current("name")],
                "display",
              ),
            ],
            true,
          ),
      )
      .returning(["pairs"]),
  ),
);

const p23 = defineParams({ min_age: param.i64(), want: param.string() });
addRuntime(
  "023-read-parameters",
  readBatch()
    .varAs(
      "grown",
      g()
        .nWithLabel("ParityUser")
        .where(Predicate.gtParam("age", "min_age"))
        .where(Predicate.eqParam("status", "want"))
        .orderBy("age", "Asc")
        .values(["name"]),
    )
    .returning(["grown"])
    .toDynamicRequest(p23, { min_age: 30, want: "active" }),
);

const p24 = defineParams({ users: param.array(param.object()) });
addRuntime(
  "024-write-foreach-param-create",
  writeBatch()
    .forEachParam(
      "users",
      writeBatch().varAs("u", g().addN("ImportedUser", [["name", Expr.param("users.name")]])),
    )
    .varAs("imported", g().nWithLabel("ImportedUser").count())
    .returning(["imported"])
    .toDynamicRequest(p24, { users: [{ name: "Zed" }, { name: "Yan" }] }),
);

addRuntime(
  "025-write-set-remove-property",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs(
        "bumped",
        g()
          .nWhere(SourcePredicate.eq("externalId", "user-bob"))
          .setProperty("age", Expr.prop("age").add(Expr.val(1)))
          .values(["age"]),
      )
      .varAs(
        "cleaned",
        g()
          .nWhere(SourcePredicate.eq("externalId", "user-bob"))
          .removeProperty("score")
          .valueMap(["name", "score"]),
      )
      .returning(["bumped", "cleaned"]),
  ),
);

addRuntime(
  "026-read-within-without",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("followed", g().nWithLabel("ParityUser").out("FOLLOWS").dedup())
      .varAs("roots", g().nWithLabel("ParityUser").without("followed").values(["name"]))
      .returning(["roots"]),
  ),
);

addRuntime(
  "027-write-drop-edge",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs("carol", g().nWhere(SourcePredicate.eq("externalId", "user-carol")))
      .varAs(
        "cut",
        g().nWhere(SourcePredicate.eq("externalId", "user-bob")).dropEdgeLabeled(NodeRef.var_("carol"), "FOLLOWS"),
      )
      .varAs("remaining", g().eWithLabel("FOLLOWS").count())
      .returning(["remaining"]),
  ),
);

addRuntime(
  "028-write-drop-node-cascades",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs("gone", g().nWhere(SourcePredicate.eq("externalId", "user-bob")).drop())
      .varAs("users", g().nWithLabel("ParityUser").count())
      .varAs("edges", g().eWithLabel("FOLLOWS").count())
      .returning(["users", "edges"]),
  ),
);

addRuntime(
  "029-read-reserved-noops",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "still_counts",
        g()
          .nWithLabel("ParityUser")
          .fold()
          .unfold()
          .path()
          .simplePath()
          .withSack(0)
          .sackSet("s")
          .sackAdd("s")
          .sackGet()
          .count(),
      )
      .returning(["still_counts"]),
  ),
);

addRuntime(
  "030-read-order-multi-limit",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "page",
        g()
          .nWithLabel("ParityUser")
          .orderByMultiple([["status", "Asc"], ["age", "Desc"]])
          .limit(2)
          .values(["name"]),
      )
      .returning(["page"]),
  ),
);

addRuntime(
  "031-read-exists-id-label",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("has_users", g().nWithLabel("ParityUser").exists())
      .varAs("has_ghosts", g().nWithLabel("Ghost").exists())
      .varAs("labels", g().nWhere(SourcePredicate.eq("externalId", "user-alice")).label())
      .returning(["has_users", "has_ghosts", "labels"]),
  ),
);

addRuntime(
  "032-read-edge-endpoints",
  DynamicQueryRequest.read(
    readBatch()
      .varAs(
        "targets",
        g()
          .nWhere(SourcePredicate.eq("externalId", "user-alice"))
          .outE("FOLLOWS")
          .inN()
          .orderBy("name", "Asc")
          .values(["name"]),
      )
      .returning(["targets"]),
  ),
);

// -- combo matrix (3 sources x 4 filters x 4 bounds x 4 terminals) ----

const combo: Fixture[] = [];
{
  // stage lambdas run over both stream kinds; use the runtime-erased
  // shape (the typed view's union return types would force per-kind
  // matrices like the Rust generator)
  type Live = { steps: unknown } & Record<string, any>;
  const sources: [string, () => Live][] = [
    ["n-all", () => g().n()],
    ["n-label", () => g().nWithLabel("ParityUser")],
    ["e-label", () => g().eWithLabel("FOLLOWS")],
  ];
  const filters: [string, (t: Live) => Live][] = [
    ["nofilter", (t) => t],
    ["has", (t) => t.has("status", "active")],
    ["where-gt", (t) => t.where(Predicate.gt("age", 20))],
    ["dedup", (t) => t.dedup()],
  ];
  const bounds: [string, (t: Live) => Live][] = [
    ["nobound", (t) => t],
    ["limit", (t) => t.limit(2)],
    ["skip", (t) => t.skip(1)],
    ["range", (t) => t.range(0, 2)],
  ];
  const terminals: [string, (t: Live) => Live][] = [
    ["count", (t) => t.count()],
    ["exists", (t) => t.exists()],
    ["id", (t) => t.id()],
    ["valuemap", (t) => t.valueMap(["name", "since"])],
  ];
  let index = 0;
  for (const [sname, source] of sources) {
    for (const [fname, filt] of filters) {
      for (const [bname, bound] of bounds) {
        for (const [tname, term] of terminals) {
          index += 1;
          const name = `${String(index).padStart(3, "0")}-${sname}-${fname}-${bname}-${tname}`;
          const traversal = term(bound(filt(source())));
          combo.push([
            name,
            DynamicQueryRequest.read(
              readBatch().varAs("result", traversal as any).returning(["result"]),
            ),
          ]);
        }
      }
    }
  }
}

// -- json-only: exhaustive-AST fixtures ------------------------------

const jsonOnly: Fixture[] = [];
const addJson = (name: string, req: DynamicQueryRequest) => {
  jsonOnly.push([name, req]);
};

addJson(
  "001-all-predicates",
  DynamicQueryRequest.read(
    readBatch().varAs(
      "x",
      g().n().where(
        Predicate.and([
          Predicate.eq("a", 1),
          Predicate.neq("b", "s"),
          Predicate.gt("c", 1.5),
          Predicate.gte("d", 0),
          Predicate.lt("e", 10),
          Predicate.lte("f", 10),
          Predicate.between("grange", 1, 5),
          Predicate.hasKey("h"),
          Predicate.isNull("i"),
          Predicate.isNotNull("j"),
          Predicate.startsWith("k", "pre"),
          Predicate.endsWith("l", "post"),
          Predicate.contains("m", "mid"),
          Predicate.containsExpr("n", Expr.param("needle")),
          Predicate.isIn("o", [1, 2, 3]),
          Predicate.isInExpr("p", Expr.param("choices")),
          Predicate.or([Predicate.not(Predicate.eq("q", false))]),
          Predicate.compare(Expr.prop("r").mul(Expr.val(2)), "Gte", Expr.param("s")),
        ]),
      ),
    ),
  ),
);
addJson(
  "002-all-property-values",
  DynamicQueryRequest.write(
    writeBatch().varAs(
      "x",
      g().addN("Kitchen", [
        ["null", null],
        ["bool", true],
        ["i64", 42],
        ["f64", 2.5],
        ["f32", PropertyValue.f32(1.25)],
        ["string", "text"],
        ["datetime", PropertyValue.dateTime(1700000000000)],
        ["bytes", PropertyValue.bytes([0x00, 0x01, 0xff])],
        ["i64arr", [1, 2, 3]],
        ["f64arr", [1.5, 2.5]],
        ["f32arr", PropertyValue.f32Array([0.5])],
        ["strarr", ["a", "b"]],
        ["mixed", PropertyValue.array([1, "two", null])],
        ["obj", { nested: { deep: 1 } }],
      ]),
    ),
  ),
);
addJson(
  "003-all-exprs",
  DynamicQueryRequest.read(
    readBatch().varAs(
      "x",
      g().n().project([
        Projection.expr("a", Expr.prop("p").add(Expr.val(1))),
        Projection.expr("b", Expr.prop("p").sub(Expr.val(1))),
        Projection.expr("c", Expr.prop("p").mul(Expr.val(2))),
        Projection.expr("d", Expr.prop("p").div(Expr.val(2))),
        Projection.expr("e", Expr.prop("p").mod(Expr.val(2))),
        Projection.expr("f", Expr.prop("p").neg()),
        Projection.expr("g", Expr.id()),
        Projection.expr("h", Expr.timestamp()),
        Projection.expr("i", Expr.dateTimeNow()),
        Projection.expr("j", Expr.param("q")),
        Projection.expr("k", Expr.case_([[Predicate.eq("x", 1), Expr.val("one")]], Expr.val("other"))),
      ]),
    ),
  ),
);
addJson(
  "004-all-index-specs",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs("a", g().createIndexIfNotExists(IndexSpec.nodeEquality("L", "p")))
      .varAs("b", g().createIndexIfNotExists(IndexSpec.nodeUniqueEquality("L", "q")))
      .varAs("c", g().createIndexIfNotExists(IndexSpec.nodeRange("L", "r")))
      .varAs("d", g().createIndexIfNotExists(IndexSpec.nodeRange("L", "s", "Desc")))
      .varAs("e", g().createIndexIfNotExists(IndexSpec.edgeEquality("E", "p")))
      .varAs("f", g().createIndexIfNotExists(IndexSpec.edgeRange("E", "q")))
      .varAs("g2", g().createIndexIfNotExists(IndexSpec.nodeVector("L", "v", "tenant")))
      .varAs("h", g().createIndexIfNotExists(IndexSpec.nodeText("L", "t")))
      .varAs("i", g().createIndexIfNotExists(IndexSpec.edgeVector("E", "v")))
      .varAs("j", g().createIndexIfNotExists(IndexSpec.edgeText("E", "t")))
      .varAs("k", g().dropIndex(IndexSpec.nodeEquality("L", "p"))),
  ),
);
addJson(
  "005-all-navigation",
  DynamicQueryRequest.read(
    readBatch().varAs(
      "x",
      g().n().out("A").in_("B").both().outE("C").outN().bothE(null).otherN().inE("D").inN().count(),
    ),
  ),
);
addJson(
  "006-edge-search-steps",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("v", g().vectorSearchEdges("SIM", "emb", [1.0, 0.0], 5, "t1"))
      .varAs("t", g().textSearchEdges("SIM", "note", "query text", 3)),
  ),
);
addJson(
  "007-repeat-full-config",
  DynamicQueryRequest.read(
    readBatch().varAs(
      "x",
      g()
        .n()
        .repeat(
          new RepeatConfig(sub().out("NEXT"))
            .until(Predicate.eq("leaf", true))
            .emitIf(Predicate.gt("depth", 1))
            .maxDepth(7),
        )
        .count(),
    ),
  ),
);
addJson(
  "008-choose-optional",
  DynamicQueryRequest.read(
    readBatch().varAs(
      "x",
      g()
        .n()
        .choose(Predicate.eq("kind", "a"), sub().out(), sub().in_())
        .optional(sub().out("MAYBE"))
        .count(),
    ),
  ),
);
addJson(
  "009-mutations",
  DynamicQueryRequest.write(
    writeBatch().varAs(
      "x",
      g()
        .n(NodeRef.ids([1n, 2n]))
        .addE("REL", NodeRef.param("targets"), [["w", 1]])
        .setProperty("touched", true)
        .removeProperty("stale")
        .dropEdge(NodeRef.var_("others"))
        .dropEdgeLabeled(NodeRef.ids([3n]), "REL")
        .dropEdgeById(EdgeRef.ids([7n]))
        .drop(),
    ),
  ),
);
addJson(
  "010-stream-bounds",
  DynamicQueryRequest.read(
    readBatch().varAs(
      "x",
      g().n().limit(Expr.param("lim")).skip(2).range(Expr.param("lo"), Expr.param("hi")).count(),
    ),
  ),
);
addJson(
  "011-batch-conditions",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("a", g().n())
      .varAsIf("b", BatchCondition.varNotEmpty("a"), g().n().count())
      .varAsIf("c", BatchCondition.varEmpty("a"), g().n().count())
      .varAsIf("d", BatchCondition.varMinSize("a", 3), g().n().count())
      .varAsIf("e", BatchCondition.prevNotEmpty(), g().n().count()),
  ),
);
addJson(
  "012-big-u64-ids",
  DynamicQueryRequest.read(
    readBatch().varAs("x", g().n(NodeRef.ids([(1n << 63n) + 11n, (1n << 53n) + 1n])).id()),
  ),
);

// -- write the corpus ---------------------------------------------------

const outDir = process.argv[2] ?? "ts-fixtures";
const buckets: [string, Fixture[]][] = [
  ["runtime", runtime],
  ["combo", combo],
  ["json-only", jsonOnly],
];
for (const [bucket, fixtures] of buckets) {
  const dir = join(outDir, bucket);
  mkdirSync(dir, { recursive: true });
  for (const [name, request] of fixtures) {
    writeFileSync(join(dir, `${name}.json`), stringifyJson(request.encode(), true) + "\n");
  }
  console.log(`${bucket}: ${fixtures.length} fixtures`);
}

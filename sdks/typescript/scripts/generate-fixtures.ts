/**
 * TypeScript parity-fixture generator.
 *
 * Emits the runtime fixture corpus from the TS DSL so it can be diffed
 * byte-structurally against the Python-generated fixtures in
 * `tests/parity/fixtures/runtime/` (the reference's cross-SDK parity
 * discipline: every SDK generates the same wire JSON).
 *
 * Usage (requires Node 18+; not available in the round-1 build image):
 *   npx tsx sdks/typescript/scripts/generate-fixtures.ts <outdir>
 *
 * Then compare:  diff -r <outdir> tests/parity/fixtures/runtime
 * (structural comparison — key order may differ; use a JSON-aware diff.)
 */

import { mkdirSync, writeFileSync } from "node:fs";
import { join } from "node:path";

import {
  DynamicQueryRequest,
  Expr,
  IndexSpec,
  NodeRef,
  Predicate,
  Projection,
  PropertyValue,
  SourcePredicate,
  g,
  readBatch,
  stringifyJson,
  writeBatch,
} from "../src/dsl";

const fixtures: [string, DynamicQueryRequest][] = [];

function add(name: string, request: DynamicQueryRequest): void {
  fixtures.push([name, request]);
}

add(
  "001-write-setup-indexes",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs(
        "name_idx",
        g().createIndexIfNotExists(IndexSpec.nodeEquality("ParityUser", "externalId")),
      )
      .varAs(
        "age_idx",
        g().createIndexIfNotExists(IndexSpec.nodeRange("ParityUser", "age")),
      )
      .varAs("vec_idx", g().createVectorIndexNodes("ParityDoc", "embedding"))
      .varAs("txt_idx", g().createTextIndexNodes("ParityDoc", "body"))
      .returning(["name_idx", "age_idx", "vec_idx", "txt_idx"]),
  ),
);

add(
  "002-write-seed-users",
  DynamicQueryRequest.write(
    writeBatch()
      .varAs(
        "alice",
        g().addN("ParityUser", [
          ["externalId", "user-alice"],
          ["name", "Alice"],
          ["age", 34],
          ["status", "active"],
          ["score", 91.5],
        ]),
      )
      .varAs(
        "bob",
        g().addN("ParityUser", [
          ["externalId", "user-bob"],
          ["name", "Bob"],
          ["age", 27],
          ["status", "inactive"],
          ["score", 55.0],
        ]),
      )
      .varAs(
        "carol",
        g().addN("ParityUser", [
          ["externalId", "user-carol"],
          ["name", "Carol"],
          ["age", 41],
          ["status", "active"],
          ["score", 73.25],
        ]),
      )
      .returning(["alice", "bob", "carol"]),
  ),
);

add(
  "010-read-count-all-users",
  DynamicQueryRequest.read(
    readBatch()
      .varAs("user_count", g().nWithLabel("ParityUser").count())
      .returning(["user_count"]),
  ),
);

add(
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

add(
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

add(
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
            Projection.expr("score_plus_one", Expr.prop("score").add(Expr.val(1.0))),
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

add(
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

add(
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

const outDir = process.argv[2] ?? "ts-fixtures";
mkdirSync(outDir, { recursive: true });
for (const [name, request] of fixtures) {
  writeFileSync(join(outDir, `${name}.json`), stringifyJson(request.encode(), true) + "\n");
}
console.log(`wrote ${fixtures.length} fixtures to ${outDir}`);

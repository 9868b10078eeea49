/**
 * Type-level typestate tests (reference analog: test/types.test-d.ts
 * over `Traversal<S, M>`, dsl.ts:1382).
 *
 * Run with `tsc --noEmit` or tsd; every `@ts-expect-error` marks a
 * chain that must NOT compile.
 */

import {
  NodeRef,
  Predicate,
  TraversalView,
  g,
  readBatch,
  sub,
  writeBatch,
} from "../src/dsl";

// -- valid chains ------------------------------------------------------

const nodes: TraversalView<"nodes", "read"> = g().nWithLabel("User");
const edges: TraversalView<"edges", "read"> = g().nWithLabel("User").outE("FOLLOWS");
const done: TraversalView<"done", "read"> = g().nWithLabel("User").count();
const written: TraversalView<"nodes", "write"> = g().addN("User", [["name", "x"]]);

readBatch().varAs("n", g().nWithLabel("User").count());
writeBatch().varAs("u", g().addN("User", []));
writeBatch().varAs("n", g().nWithLabel("User").count()); // reads in write batches: fine

g().vectorSearchNodes("Doc", "emb", [1.0], 5).valueMap(["$id", "$distance"]);
g().eWithLabel("F").edgeHas("w", 1).inN().out("X").count();
g().nWithLabel("User").repeat; // control flow available on live streams
g().n(NodeRef.ids([1n])).where(Predicate.eq("a", 1)).dedup().limit(3).id();

// -- invalid chains: each line must be a compile error -----------------

// @ts-expect-error a write (AddN) cannot enter a read batch
readBatch().varAs("u", g().addN("User", []));

// @ts-expect-error a mutation mid-chain flips mode to write
readBatch().varAs("x", g().nWithLabel("User").setProperty("a", 1));

// @ts-expect-error outN() walks edge->node; the stream here is nodes
g().nWithLabel("User").outN();

// @ts-expect-error out() walks node->node; the stream here is edges
g().eWithLabel("F").out("X");

// @ts-expect-error edgeProperties() is an edge terminal
g().nWithLabel("User").edgeProperties();

// @ts-expect-error no steps after a terminal
g().nWithLabel("User").count().limit(3);

// @ts-expect-error sources only appear at the start of a chain
g().nWithLabel("User").nWithLabel("Other");

// @ts-expect-error addE needs a node stream
g().eWithLabel("F").addE("REL", NodeRef.var_("x"));

// @ts-expect-error filters need a live stream, not a fresh g()
g().where(Predicate.eq("a", 1));

// keep the named bindings referenced so noUnusedLocals passes
void nodes;
void edges;
void done;
void written;
void sub;

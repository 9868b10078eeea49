/**
 * Structural JSON comparison for parity fixtures.
 *
 * Mirrors the reference's parity discipline (its TS harness compares
 * fixture trees structurally, tolerating key order and representing
 * integers beyond Number.MAX_SAFE_INTEGER exactly): values parse with
 * a bigint-aware reviver so u64 ids survive, objects compare by key
 * set, arrays by position.
 *
 * Usage (requires Node 18+; not available in the round-1 build image):
 *   npx tsx sdks/typescript/scripts/compare-json.ts <dirA> <dirB>
 *
 * Exit code 0 when every fixture in dirA has a structurally identical
 * counterpart in dirB (and vice versa); 1 with a per-file diff report
 * otherwise.
 */

import { readdirSync, readFileSync } from "node:fs";
import { join } from "node:path";

type Json =
  | null
  | boolean
  | number
  | bigint
  | string
  | Json[]
  | { [key: string]: Json };

/** Parse with large-integer preservation: any integer literal outside
 * the safe range is re-read from the source text as a bigint. */
export function parseJsonSafe(text: string): Json {
  // JSON.parse's reviver sees already-lossy numbers, so large integer
  // literals are instead pre-tokenized: quote them with a sentinel and
  // restore as bigint afterwards.
  const BIG = /(?<![\w."])-?\d{16,}(?![\w.])/g;
  const sentinel = "big:";
  const guarded = text.replace(BIG, (m) => `"${sentinel}${m}"`);
  return JSON.parse(guarded, (_k, v) => {
    if (typeof v === "string" && v.startsWith(sentinel)) {
      const raw = v.slice(sentinel.length);
      const asNumber = Number(raw);
      return Number.isSafeInteger(asNumber) ? asNumber : BigInt(raw);
    }
    return v;
  });
}

export function structuralEqual(a: Json, b: Json, path = "$"): string | null {
  if (typeof a === "bigint" || typeof b === "bigint") {
    return BigInt(a as never) === BigInt(b as never)
      ? null
      : `${path}: ${a} !== ${b}`;
  }
  if (a === null || b === null || typeof a !== "object" || typeof b !== "object") {
    return Object.is(a, b) ? null : `${path}: ${JSON.stringify(a)} !== ${JSON.stringify(b)}`;
  }
  if (Array.isArray(a) !== Array.isArray(b)) {
    return `${path}: array/object mismatch`;
  }
  if (Array.isArray(a) && Array.isArray(b)) {
    if (a.length !== b.length) {
      return `${path}: length ${a.length} !== ${b.length}`;
    }
    for (let i = 0; i < a.length; i++) {
      const diff = structuralEqual(a[i], b[i], `${path}[${i}]`);
      if (diff) return diff;
    }
    return null;
  }
  const ka = Object.keys(a as object).sort();
  const kb = Object.keys(b as object).sort();
  if (ka.join("\n") !== kb.join("\n")) {
    return `${path}: key sets differ (${ka} vs ${kb})`;
  }
  for (const k of ka) {
    const diff = structuralEqual(
      (a as Record<string, Json>)[k],
      (b as Record<string, Json>)[k],
      `${path}.${k}`,
    );
    if (diff) return diff;
  }
  return null;
}

function compareDirs(dirA: string, dirB: string): number {
  const filesA = readdirSync(dirA).filter((f) => f.endsWith(".json")).sort();
  const filesB = readdirSync(dirB).filter((f) => f.endsWith(".json")).sort();
  let failures = 0;
  const only = (xs: string[], ys: string[]) => xs.filter((x) => !ys.includes(x));
  for (const f of only(filesA, filesB)) {
    console.error(`only in ${dirA}: ${f}`);
    failures++;
  }
  for (const f of only(filesB, filesA)) {
    console.error(`only in ${dirB}: ${f}`);
    failures++;
  }
  for (const f of filesA.filter((x) => filesB.includes(x))) {
    const a = parseJsonSafe(readFileSync(join(dirA, f), "utf8"));
    const b = parseJsonSafe(readFileSync(join(dirB, f), "utf8"));
    const diff = structuralEqual(a, b);
    if (diff) {
      console.error(`${f}: ${diff}`);
      failures++;
    }
  }
  return failures;
}

if (process.argv.length === 4) {
  const failures = compareDirs(process.argv[2], process.argv[3]);
  if (failures) {
    console.error(`${failures} fixture(s) differ`);
    process.exit(1);
  }
  console.log("all fixtures structurally identical");
} else if (require.main === module) {
  console.error("usage: compare-json.ts <dirA> <dirB>");
  process.exit(2);
}

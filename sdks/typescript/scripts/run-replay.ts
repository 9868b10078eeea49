/**
 * Runtime replay harness: N-instance determinism check from TypeScript.
 *
 * The reference's TS harness boots three fresh engine instances and
 * diffs each fixture's response across them (its run-helix harness on
 * ports 18080/18081/18082).  This mirror does the same against
 * helix-tpu gateways: start the instances (e.g. three `helix-tpu
 * start` runs, or `python -m helix_tpu.server.http_server --port
 * 1808{0,1,2}`), then run this script to replay every runtime fixture
 * into each instance in order and structurally diff the outputs.
 *
 * Usage (requires Node 18+; not available in the round-1 build image):
 *   npx tsx sdks/typescript/scripts/run-replay.ts \
 *       tests/parity/fixtures/runtime http://127.0.0.1:18080 \
 *       http://127.0.0.1:18081 http://127.0.0.1:18082
 *
 * The Python equivalent used by the round-1 test suite lives at
 * tests/parity/replay.py (test_parity.py's 3-instance determinism
 * case); this script exists so the TS SDK can drive the same check
 * without Python.
 */

import { readdirSync, readFileSync } from "node:fs";
import { join } from "node:path";

import { parseJsonSafe, structuralEqual } from "./compare-json";

async function post(base: string, body: string): Promise<string> {
  const resp = await fetch(`${base}/v1/query`, {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body,
  });
  const text = await resp.text();
  if (!resp.ok) {
    // Error parity matters too: both kind and status must agree across
    // instances, so errors replay as comparable payloads.
    return JSON.stringify({ $status: resp.status, ...JSON.parse(text) });
  }
  return text;
}

async function main(): Promise<number> {
  const [fixtureDir, ...bases] = process.argv.slice(2);
  if (!fixtureDir || bases.length < 2) {
    console.error(
      "usage: run-replay.ts <fixture-dir> <url> <url> [url...]",
    );
    return 2;
  }
  const files = readdirSync(fixtureDir)
    .filter((f) => f.endsWith(".json"))
    .sort(); // ordered corpus: write fixtures build state for later reads
  let failures = 0;
  for (const f of files) {
    const body = readFileSync(join(fixtureDir, f), "utf8");
    const outputs = await Promise.all(bases.map((b) => post(b, body)));
    const reference = parseJsonSafe(outputs[0]);
    for (let i = 1; i < outputs.length; i++) {
      const diff = structuralEqual(reference, parseJsonSafe(outputs[i]));
      if (diff) {
        console.error(`${f}: instance[0] vs instance[${i}]: ${diff}`);
        failures++;
      }
    }
  }
  if (failures) {
    console.error(`${failures} divergence(s) across instances`);
    return 1;
  }
  console.log(`${files.length} fixtures replayed identically on ${bases.length} instances`);
  return 0;
}

main().then((code) => process.exit(code));

"""Cross-SDK parity: corpus coverage per SDK + multi-process HTTP replay.

The reference replays each SDK's fixtures against fresh engine instances
and diffs outputs (``sdks/typescript/scripts/parity/run-helix.ts:16-48``,
``sdks/tests/parity/README.md``).  Without Rust/Go/Node toolchains in
this image, the SDK generators cannot run here; what CAN be verified:

1. every committed fixture name is present in each SDK's generator
   (the generator can express the whole corpus);
2. every wire tag exercised by the corpus appears in each SDK's DSL
   source (no catalog gaps);
3. the runtime bucket replays identically against THREE separate
   server processes over HTTP (the reference's 3-instance determinism
   check, done with real processes rather than in-process engines).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
FIXTURES = REPO / "tests" / "parity" / "fixtures"
EXPECTED = REPO / "tests" / "parity" / "expected"

GENERATORS = {
    "rust": REPO / "sdks/rust/examples/generate_parity_fixtures.rs",
    "go": REPO / "sdks/go/cmd/generate-parity-fixtures/main.go",
    "typescript": REPO / "sdks/typescript/scripts/generate-fixtures.ts",
}
DSL_SOURCES = {
    "rust": REPO / "sdks/rust/src/dsl.rs",
    "go": REPO / "sdks/go/dsl.go",
    "typescript": REPO / "sdks/typescript/src/dsl.ts",
    "python": REPO / "helix_tpu/dsl.py",
}


def corpus_tags() -> set[str]:
    """Every externally-tagged variant used anywhere in the corpus."""
    tags: set[str] = set()

    def walk(node, depth=0):
        if isinstance(node, dict):
            for key, value in node.items():
                if key[:1].isupper():
                    tags.add(key)
                walk(value, depth + 1)
        elif isinstance(node, list):
            for item in node:
                walk(item, depth + 1)
        elif isinstance(node, str) and node[:1].isupper() and node.isalnum():
            tags.add(node)

    for path in FIXTURES.rglob("*.json"):
        walk(json.loads(path.read_text()))
    # drop value payloads that happen to be capitalized strings, and
    # enum VALUES that ride inside tagged steps (aggregate function
    # names, sort orders) — they are arguments, not wire variants
    return {
        t for t in tags
        if t not in {
            "Alice", "Bob", "Carol", "Zed", "Yan", "ParityUser", "ParityDoc",
            "Ghost", "ImportedUser", "Kitchen", "FOLLOWS", "REL", "SIM",
            "NEXT", "MAYBE",
            "Mean", "Sum", "Min", "Max",
        }
    }


@pytest.mark.parametrize("sdk", sorted(GENERATORS))
def test_generator_expresses_every_runtime_fixture(sdk):
    source = GENERATORS[sdk].read_text()
    missing = [
        path.stem
        for path in sorted((FIXTURES / "runtime").glob("*.json"))
        if path.stem not in source
    ]
    assert not missing, f"{sdk} generator lacks fixtures: {missing}"


@pytest.mark.parametrize("sdk", sorted(GENERATORS))
def test_generator_covers_all_buckets(sdk):
    source = GENERATORS[sdk].read_text()
    for marker in ("runtime", "combo", "json-only"):
        assert marker in source, f"{sdk} generator misses bucket {marker}"
    # every json-only fixture (exhaustive AST) must be expressible
    missing = [
        path.stem
        for path in sorted((FIXTURES / "json-only").glob("*.json"))
        if path.stem not in source
    ]
    assert not missing, f"{sdk} generator lacks json-only fixtures: {missing}"


@pytest.mark.parametrize("sdk", sorted(DSL_SOURCES))
def test_dsl_source_covers_every_corpus_tag(sdk):
    source = DSL_SOURCES[sdk].read_text()
    missing = [tag for tag in sorted(corpus_tags()) if tag not in source]
    assert not missing, f"{sdk} DSL source lacks wire tags: {missing}"


# ---------------------------------------------------------------------
# 3-process HTTP replay (reference run-helix.ts analog)
# ---------------------------------------------------------------------


def _start_server(port: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.Popen(
        [sys.executable, "-m", "helix_tpu.server.http_server",
         "--port", str(port), "--host", "127.0.0.1"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def _wait_ready(port: int, deadline: float = 60.0) -> None:
    start = time.time()
    while time.time() - start < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/health", timeout=2
            ) as resp:
                if resp.status == 200:
                    return
        except Exception:
            time.sleep(0.25)
    raise TimeoutError(f"server on port {port} never became ready")


def _replay_runtime(port: int) -> dict:
    results = {}
    for path in sorted((FIXTURES / "runtime").glob("*.json")):
        body = path.read_text().encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/query", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            results[path.stem] = json.loads(resp.read())
    return results


def test_three_server_processes_agree():
    """Replay the runtime bucket against three fresh server processes
    over HTTP; all outputs must agree with each other and the goldens."""
    import socket

    ports = []
    for _ in range(3):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        ports.append(s.getsockname()[1])
        s.close()
    procs = [_start_server(p) for p in ports]
    try:
        for p in ports:
            _wait_ready(p)
        outputs = [_replay_runtime(p) for p in ports]
    finally:
        for proc in procs:
            proc.terminate()
        for proc in procs:
            proc.wait(timeout=10)

    assert outputs[0] == outputs[1] == outputs[2]
    golden = json.loads((EXPECTED / "runtime.json").read_text())
    from tests.test_parity import approx_equal

    assert set(outputs[0]) == set(golden)
    for name in golden:
        assert approx_equal(outputs[0][name], golden[name]), name

"""Container packaging checks (reference: local_runtime.rs:167-196 runs the
engine image, :558-600 gates readiness on a real POST /v1/query probe).

Two tiers:

1. Static validity — always runs: the Dockerfile's COPY sources exist,
   its ENTRYPOINT parses against the real server argparse surface, and
   the exposed port matches the entrypoint.  This catches the
   "untested Dockerfile" rot class without a container runtime.
2. Build + run + readiness probe — runs only when docker or podman is
   on PATH (this image ships neither); otherwise skipped with the
   reason recorded, mirroring BENCH's machine-readable baseline-attempt
   record.
"""

from __future__ import annotations

import json
import re
import shutil
import subprocess
import time
import urllib.request
import uuid
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
DOCKERFILE = REPO / "Dockerfile"

READINESS_BATCH = {
    # the reference readiness probe: NWhere($label == sentinel) + Count
    # (local_runtime.rs:584) — a read that exercises the whole query path.
    "request_type": "read",
    "query_name": None,
    "query": {
        "queries": [{"Query": {
            "name": "ready",
            "steps": [
                {"NWhere": {"Eq": ["$label",
                                   {"String": "__HelixReadiness__"}]}},
                "Count",
            ],
            "condition": None,
        }}],
        "returns": ["ready"],
    },
    "parameters": {},
}


def _runtime() -> str | None:
    return shutil.which("docker") or shutil.which("podman")


def test_dockerfile_copy_sources_exist():
    for line in DOCKERFILE.read_text().splitlines():
        if not line.startswith("COPY "):
            continue
        sources = line.split()[1:-1]
        for src in sources:
            assert (REPO / src).exists(), f"COPY source missing: {src}"


def test_dockerfile_entrypoint_parses():
    text = DOCKERFILE.read_text()
    match = re.search(r'^ENTRYPOINT\s+(\[.*\])', text, re.M)
    assert match, "Dockerfile has no exec-form ENTRYPOINT"
    argv = json.loads(match.group(1))
    assert argv[:3] == ["python", "-m", "helix_tpu.server.http_server"]
    # the remaining args must be accepted by the server's argparse
    from helix_tpu.server.http_server import build_arg_parser

    args = build_arg_parser().parse_args(argv[3:])
    exposed = re.search(r"^EXPOSE\s+(\d+)", text, re.M)
    assert exposed and int(exposed.group(1)) == args.port


@pytest.mark.skipif(_runtime() is None,
                    reason="no container runtime (docker/podman) in image")
def test_container_build_run_readiness():
    runtime = _runtime()
    tag = f"helix-tpu-test-{uuid.uuid4().hex[:8]}"
    build = subprocess.run(
        [runtime, "build", "-t", tag, str(REPO)],
        capture_output=True, timeout=1200,
    )
    assert build.returncode == 0, build.stderr.decode()[-2000:]
    run = subprocess.run(
        [runtime, "run", "-d", "-p", "16989:8080", tag],
        capture_output=True, timeout=120,
    )
    assert run.returncode == 0, run.stderr.decode()[-2000:]
    container = run.stdout.decode().strip()
    try:
        body = json.dumps(READINESS_BATCH).encode()
        deadline = time.time() + 60
        last: Exception | None = None
        while time.time() < deadline:
            try:
                resp = urllib.request.urlopen(urllib.request.Request(
                    "http://127.0.0.1:16989/v1/query", data=body,
                    headers={"Content-Type": "application/json"},
                ), timeout=2)
                payload = json.loads(resp.read())
                assert payload["ready"] == 0
                return
            except Exception as exc:  # not up yet
                last = exc
                time.sleep(0.25)
        raise AssertionError(f"container never became ready: {last}")
    finally:
        subprocess.run([runtime, "rm", "-f", container],
                       capture_output=True, timeout=60)
        subprocess.run([runtime, "rmi", "-f", tag],
                       capture_output=True, timeout=60)

"""Headline benchmark: SIFT1M-class vector search QPS/chip at recall@10.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``

Workload (BASELINE.md configs[0]): 1M x 128-d vectors (synthetic,
SIFT-shaped clusters), cosine metric, k=10, batched queries against the
engine's serving kernel (``topk_resident``: resident bfloat16 matrix ->
MXU matmul -> approx_max_k -> exact f32 device re-rank).  Recall@10 is
measured against a float32 NumPy oracle and gated at >=0.95.

``value`` is sustained on-device throughput: a lax.scan over independent
pre-staged query batches inside one jit, so the chip runs search after
search with no host dispatch in between — the number that transfers to
production serving, where the engine is colocated with the chip.  The
scan is timed at ``rounds`` and ``rounds/2`` and differenced, which
cancels the tunnel's one ~20-30 ms RPC per invocation exactly.
``per_dispatch_qps`` shows the same loop paying one host dispatch per
batch, and ``e2e_tunnel_qps`` one full tunnel round trip per batch
(~30-50 ms RPC in this dev environment).

``vs_baseline``: the reference engine publishes no numbers and its binary
is a closed container image (BASELINE.md), so the baseline is **measured**
in-environment: a reference-class CPU HNSW (m=16, ef_construction=128,
the reference's own defaults — helix-cli/src/config.rs:191-201) built
over the same corpus by ``benchmarks/hnsw_baseline.cpp``, searched at
the cheapest ef_search reaching recall@10 >= 0.95, timed on this box's
CPU.  The 1M index builds once and is cached under ``.bench_cache/``;
the search-side QPS is re-measured live every run.  vs_baseline =
device QPS / measured CPU HNSW QPS.  Fallbacks (marked in the output):
the committed ``BASELINE_MEASURED.json`` from the last successful
measurement, then the pre-round-4 assumed constant.

Env overrides: BENCH_N, BENCH_D, BENCH_BATCH, BENCH_ROUNDS,
BENCH_SKIP_BASELINE=1 (skip CPU HNSW), BENCH_BUILD_BASELINE=0
(never build, only load a cached index), BENCH_SKIP_GATEWAY=1,
BENCH_SIFT/BENCH_DATASET=<dir> (TEXMEX corpus — real-dataset mode),
BENCH_METRIC=cosine|l2 (l2 serves raw vectors and scores against the
published groundtruth when present).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

# Pre-round-4 assumption (typical published single-node m=16 HNSW figure
# at 0.95 recall); used only as the last-resort fallback when no
# measurement is possible, and marked as such in the output.
ASSUMED_CPU_HNSW_QPS = 10_000.0


def _cpu_hnsw_baseline(data, queries, oracle, cache_tag: str = "") -> dict:
    """Measured CPU HNSW baseline with graceful degradation.

    Returns {"qps": float, "source": "measured"|"cached_measurement"|
    "assumed", ...detail...}."""
    here = os.path.dirname(os.path.abspath(__file__))
    committed = os.path.join(here, "BASELINE_MEASURED.json")
    n, d = data.shape
    if os.environ.get("BENCH_SKIP_BASELINE") != "1":
        try:
            sys.path.insert(0, here)
            from benchmarks.cpu_hnsw import measure_baseline

            measured = measure_baseline(
                data, queries, oracle,
                cache_dir=os.path.join(here, ".bench_cache"),
                allow_build=os.environ.get("BENCH_BUILD_BASELINE") != "0",
                log=lambda m: print(f"# {m}", file=sys.stderr),
                cache_tag=cache_tag,
            )
            if measured is not None:
                measured["source"] = "measured"
                try:  # refresh the committed per-config fallback record
                    try:
                        with open(committed) as fh:
                            records = json.load(fh)
                        if "qps" in records:  # legacy single-record file
                            records = {}
                    except (OSError, ValueError):
                        records = {}
                    record = dict(measured)
                    record["measured_at"] = time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    )
                    tag = f"{cache_tag}:" if cache_tag else ""
                    records[f"{tag}{n}x{d}"] = record
                    with open(committed, "w") as fh:
                        json.dump(records, fh, indent=1)
                except OSError:
                    pass
                return measured
        except Exception as exc:  # noqa: BLE001 — never sink the bench
            print(f"# cpu hnsw baseline measurement failed: {exc!r}",
                  file=sys.stderr)
    try:
        with open(committed) as fh:
            records = json.load(fh)
        tag = f"{cache_tag}:" if cache_tag else ""
        cached = records.get(f"{tag}{n}x{d}") if "qps" not in records else (
            records if records.get("n") == n and records.get("d") == d
            else None
        )
        if cached is not None:
            cached["source"] = "cached_measurement"
            return cached
    except (OSError, ValueError):
        pass
    return {"qps": ASSUMED_CPU_HNSW_QPS, "source": "assumed"}


def read_fvecs(path: str) -> np.ndarray:
    """TEXMEX ``.fvecs``: each record is an int32 dim d then d float32s.
    (http://corpus-texmex.irisa.fr/ layout — SIFT1M/GIST1M.)"""
    raw = np.fromfile(path, dtype=np.int32)
    d = int(raw[0])
    vecs = raw.reshape(-1, d + 1)[:, 1:]
    return vecs.view(np.float32)


def read_ivecs(path: str) -> np.ndarray:
    """TEXMEX ``.ivecs``: int32 dim then int32 ids (ground truth)."""
    raw = np.fromfile(path, dtype=np.int32)
    d = int(raw[0])
    return raw.reshape(-1, d + 1)[:, 1:].copy()


def _load_texmex(dirpath: str) -> dict:
    """Load a TEXMEX-layout dataset directory: ``*_base.fvecs``,
    ``*_query.fvecs``, optional ``*_groundtruth.ivecs`` (SIFT1M/GIST1M
    — BASELINE configs[0] and [4])."""
    import glob

    def one(pattern):
        hits = sorted(glob.glob(os.path.join(dirpath, pattern)))
        return hits[0] if hits else None

    base = one("*_base.fvecs")
    query = one("*_query.fvecs")
    if base is None or query is None:
        raise FileNotFoundError(
            f"{dirpath}: need *_base.fvecs and *_query.fvecs "
            "(TEXMEX layout, http://corpus-texmex.irisa.fr/; this "
            "zero-egress environment cannot fetch them — see "
            "benchmarks/fetch_sift.sh for a network-ful recipe)"
        )
    gt = one("*_groundtruth.ivecs")
    name = os.path.basename(base).split("_")[0]
    return {
        "name": name,
        "base": read_fvecs(base),
        "queries": read_fvecs(query),
        "groundtruth": read_ivecs(gt) if gt else None,
    }


def _median_spread(fn, reps: int = 3) -> dict:
    """median/min/max of ``fn()`` (ms) over ``reps`` repetitions —
    single-sample rows cannot distinguish a regression from this dev
    box's +-30% CPU-steal (round-3 verdict)."""
    samples = [fn() for _ in range(reps)]
    return {
        "median": round(statistics.median(samples), 3),
        "min": round(min(samples), 3),
        "max": round(max(samples), 3),
    }

# The dev TPU is reached through a tunnel that occasionally wedges: the
# backend enumerates but every device op hangs forever.  Probe it in a
# subprocess (a hung RPC cannot be interrupted in-process) and fall back
# to CPU when the chip is unreachable, so the bench always produces a
# result line.
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "180"))


def _device_backend_alive() -> bool:
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    probe = (
        "import jax, jax.numpy as jnp;"
        "assert jax.default_backend() != 'cpu';"
        "x = jnp.arange(64.0).sum();"
        "assert float(x) == 2016.0"
    )
    # The dev tunnel flaps: a wedged window can outlast one probe and
    # clear before the next, so retry before conceding to CPU.
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    for attempt in range(attempts):
        try:
            result = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=PROBE_TIMEOUT_S, capture_output=True,
            )
            if result.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < attempts:
            print(f"# device probe attempt {attempt + 1} failed; retrying",
                  file=sys.stderr)
    return False




def _reference_baseline_attempt() -> dict:
    """Attempt to measure the containerized reference engine (BASELINE.md
    mandate).  The engine ships only as a closed container image
    (ghcr.io/helixdb/enterprise-dev:latest, helix-cli/src/config.rs:8-9);
    record the attempt machine-readably either way so vs_baseline is
    auditable."""
    import shutil
    import subprocess

    runtime = shutil.which("docker") or shutil.which("podman")
    if runtime is None:
        return {
            "attempted": "docker run ghcr.io/helixdb/enterprise-dev:latest",
            "ok": False,
            "reason": (
                "no container runtime in this environment (docker and "
                "podman absent); the reference engine is only distributed "
                "as a container image"
            ),
        }
    image = "ghcr.io/helixdb/enterprise-dev:latest"
    try:
        pull = subprocess.run(
            [runtime, "pull", image], capture_output=True, timeout=600,
        )
    except Exception as exc:
        return {"attempted": f"{runtime} pull {image}", "ok": False,
                "reason": f"pull failed: {exc}"}
    if pull.returncode != 0:
        return {"attempted": f"{runtime} pull {image}", "ok": False,
                "reason": pull.stderr.decode()[-300:]}
    # image available: start it and measure a vector-search loop.  The
    # container is named so cleanup works even when `run -d` times out
    # AFTER the daemon started it (an anonymous id would be lost and
    # the detached container would squat on the port for every later
    # run); returncode is checked before treating stdout as an id.
    cname = "helix-bench-baseline"
    try:
        run = subprocess.run(
            [runtime, "run", "-d", "--name", cname,
             "-p", "18099:8080", image],
            capture_output=True, timeout=120,
        )
        if run.returncode != 0:
            return {"attempted": f"{runtime} run {image}", "ok": False,
                    "reason": run.stderr.decode()[-300:]}
        import urllib.request

        deadline = time.time() + 60
        ready = False
        while time.time() < deadline:
            try:
                urllib.request.urlopen("http://127.0.0.1:18099/v1/query",
                                       data=b"{}", timeout=2)
                ready = True
                break
            except Exception:
                time.sleep(0.5)
        return {"attempted": f"{runtime} run {image}", "ok": ready,
                "reason": "" if ready else "container never became ready"}
    except Exception as exc:
        return {"attempted": f"{runtime} run {image}", "ok": False,
                "reason": str(exc)}
    finally:
        # by-name removal also reaps a container whose `run -d` timed
        # out after the daemon had already started it; swallow cleanup
        # failures (a wedged daemon must not override the return value
        # and crash the bench after all measurements completed)
        try:
            subprocess.run([runtime, "rm", "-f", cname],
                           capture_output=True, timeout=60)
        except Exception:
            pass


def _gateway_bench(matrix, d: int, k: int,
                   metric: str = "cosine") -> dict:
    """End-to-end serving through the NATIVE GATEWAY: per-request HTTP
    over loopback, C++ body parse, batched device dispatch, C++ response
    formatting.  Also measures bulk HTTP ingest (ForEach AddN fast path).

    The serving engine reuses the already-built packed matrix (ingest
    throughput is measured separately below), so this isolates the
    serving stack the way production traffic sees it."""
    import subprocess

    try:
        from helix_tpu.native import load as _load_native

        _load_native()
    except Exception as exc:  # no toolchain: skip, keep the bench alive
        return {"e2e_gateway_qps": -1.0, "e2e_gateway_note": str(exc)}

    from helix_tpu.engine import Engine
    from helix_tpu.engine.vector import Partition
    from helix_tpu.server.native_gateway import NativeGateway

    engine = Engine(metric=metric, batch_window_ms=None)
    engine.execute({
        "request_type": "write", "query_name": None,
        "query": {"queries": [{"Query": {"name": "idx", "steps": [
            {"CreateIndex": {"spec": {"NodeVector": {
                "label": "Doc", "property": "emb", "tenant_property": None,
            }}, "if_not_exists": True}}], "condition": None}}],
            "returns": []},
        "parameters": {},
    })
    index = engine.vectors.indexes[("NodeVector", "Doc", "emb")]
    part = Partition(metric)
    # adopt the bench matrix directly: the device copy is already
    # resident, so the gateway measurement starts hot (ingest is
    # measured separately; the store is not consulted on the fast path)
    part.matrix = matrix
    part._ensure_capacity(matrix.n)
    part._ids[: matrix.n] = np.arange(1, matrix.n + 1, dtype=np.uint64)
    part._live[: matrix.n] = True
    part.n_rows = matrix.n
    part._n_live = matrix.n
    index.partitions[("",)] = part

    engine.load_bundle({
        "version": 5,
        "read_routes": {"vsearch": {"queries": [{"Query": {
            "name": "hits",
            "steps": [
                {"VectorSearchNodes": {
                    "label": "Doc", "property": "emb",
                    "query_vector": {"Expr": {"Param": "q"}},
                    "k": {"Expr": {"Param": "k"}},
                }},
                {"ValueMap": ["$id", "$distance"]},
            ], "condition": None}}], "returns": ["hits"]}},
        "read_parameters": {"vsearch": [
            {"name": "q", "ty": {"Array": "F32"}},
            {"name": "k", "ty": "I64"},
        ]},
        "write_routes": {}, "write_parameters": {},
    })

    gw = NativeGateway(engine, host="127.0.0.1", port=0)
    gw.start()
    out: dict = {}
    try:
        rng = np.random.default_rng(9)
        # Deterministic bucket warmup: the vbatch loop drains arbitrary
        # batch sizes, and search_packed_async buckets them to powers of
        # two — compile EVERY bucket up front, or fresh buckets compile
        # (seconds each over the tunnel) inside the measured window.
        for b in (1, 8, 16, 32, 64, 128, 256, 512, 1024):
            part.search_many(
                rng.normal(size=(b, d)).astype(np.float32), k
            )
        # The HTTP clients run in a SEPARATE PROCESS: an in-process
        # client shares the GIL with the server's parse/encode workers,
        # which throttles both sides and was measured to halve search
        # QPS and cut ingest ~5x.  `-S` skips site initialization so
        # this image's sitecustomize does not pre-import JAX into the
        # client (stdlib-only script).
        proc = subprocess.run(
            [sys.executable, "-S", "-c", _GATEWAY_CLIENT,
             str(gw.port), str(d), str(k)],
            capture_output=True, timeout=900, text=True,
        )
        if proc.returncode != 0:
            out["e2e_gateway_note"] = proc.stderr[-500:]
        # the client emits one JSON line per completed phase, so a
        # failure mid-run still reports the phases that finished
        client: dict = {}
        for line in proc.stdout.strip().splitlines():
            try:
                client.update(json.loads(line))
            except json.JSONDecodeError:
                continue
        stats = gw.stats()
        if "search_elapsed" in client:
            out["e2e_gateway_qps"] = round(
                client["search_total"] / client["search_elapsed"], 1
            )
            out["e2e_gateway_fast_path_requests"] = int(stats["fast_requests"])
        if "ingest_elapsed" in client:
            out["e2e_gateway_ingest_docs_s"] = round(
                client["ingest_docs"] / client["ingest_elapsed"], 1
            )
        if "lookup_elapsed" in client:
            out["e2e_gateway_lookup_qps"] = round(
                client["lookup_total"] / client["lookup_elapsed"], 1
            )
            out["e2e_gateway_lookup_requests"] = int(
                stats.get("lookup_requests", 0)
            )
        if "dyn_vs_elapsed" in client:
            out["e2e_gateway_dyn_vsearch_qps"] = round(
                client["dyn_vs_total"] / client["dyn_vs_elapsed"], 1
            )

        # -- serving-gap decomposition (round-4 verdict item 3) --------
        # Re-run the vector-search phase with the device dispatch
        # replaced by an instant fake: the measured rate then covers
        # C++ framing/parse + queue + Python batch assembly/dispatch +
        # C++ response formatting — everything EXCEPT device + tunnel.
        # total(real) - total(null) = device+tunnel per request; the
        # pure-C++ lookup rate above bounds the framing/format floor.
        from helix_tpu.engine.vector import Partition as _Part

        real_async = _Part.search_many_async
        ids_fake = np.arange(1, k + 1, dtype=np.uint64)

        def null_async(self, queries, kk):
            b = len(queries)
            res = (
                np.broadcast_to(ids_fake[:kk], (b, kk)).copy(),
                np.zeros((b, kk), np.float64),
            )
            return lambda: res

        _Part.search_many_async = null_async
        try:
            nproc = subprocess.run(
                [sys.executable, "-S", "-c", _VSEARCH_CLIENT,
                 str(gw.port), str(d), str(k)],
                capture_output=True, timeout=300, text=True,
            )
            nclient: dict = {}
            for line in nproc.stdout.strip().splitlines():
                try:
                    nclient.update(json.loads(line))
                except json.JSONDecodeError:
                    continue
            if "search_elapsed" in nclient:
                out["e2e_gateway_null_dispatch_qps"] = round(
                    nclient["search_total"] / nclient["search_elapsed"], 1
                )
        finally:
            _Part.search_many_async = real_async
        if (
            out.get("e2e_gateway_qps", 0) > 0
            and out.get("e2e_gateway_null_dispatch_qps", 0) > 0
        ):
            total_us = 1e6 / out["e2e_gateway_qps"]
            non_dev_us = 1e6 / out["e2e_gateway_null_dispatch_qps"]
            decomp = {
                "total_us_per_req": round(total_us, 2),
                "non_device_us_per_req": round(non_dev_us, 2),
                "device_plus_tunnel_us_per_req": round(
                    max(total_us - non_dev_us, 0.0), 2
                ),
            }
            if out.get("e2e_gateway_lookup_qps", 0) > 0:
                cxx_us = 1e6 / out["e2e_gateway_lookup_qps"]
                decomp["cxx_framing_floor_us_per_req"] = round(cxx_us, 2)
                decomp["python_dispatch_us_per_req"] = round(
                    max(non_dev_us - cxx_us, 0.0), 2
                )
            out["e2e_gateway_decomposition"] = decomp
    finally:
        gw.stop(close_engine=False)
    return out


# Vector-search-only client: the first phase of _GATEWAY_CLIENT as a
# standalone script, reused by the null-dispatch decomposition run.
_VSEARCH_CLIENT = r"""
import json, random, socket, sys, time

port, d, k = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
random.seed(17)

blobs = []
for _ in range(512):
    v = [random.gauss(0.0, 1.0) for _ in range(d)]
    norm = max(sum(x * x for x in v) ** 0.5, 1e-9)
    body = json.dumps({"q": [x / norm for x in v], "k": k}).encode()
    blobs.append(
        b"POST /v1/query/vsearch HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )


def run_pipelined(total, window=2048):
    s = socket.create_connection(("127.0.0.1", port), timeout=120)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    got = sent = 0
    tail = b""
    t0 = time.perf_counter()
    while got < total:
        while sent < total and sent - got < window:
            take = min(window - (sent - got), total - sent)
            s.sendall(b"".join(
                blobs[(sent + j) % 512] for j in range(take)
            ))
            sent += take
        chunk = tail + s.recv(1 << 20)
        got += chunk.count(b"HTTP/1.1 200")
        tail = chunk[-11:]
    elapsed = time.perf_counter() - t0
    s.close()
    return elapsed


def run_with_retry(total, attempts=2):
    last = None
    for _ in range(attempts):
        try:
            return run_pipelined(total)
        except (TimeoutError, OSError) as exc:
            last = exc
            time.sleep(2)
    raise last


run_with_retry(2048)  # warm
search_total = 20_000
search_elapsed = run_with_retry(search_total)
print(json.dumps({
    "search_total": search_total, "search_elapsed": search_elapsed,
}), flush=True)
"""


# stdlib-only HTTP load client (runs under ``python -S`` in its own
# process; see _gateway_bench for why)
_GATEWAY_CLIENT = r"""
import json, random, socket, sys, threading, time

port, d, k = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
random.seed(9)

blobs = []
for _ in range(512):
    v = [random.gauss(0.0, 1.0) for _ in range(d)]
    norm = max(sum(x * x for x in v) ** 0.5, 1e-9)
    body = json.dumps({"q": [x / norm for x in v], "k": k}).encode()
    blobs.append(
        b"POST /v1/query/vsearch HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )


def run_pipelined(total, window=2048):
    s = socket.create_connection(("127.0.0.1", port), timeout=120)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    got = sent = 0
    # carry the tail across recv() boundaries: TCP can split a status
    # line anywhere, and counting per-chunk misses a response whose
    # "HTTP/1.1 200" straddles two reads (the loop then waits on a
    # count that can never complete)
    tail = b""
    t0 = time.perf_counter()
    while got < total:
        while sent < total and sent - got < window:
            take = min(window - (sent - got), total - sent)
            s.sendall(b"".join(
                blobs[(sent + j) % 512] for j in range(take)
            ))
            sent += take
        chunk = tail + s.recv(1 << 20)
        got += chunk.count(b"HTTP/1.1 200")
        # len(pattern) - 1 bytes: long enough to complete a straddled
        # match next round, short enough to never hold a full match
        # (which the next count would double-count)
        tail = chunk[-11:]
    elapsed = time.perf_counter() - t0
    s.close()
    return elapsed


def run_with_retry(total, attempts=2):
    # the dev chip's runtime occasionally wedges a dispatch (tunnel
    # recovery); one fresh-connection retry distinguishes a transient
    # stall from a hung server
    last = None
    for _ in range(attempts):
        try:
            return run_pipelined(total)
        except (TimeoutError, OSError) as exc:
            last = exc
            time.sleep(2)
    raise last


run_with_retry(2048)  # warm the full gateway path
search_total = 20_000
search_elapsed = run_with_retry(search_total)
print(json.dumps({
    "search_total": search_total, "search_elapsed": search_elapsed,
}), flush=True)

# bulk HTTP ingest: ForEach AddN with vectors, 5 pipelined chunks
n_docs, chunks = 50_000, 5
reqs = []
for c in range(chunks):
    docs = [{"title": "b%d-%d" % (c, i),
             "emb": [random.gauss(0.0, 1.0) for _ in range(d)]}
            for i in range(n_docs // chunks)]
    body = json.dumps({
        "request_type": "write", "query_name": "ingest",
        "query": {"queries": [{"ForEach": {"param": "docs", "body": [
            {"Query": {"name": "dd", "steps": [{"AddN": {
                "label": "Ingest", "properties": [
                    ["title", {"Expr": {"Param": "docs.title"}}],
                    ["emb", {"Expr": {"Param": "docs.emb"}}],
                ]}}], "condition": None}}]}}], "returns": []},
        "parameters": {"docs": docs},
        "parameter_types": {"docs": {"Array": "Object"}},
    }).encode()
    reqs.append(
        b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )
s = socket.create_connection(("127.0.0.1", port), timeout=300)
t0 = time.perf_counter()


def send_all():
    for r in reqs:
        s.sendall(r)


sender = threading.Thread(target=send_all)
sender.start()
got, buf = 0, b""
while got < chunks:
    buf += s.recv(1 << 20)
    got = buf.count(b"HTTP/1.1 200")
sender.join()
ingest_elapsed = time.perf_counter() - t0
s.close()
print(json.dumps({
    "ingest_docs": n_docs, "ingest_elapsed": ingest_elapsed,
}), flush=True)

# dynamic point lookups over /v1/query (round 4: learned plan skeleton
# served from the C++ blob cache, no Python per request).  The ingest
# phase above created nodes with ids 1..n_docs.
blobs = []
for _ in range(512):
    ids = sorted(random.sample(range(1, n_docs + 1), 4))
    body = json.dumps({"request_type": "read", "query_name": "lk",
        "query": {"queries": [{"Query": {"name": "rows", "steps": [
            {"N": {"Param": "ids"}}, {"ValueMap": None}],
            "condition": None}}], "returns": ["rows"]},
        "parameters": {"ids": ids}}).encode()
    blobs.append(
        b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )
run_with_retry(4096)  # learn the skeleton + warm the blob cache
lookup_total = 50_000
lookup_elapsed = run_with_retry(lookup_total)
print(json.dumps({
    "lookup_total": lookup_total, "lookup_elapsed": lookup_elapsed,
}), flush=True)

# dynamic vector search over /v1/query (learned skeleton -> vbatch)
blobs = []
for _ in range(512):
    v = [random.gauss(0.0, 1.0) for _ in range(d)]
    norm = max(sum(x * x for x in v) ** 0.5, 1e-9)
    body = json.dumps({"request_type": "read", "query_name": "dvs",
        "query": {"queries": [{"Query": {"name": "hits", "steps": [
            {"VectorSearchNodes": {"label": "Doc", "property": "emb",
                "query_vector": {"Expr": {"Param": "q"}},
                "k": {"Expr": {"Param": "k"}}}},
            {"ValueMap": ["$id", "$distance"]}],
            "condition": None}}], "returns": ["hits"]},
        "parameters": {"q": [x / norm for x in v], "k": k},
        "parameter_types": {"q": {"Array": "F32"}, "k": "I64"}}).encode()
    blobs.append(
        b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )
run_with_retry(2048)
dyn_vs_total = 10_000
dyn_vs_elapsed = run_with_retry(dyn_vs_total)
print(json.dumps({
    "dyn_vs_total": dyn_vs_total, "dyn_vs_elapsed": dyn_vs_elapsed,
}), flush=True)
"""


def main() -> None:
    want_cpu = not _device_backend_alive()
    if want_cpu:
        print(
            "# accelerator backend missing or unresponsive; "
            "falling back to CPU", file=sys.stderr,
        )
    import jax

    if want_cpu:
        # The site preset overrides the JAX_PLATFORMS env var, so pin
        # the platform through the config API instead.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from helix_tpu.ops.distance import PackedMatrix, resident_topk_auto as topk_resident

    backend = jax.default_backend()
    n = int(os.environ.get("BENCH_N", 1_000_000 if backend == "tpu" else 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    rounds = int(
        os.environ.get("BENCH_ROUNDS", 128 if backend == "tpu" else 8)
    )
    k = 10

    n_batches = 8
    rng = np.random.default_rng(42)
    metric = os.environ.get("BENCH_METRIC", "cosine")
    # Real datasets (round-4 verdict item 5): BENCH_SIFT=<dir> (or
    # BENCH_DATASET=<dir>) loads a TEXMEX-layout corpus (SIFT1M/GIST1M
    # — BASELINE configs[0]/[4]).  Default cosine mode normalizes base
    # + queries and measures recall against an in-run brute-force
    # oracle (the published L2 ground truth does not survive
    # normalization); BENCH_METRIC=l2 serves the RAW vectors and uses
    # the published *_groundtruth.ivecs as the oracle when present.
    ds_dir = os.environ.get("BENCH_SIFT") or os.environ.get("BENCH_DATASET")
    provided_gt = None
    dataset_name = "synthetic"
    if ds_dir:
        print(f"# loading TEXMEX dataset from {ds_dir}...", file=sys.stderr)
        ds = _load_texmex(ds_dir)
        dataset_name = ds["name"]
        data = np.ascontiguousarray(ds["base"], np.float32)
        n, d = data.shape
        qraw = np.ascontiguousarray(ds["queries"], np.float32)
        if metric == "cosine":
            data = data / (np.linalg.norm(data, axis=1, keepdims=True) + 1e-9)
            qraw = qraw / (np.linalg.norm(qraw, axis=1, keepdims=True) + 1e-9)
        else:
            provided_gt = ds["groundtruth"]
        # cycle the published queries to fill batch * n_batches,
        # keeping row 0..len-1 aligned with the ground-truth rows
        reps = -(-(batch * n_batches) // len(qraw))
        all_queries = np.tile(qraw, (reps, 1))[: batch * n_batches]
    else:
        n_clusters = 1000
        centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
        # Optional dataset cache (BENCH_CACHE=<path.npy>): wide-dim
        # corpora take minutes of RNG on this 1-core box; caching lets a
        # re-run spend its time budget on the device measurement instead.
        cache = os.environ.get("BENCH_CACHE")
        if cache and os.path.exists(cache):
            # queries draw near the same centers either way, so a cached
            # dataset stays consistent with the in-run recall oracle
            print(f"# loading dataset cache {cache}...", file=sys.stderr)
            data = np.load(cache, mmap_mode="r")
            assert data.shape == (n, d), \
                f"cache shape {data.shape} != {(n, d)}"
        else:
            print(f"# generating {n}x{d} dataset...", file=sys.stderr)
            assign = rng.integers(0, n_clusters, size=n)
            data = centers[assign] + 0.3 * rng.normal(
                size=(n, d)
            ).astype(np.float32)
            data /= np.linalg.norm(data, axis=1, keepdims=True) + 1e-9
            if cache:
                np.save(cache, data)
                print(f"# cached dataset at {cache}", file=sys.stderr)

        all_queries = centers[
            rng.integers(0, n_clusters, size=batch * n_batches)
        ] + 0.3 * rng.normal(size=(batch * n_batches, d)).astype(np.float32)
        all_queries /= np.linalg.norm(
            all_queries, axis=1, keepdims=True
        ) + 1e-9

    print("# packing + uploading matrix...", file=sys.stderr)
    build_start = time.perf_counter()
    matrix = PackedMatrix(d, metric)
    matrix.extend(data)
    xs16, sq = matrix.device_arrays()
    xs32 = matrix.data_device()
    build_s = time.perf_counter() - build_start
    n_valid = jnp.int32(matrix.n)

    # Pad queries to the matrix layout (dims pad to multiples of 128).
    padded_queries = matrix.prepare_queries(all_queries)
    query_batches = [
        jax.device_put(padded_queries[i * batch:(i + 1) * batch])
        for i in range(n_batches)
    ]
    jax.block_until_ready(query_batches)

    print(f"# compiling + warmup on {backend}...", file=sys.stderr)
    dists, idx = topk_resident(
        xs16, xs32, query_batches[0], n_valid, sq, k=k, metric=metric
    )
    jax.block_until_ready((dists, idx))

    # Recall@10 oracle on a query sample: the published ground truth
    # when serving a real dataset raw (l2), else a float32 NumPy scan.
    sample = min(64, batch)
    if provided_gt is not None:
        oracle = provided_gt[:sample, :k]
    else:
        sims = all_queries[:sample] @ matrix.data[: matrix.n, :d].T
        if metric == "l2":
            d2 = (
                matrix.sq_norms[: matrix.n][None, :] - 2.0 * sims
                + np.sum(
                    all_queries[:sample] ** 2, axis=1, keepdims=True
                )
            )
            oracle = np.argsort(d2, axis=1)[:, :k]
        else:
            oracle = np.argsort(-sims, axis=1)[:, :k]
    got = np.asarray(idx)[:sample]
    recall = float(
        np.mean([len(set(got[i]) & set(oracle[i])) / k for i in range(sample)])
    )

    import functools

    print(f"# timing on-device throughput ({rounds} batches in one jit)...",
          file=sys.stderr)
    # Device throughput: scan over independent query batches inside ONE
    # jit — each step is a full search, no host dispatch in between.
    # This is what the chip sustains with the engine colocated
    # (production serving); the per-dispatch loop below shows what this
    # dev tunnel adds.  Every timed invocation scans a NEVER-REPEATED
    # device-generated stack and the per-invocation RPC is cancelled by
    # two-point differencing (benchmarks/roofline.py — the dev runtime
    # caches repeated dispatches, which once inflated a ladder rung 4x
    # past the HBM roofline).
    from benchmarks.roofline import roofline_batch_seconds, timed_scan_qps

    def scan_fn(qbatch, a16, a32, asq):
        dists, idx = topk_resident(
            a16, a32, qbatch, n_valid, asq, k=k, metric=metric
        )
        return idx

    device_qps, scan_diag = timed_scan_qps(
        scan_fn, batch=batch, d=d, dim_pad=matrix.dim_pad, rounds=rounds,
        operands=(xs16, xs32, sq),
    )
    per_batch_s = batch / device_qps
    device_elapsed = scan_diag["full_scan_s_median"]
    # Physical speed-of-light for this rung on the attached chip: the
    # bf16 matrix read vs MXU time, whichever dominates.  A measured
    # number above it is a runtime artifact; clamp and flag.
    n_pad_rows = int(xs16.shape[0])
    roofline_s = roofline_batch_seconds(
        bytes_read=n_pad_rows * matrix.dim_pad * 2,
        mxu_ops=2.0 * batch * n_pad_rows * matrix.dim_pad, dtype="bf16",
    )
    roofline_clamped = False
    if roofline_s is not None and per_batch_s < roofline_s:
        roofline_clamped = True
        measured_qps_raw = device_qps
        per_batch_s = roofline_s
        device_qps = batch / per_batch_s

    print("# timing serialized latency (lax.scan carry chain)...", file=sys.stderr)
    # Per-batch latency: rounds chained through a REAL data dependency
    # (a tiny perturbation of the next query by the previous result —
    # a zero-scaled carry would constant-fold and sever the chain),
    # strictly sequential on device.
    @functools.partial(jax.jit, static_argnames=("k",))
    def timed_rounds(xs16, xs32, qstack, n_valid, sq, k):
        def body(carry, qbatch):
            dists, idx = topk_resident(
                xs16, xs32, qbatch + carry, n_valid, sq, k=k,
                metric=metric,
            )
            return dists[0, 0] * jnp.float32(1e-12), (dists[0, 0], idx[0, 0])
        carry, outs = jax.lax.scan(body, jnp.float32(0.0), qstack)
        return outs

    qstack = jnp.stack([query_batches[r % n_batches] for r in range(rounds)])
    out = timed_rounds(xs16, xs32, qstack, n_valid, sq, k)  # compile
    jax.block_until_ready(out)
    lat_elapsed = 1e30
    for rep in range(3):
        # distinct perturbation per rep: a byte-identical re-dispatch
        # would be served from the runtime's dispatch cache
        start = time.perf_counter()
        out = timed_rounds(
            xs16, xs32, qstack + jnp.float32((rep + 1) * 1e-7),
            n_valid, sq, k,
        )
        jax.block_until_ready(out)
        lat_elapsed = min(lat_elapsed, time.perf_counter() - start)
    latency_ms = lat_elapsed / rounds * 1000

    print("# timing per-dispatch loop (tunnel overhead diagnostic)...",
          file=sys.stderr)
    # NOTE (round 4): on this dev tunnel block_until_ready reports
    # arrays ready before execution completes (BENCH_NOTES), so this
    # loop measures the DISPATCH SUBMISSION rate, not completed
    # throughput — emitted under that name.  Completed per-batch
    # throughput is the scan-derived headline; completed round trips
    # are e2e_tunnel_qps below.
    start = time.perf_counter()
    outs = []
    for r in range(rounds):
        dists, idx = topk_resident(
            xs16, xs32, query_batches[r % n_batches], n_valid, sq,
            k=k, metric=metric,
        )
        outs.append(idx)
    jax.block_until_ready(outs)
    dispatch_qps = rounds * batch / (time.perf_counter() - start)

    print("# timing end-to-end (per-batch tunnel round trip)...", file=sys.stderr)
    e2e_rounds = min(rounds, 8)
    start = time.perf_counter()
    for r in range(e2e_rounds):
        dists, idx = topk_resident(
            xs16, xs32,
            jax.device_put(
                padded_queries[(r % n_batches) * batch:(r % n_batches + 1) * batch]
            ),
            n_valid, sq, k=k, metric=metric,
        )
        np.asarray(idx)
    e2e_elapsed = time.perf_counter() - start
    e2e_qps = e2e_rounds * batch / e2e_elapsed

    # ---- BASELINE config[2]: 2-hop traversal with where_ filter --------
    print("# traversal + hybrid configs...", file=sys.stderr)
    import jax.numpy as jnp2

    from helix_tpu.ops.csr import PaddedGraph, hybrid_expand, khop_count

    deg = 16
    edge_dst = rng.integers(0, n, size=n * deg).astype(np.int32)
    indptr = np.arange(n + 1, dtype=np.int64) * deg
    edge_lab = rng.integers(0, 4, size=n * deg).astype(np.int32)
    padded = PaddedGraph.from_csr(indptr, edge_dst, edge_lab, n)
    keep = jnp2.asarray(rng.random(n) < 0.5)  # where_ predicate mask
    start_hosts = [rng.random(n) < 0.001 for _ in range(4)]
    starts = [jnp2.asarray(s) for s in start_hosts]
    # The padded-adjacency diagnostic needs ~3x the adjacency bytes in
    # HBM scratch; skip it at scales where that cannot fit next to the
    # resident matrix (the serving path below is native-CSR anyway).
    traversal_device_ms = -1.0
    # (also bounded by total HBM: the resident f32+bf16 matrix plus 3x
    # adjacency scratch must fit 16 GB)
    matrix_bytes = n * matrix.dim_pad * 6
    # XLA's scatter lowering wants several adjacency-sized temporaries
    # (measured: 10M nodes / 160M padded edges compiles to >8 GB of
    # scratch next to the 7.7 GB resident matrix).
    traversal_device_spread = None
    if padded.neighbors.size * 4 * 8 + matrix_bytes < 10 << 30:
        import functools as _ft

        # Scan-chained timing (round-4 verdict item 2): rounds chained
        # through a REAL data dependency inside ONE jit — the previous
        # count selects the next start mask — timed at R and R/2 and
        # differenced, which cancels the tunnel's per-invocation RPC
        # exactly (same methodology as the vector scans).  The old
        # dispatch-loop number measured up to 12.7 ms for a kernel whose
        # on-device time is sub-ms: it was dominated by per-dispatch
        # RPC + the early-ready submission artifact (BENCH_NOTES).
        @_ft.partial(jax.jit, static_argnames=("hops", "rounds"))
        def chained_khop(neighbors, labels, start_pairs, keep, rep, hops,
                         rounds):
            # the per-rep distinct bit flips ON DEVICE (rep scalar):
            # uploading a freshly-XORed 32 MB mask stack per rep put the
            # whole H2D transfer inside the timed window and inflated
            # the round-5 reading to 45 ms for a ~4 ms kernel (the
            # upload is NOT differenced out — only the full chain
            # depends on the in-flight transfer)
            iota = jnp2.arange(neighbors.shape[0], dtype=jnp2.int32)
            def body(carry, pair):
                s = jnp2.where((carry % 2) == 0, pair[0], pair[1])
                s = s ^ (iota == (rep + carry))
                c = khop_count(neighbors, labels, s, jnp2.int32(1),
                               hops, keep)
                return c.astype(jnp2.int32), c
            _, outs = jax.lax.scan(
                body, jnp2.int32(0), start_pairs[:rounds])
            return outs

        t_rounds = 16
        pairs_host = np.stack([
            np.stack([start_hosts[r % 4], start_hosts[(r + 1) % 4]])
            for r in range(t_rounds)
        ])
        pairs = jnp2.asarray(pairs_host)
        jax.block_until_ready(pairs)  # resident before any timed window
        args2 = (padded.neighbors, padded.edge_labels, keep)
        # compile both lengths, then difference full vs half
        jax.block_until_ready(chained_khop(
            args2[0], args2[1], pairs, args2[2], jnp2.int32(0),
            hops=2, rounds=t_rounds))
        jax.block_until_ready(chained_khop(
            args2[0], args2[1], pairs, args2[2], jnp2.int32(0),
            hops=2, rounds=t_rounds // 2))

        def _device_2hop():
            # distinct rep scalar per rep: byte-identical re-dispatches
            # would be served from the runtime's dispatch cache
            _device_2hop.rep += 1
            rep = jnp2.int32(_device_2hop.rep)
            t0 = time.perf_counter()
            full = chained_khop(args2[0], args2[1], pairs, args2[2], rep,
                                hops=2, rounds=t_rounds)
            jax.block_until_ready(full)
            t_full = time.perf_counter() - t0
            t0 = time.perf_counter()
            half = chained_khop(args2[0], args2[1], pairs, args2[2], rep,
                                hops=2, rounds=t_rounds // 2)
            jax.block_until_ready(half)
            t_half = time.perf_counter() - t0
            return max(t_full - t_half, 0.0) / (t_rounds // 2) * 1000

        _device_2hop.rep = 0
        traversal_device_spread = _median_spread(_device_2hop)
        traversal_device_ms = traversal_device_spread["median"]

    # The serving path (engine traversal planner) runs the native
    # multithreaded CSR sweep (native/bfs.cpp); the device kernel above
    # remains the multi-chip fallback.
    from helix_tpu.native import bfs_khop

    keep_host = np.asarray(keep, np.uint8)
    start_u8 = [s.astype(np.uint8) for s in start_hosts]

    def _native_2hop():
        t0 = time.perf_counter()
        for r in range(8):
            fmask, _ = bfs_khop(
                indptr, edge_dst, edge_lab, start_u8[r % 4], 1, 2,
            )
            int((fmask & keep_host).sum())
        return (time.perf_counter() - t0) / 8 * 1000

    traversal_spread = _median_spread(_native_2hop)
    traversal_ms = traversal_spread["median"]

    # ---- BASELINE config[3]: hybrid vector seed -> graph expansion -----
    seed_pads = []
    for r in range(4):
        _, idx = topk_resident(
            xs16, xs32, query_batches[r], n_valid, sq, k=k, metric=metric
        )
        seed_pads.append(idx[0].astype(jnp2.int32))
    hybrid_device_ms = -1.0
    hybrid_device_spread = None
    if padded.neighbors.size * 4 * 8 + matrix_bytes < 10 << 30:
        import functools as _ft

        # Same scan-chained differencing as the 2-hop above: search ->
        # expand per round inside one jit, the count perturbing the next
        # round's queries (real dependency), full-vs-half differenced.
        @_ft.partial(jax.jit, static_argnames=("k",))
        def chained_hybrid(a16, a32, asq, nv, neighbors, labels, keep,
                           qstack, k):
            def body(carry, qbatch):
                _, idx = topk_resident(
                    a16, a32, qbatch + carry, nv, asq, k=k,
                    metric=metric,
                )
                mask, cnt = hybrid_expand(
                    neighbors, labels, idx[0].astype(jnp2.int32),
                    jnp2.int32(-1), 1, keep,
                )
                return cnt.astype(jnp2.float32) * jnp2.float32(1e-12), cnt
            _, outs = jax.lax.scan(body, jnp2.float32(0.0), qstack)
            return outs

        h_rounds = 16
        hstack = jnp2.stack([
            query_batches[r % n_batches] for r in range(h_rounds)
        ])
        hargs = (xs16, xs32, sq, n_valid, padded.neighbors,
                 padded.edge_labels, keep)
        jax.block_until_ready(chained_hybrid(*hargs, hstack, k))
        jax.block_until_ready(
            chained_hybrid(*hargs, hstack[: h_rounds // 2], k)
        )

        def _device_hybrid():
            _device_hybrid.rep += 1
            qs2 = hstack + jnp2.float32(_device_hybrid.rep * 1e-7)
            t0 = time.perf_counter()
            jax.block_until_ready(chained_hybrid(*hargs, qs2, k))
            t_full = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(
                chained_hybrid(*hargs, qs2[: h_rounds // 2], k)
            )
            t_half = time.perf_counter() - t0
            return max(t_full - t_half, 0.0) / (h_rounds // 2) * 1000

        _device_hybrid.rep = 0
        hybrid_device_spread = _median_spread(_device_hybrid)
        hybrid_device_ms = hybrid_device_spread["median"]

    # Serving-path hybrid: fused device search for the seeds (rides the
    # dynamic batcher, so its cost is the amortized per-batch device
    # time measured above) + native CSR sweep for the expansion.  The
    # naive dispatch-per-query loop would only re-measure the dev
    # tunnel's RPC.
    seed_sets = []
    for r in range(4):
        seed_slots = np.asarray(seed_pads[r])
        seeds = np.zeros(n, np.uint8)
        seeds[seed_slots[(seed_slots >= 0) & (seed_slots < n)]] = 1
        seed_sets.append(seeds)
    def _native_hybrid_sweep():
        t0 = time.perf_counter()
        for r in range(8):
            fmask, _ = bfs_khop(
                indptr, edge_dst, edge_lab, seed_sets[r % 4], -1, 1
            )
            int((fmask & keep_host).sum())
        return (time.perf_counter() - t0) / 8 * 1000

    hybrid_sweep_spread = _median_spread(_native_hybrid_sweep)
    hybrid_ms = hybrid_sweep_spread["median"] + per_batch_s * 1000

    if os.environ.get("BENCH_SKIP_GATEWAY") == "1":
        gateway_metrics = {}  # loader/kernel smokes; CI-speed runs
    else:
        print("# e2e serving through the native gateway...",
              file=sys.stderr)
        gateway_metrics = _gateway_bench(matrix, d, k, metric)

    print("# measuring CPU HNSW baseline (reference-class, m=16/efc=128)...",
          file=sys.stderr)
    # the baseline's ef ladder tunes on the same 64-query oracle sample
    # as the device recall gate (recomputing the identical argsort as a
    # separate "oracle_full" burned seconds and implied more coverage
    # than it had; 64 queries bounds recall granularity at 1/640)
    if metric == "cosine":
        baseline = _cpu_hnsw_baseline(
            np.asarray(data), all_queries, oracle,
            cache_tag="" if dataset_name == "synthetic" else dataset_name,
        )
    else:
        # the CPU HNSW baseline tool is cosine-only (pre-normalized
        # corpus, distance = 1 - dot); an l2 run reports the gap
        # explicitly instead of comparing across metrics
        baseline = {"qps": ASSUMED_CPU_HNSW_QPS, "source": "assumed",
                    "note": "cosine-only baseline tool; l2 run"}

    result = {
        "metric": (
            f"vector search QPS/chip (N={n}, d={d}, k=10, exact+rerank, "
            f"recall@10={recall:.4f}, dataset={dataset_name}, "
            f"distance={metric})"
        ),
        "dataset": dataset_name,
        "distance_metric": metric,
        **({"oracle": "published_groundtruth"} if provided_gt is not None
           else {}),
        "value": round(device_qps, 1),
        "unit": "QPS",
        "vs_baseline": round(device_qps / baseline["qps"], 2),
        "baseline_cpu_hnsw": baseline,
        "recall_at_10": round(recall, 4),
        "backend": backend,
        "batch": batch,
        "device_batch_ms": round(per_batch_s * 1000, 3),
        "device_batch_ms_incl_rpc": round(device_elapsed / rounds * 1000, 3),
        **({"roofline_qps": round(batch / roofline_s, 1)}
           if roofline_s is not None else {}),
        **({"measured_qps_raw": round(measured_qps_raw, 1),
            "clamped_to_roofline": True} if roofline_clamped else {}),
        "scan_timing": scan_diag,
        "serialized_latency_ms": round(latency_ms, 3),
        "dispatch_submission_qps": round(dispatch_qps, 1),
        "e2e_tunnel_qps": round(e2e_qps, 1),
        "build_upload_s": round(build_s, 2),
        "traversal_2hop_ms": round(traversal_ms, 3),
        "traversal_2hop_spread": traversal_spread,
        "traversal_2hop_device_ms": round(traversal_device_ms, 3),
        "traversal_2hop_device_spread": traversal_device_spread,
        "hybrid_seed_expand_ms": round(hybrid_ms, 3),
        "hybrid_seed_expand_sweep_spread": hybrid_sweep_spread,
        "hybrid_seed_expand_device_ms": round(hybrid_device_ms, 3),
        "hybrid_seed_expand_device_spread": hybrid_device_spread,
        **gateway_metrics,
        "baseline_attempt": _reference_baseline_attempt(),
    }
    assert recall >= 0.95, f"recall gate failed: {recall}"
    print(json.dumps(result))


if __name__ == "__main__":
    if "--ladder" in sys.argv:
        # Residency-ladder artifact (round-4 verdict item 7): every
        # serving rung measured from one entry point on one corpus.
        sys.argv.remove("--ladder")
        from benchmarks.ladder import main as ladder_main

        ladder_main()
    else:
        main()

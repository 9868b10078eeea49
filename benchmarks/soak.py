"""Serving soak: mixed vector-search + ingest load through the native
gateway, tracking throughput, latency percentiles, and RSS stability.

A production-serving check, not a peak-throughput benchmark: the search
client runs closed-loop (one outstanding request per connection, the
latency-honest regime) while a second connection periodically bulk-
ingests; RSS is sampled before/during/after to catch leaks in the C++
gateway, the parse path, or the engine's write path.

Run:  python benchmarks/soak.py [--seconds 180] [--n 200000]
Prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def rss_mb(pid: int) -> float:
    with open(f"/proc/{pid}/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


_CLIENT = r"""
import json, random, socket, sys, time

port, d, k, seconds = (int(sys.argv[1]), int(sys.argv[2]),
                       int(sys.argv[3]), float(sys.argv[4]))
random.seed(17)

def blob():
    v = [random.gauss(0.0, 1.0) for _ in range(d)]
    norm = max(sum(x * x for x in v) ** 0.5, 1e-9)
    body = json.dumps({"q": [x / norm for x in v], "k": k}).encode()
    return (b"POST /v1/query/vsearch HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body)

blobs = [blob() for _ in range(256)]

def read_response(s, buf):
    while True:
        split = buf.find(b"\r\n\r\n")
        if split >= 0:
            headers = buf[:split].decode("latin-1")
            length = int(headers.lower().split("content-length:")[1]
                         .split("\r\n")[0])
            if len(buf) >= split + 4 + length:
                return buf[split + 4 + length:]
        chunk = s.recv(1 << 16)
        if not chunk:
            raise ConnectionError("closed")
        buf += chunk

# closed-loop search client: latency-honest (one in flight)
s = socket.create_connection(("127.0.0.1", port), timeout=60)
s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
lat = []
end = time.perf_counter() + seconds
i = 0
buf = b""
while time.perf_counter() < end:
    t0 = time.perf_counter()
    s.sendall(blobs[i % 256])
    buf = read_response(s, buf)
    lat.append(time.perf_counter() - t0)
    i += 1
s.close()
lat.sort()
n = len(lat)
print(json.dumps({
    "search_requests": n,
    "search_qps": round(n / seconds, 1),
    "p50_ms": round(lat[n // 2] * 1000, 2),
    "p99_ms": round(lat[int(n * 0.99)] * 1000, 2),
    "max_ms": round(lat[-1] * 1000, 2),
}), flush=True)
"""

_INGEST_CLIENT = r"""
import json, random, socket, sys, time

port, d, seconds = int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3])
random.seed(23)
end = time.perf_counter() + seconds
total = 0
s = socket.create_connection(("127.0.0.1", port), timeout=120)
buf = b""
while time.perf_counter() < end:
    docs = [{"t": "s-%d" % i,
             "emb": [random.gauss(0.0, 1.0) for _ in range(d)]}
            for i in range(2000)]
    body = json.dumps({
        "request_type": "write", "query_name": "soak-ingest",
        "query": {"queries": [{"ForEach": {"param": "docs", "body": [
            {"Query": {"name": "dd", "steps": [{"AddN": {
                "label": "SoakDoc", "properties": [
                    ["t", {"Expr": {"Param": "docs.t"}}],
                    ["emb", {"Expr": {"Param": "docs.emb"}}],
                ]}}], "condition": None}}]}}], "returns": []},
        "parameters": {"docs": docs},
        "parameter_types": {"docs": {"Array": "Object"}},
    }).encode()
    s.sendall(b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
              b"Content-Length: %d\r\n\r\n" % len(body) + body)
    # wait for the response before the next wave (closed loop)
    while b"\r\n\r\n" not in buf or b"HTTP/1.1" not in buf:
        buf += s.recv(1 << 16)
    buf = b""
    total += 2000
    time.sleep(0.5)
s.close()
print(json.dumps({"ingested_docs": total}), flush=True)
"""


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=180.0)
    parser.add_argument("--n", type=int, default=200_000)
    parser.add_argument("--d", type=int, default=128)
    parser.add_argument("--k", type=int, default=10)
    args = parser.parse_args()

    import os

    from helix_tpu.engine import Engine
    from helix_tpu.engine.vector import Partition
    from helix_tpu.native import load as load_native
    from helix_tpu.ops.distance import PackedMatrix
    from helix_tpu.server.native_gateway import NativeGateway

    load_native()
    rng = np.random.default_rng(5)
    data = rng.normal(size=(args.n, args.d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    matrix = PackedMatrix(args.d, "cosine")
    matrix.extend(data)

    engine = Engine(metric="cosine", batch_window_ms=None)
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
    part = Partition("cosine")
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
    try:
        # warm every padded batch-size bucket the soak can hit
        for b in (1, 8):
            part.search_many(
                rng.normal(size=(b, args.d)).astype(np.float32), args.k
            )
        rss_start = rss_mb(os.getpid())
        searcher = subprocess.Popen(
            [sys.executable, "-S", "-c", _CLIENT, str(gw.port),
             str(args.d), str(args.k), str(args.seconds)],
            stdout=subprocess.PIPE, text=True,
        )
        ingester = subprocess.Popen(
            [sys.executable, "-S", "-c", _INGEST_CLIENT, str(gw.port),
             str(args.d), str(args.seconds)],
            stdout=subprocess.PIPE, text=True,
        )
        samples = []
        deadline = time.time() + args.seconds
        while time.time() < deadline:
            time.sleep(5)
            samples.append(rss_mb(os.getpid()))
        search_out = json.loads(searcher.communicate(timeout=120)[0]
                                .strip().splitlines()[-1])
        ingest_out = json.loads(ingester.communicate(timeout=120)[0]
                                .strip().splitlines()[-1])
        # settle + one idle GC tick, then final RSS
        time.sleep(6)
        rss_end = rss_mb(os.getpid())
        print(json.dumps({
            **search_out, **ingest_out,
            "seconds": args.seconds,
            "rss_start_mb": round(rss_start, 1),
            "rss_peak_mb": round(max(samples), 1),
            "rss_end_mb": round(rss_end, 1),
            "nodes_final": engine.store.node_count(),
        }))
    finally:
        gw.stop(close_engine=False)


if __name__ == "__main__":
    main()

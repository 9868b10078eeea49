"""Crash-torture: kill -9 a disk-mode server MID-ingest, repeatedly.

The durability contract (reference ``lib.rs:292-298``: writes ack after
the durable append when ``x-helix-await-durable`` is on): every write
the server ACKNOWLEDGED must survive a SIGKILL with no checkpoint; an
unacknowledged in-flight write may or may not (the client got no
answer).  Unlike ``test_cli.test_crash_recovery_kill9`` (kill after a
quiet sequential burst), this kills while the write stream is in
flight, across several crash cycles, and finally checks that a replica
converges with the recovered primary — the ring-epoch reseed path under
real process death.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import pytest

from helix_tpu.dsl import DynamicQueryRequest, g, read_batch, write_batch


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _post(port: int, req: dict, timeout: float = 10.0) -> dict:
    data = json.dumps(req).encode()
    resp = urllib.request.urlopen(
        urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/query", data=data,
            headers={"content-type": "application/json"},
        ),
        timeout=timeout,
    )
    return json.loads(resp.read())


def _wait_ready(port: int, deadline_s: float = 30.0) -> None:
    end = time.time() + deadline_s
    while time.time() < end:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/health", timeout=2
            )
            return
        except (urllib.error.URLError, OSError):
            time.sleep(0.1)
    raise TimeoutError(f"server on {port} never became ready")


def _spawn_server(port: int, data_dir: str) -> subprocess.Popen:
    code = (
        "from helix_tpu.server.http_server import serve;"
        f"serve(host='127.0.0.1', port={port}, data_dir={data_dir!r})"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env,
    )
    _wait_ready(port)
    return proc


def _kill9(proc: subprocess.Popen) -> None:
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=10)


@pytest.mark.slow
def test_sigkill_mid_ingest_loses_no_acked_write(tmp_path):
    port = _free_port()
    data_dir = str(tmp_path / "data")
    acked: list[int] = []
    sent = [0]

    def writer(stop: threading.Event) -> None:
        while not stop.is_set():
            i = sent[0]
            sent[0] += 1
            req = DynamicQueryRequest.write(
                write_batch().var_as(
                    "u", g().add_n("Doc", {"i": i})
                )
            ).encode()
            try:
                _post(port, req)
            except Exception:
                return  # server died mid-request: this write is unacked
            acked.append(i)

    for cycle in range(3):
        proc = _spawn_server(port, data_dir)
        stop = threading.Event()
        t = threading.Thread(target=writer, args=(stop,))
        t.start()
        time.sleep(1.2)  # let the stream run, then yank the process
        _kill9(proc)
        stop.set()
        t.join(timeout=15)
        assert not t.is_alive()

    # Recover and audit: every acknowledged i must be present.
    proc = _spawn_server(port, data_dir)
    try:
        out = _post(port, DynamicQueryRequest.read(
            read_batch().var_as(
                "ids", g().n_with_label("Doc").values(["i"])
            )
        ).encode(), timeout=30)
        present = set(out["ids"])
        missing = [i for i in acked if i not in present]
        assert not missing, (
            f"acknowledged writes lost after kill -9: {missing[:10]} "
            f"({len(missing)} of {len(acked)} acked)"
        )
        # and nothing fabricated: present ⊆ sent
        assert present <= set(range(sent[0]))
        assert len(acked) > 20, "torture too short to mean anything"

        # A replica seeded from the thrice-crashed primary must converge
        # (epoch rolls forced reseeds; sequence spaces never collide).
        from helix_tpu.server.http_server import HelixHTTPServer

        rport = _free_port()
        replica = HelixHTTPServer(
            host="127.0.0.1", port=rport,
            replica_of=f"http://127.0.0.1:{port}",
        )
        replica.start()
        try:
            want = len(present)
            deadline = time.time() + 20
            got = -1
            while time.time() < deadline:
                got = _post(rport, DynamicQueryRequest.read(
                    read_batch().var_as(
                        "n", g().n_with_label("Doc").count()
                    )
                ).encode())["n"]
                if got == want:
                    break
                time.sleep(0.2)
            assert got == want, (
                f"replica stuck at {got}/{want}; "
                f"last_error={replica.follower.last_error if replica.follower else None}"
            )
        finally:
            replica.stop()
            replica.engine.close()
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.slow
def test_sigkill_mid_bulk_ingest_replays_big_records(tmp_path):
    """Bulk ForEach chunks write multi-hundred-KB WAL records; a kill -9
    mid-stream must replay every acknowledged chunk through the native
    codec's fast-array path (vectors land as typed arrays)."""
    port = _free_port()
    data_dir = str(tmp_path / "data")
    proc = _spawn_server(port, data_dir)

    batch = write_batch().for_each_param(
        "docs",
        write_batch().var_as("d", g().add_n("Doc", [
            ("i", {"Expr": {"Param": "docs.i"}}),
            ("v", {"Expr": {"Param": "docs.v"}}),
        ])),
    )
    import numpy as np

    rng = np.random.default_rng(0)
    acked_chunks = []
    try:
        idx_req = DynamicQueryRequest.write(
            write_batch().var_as("ix", g().create_vector_index_nodes("Doc", "v"))
        ).encode()
        _post(port, idx_req)
        stop = threading.Event()

        def writer():
            base = 0
            while not stop.is_set():
                docs = [
                    {"i": base + j, "v": rng.normal(size=32).tolist()}
                    for j in range(500)
                ]
                req = DynamicQueryRequest(
                    "write", batch, parameters={"docs": docs},
                    parameter_types={"docs": {"Array": "Object"}},
                ).encode()
                try:
                    _post(port, req, timeout=30)
                except Exception:
                    return
                acked_chunks.append((base, base + 500))
                base += 500

        t = threading.Thread(target=writer)
        t.start()
        time.sleep(2.0)
        _kill9(proc)
        stop.set()
        t.join(timeout=30)

        proc = _spawn_server(port, data_dir)
        out = _post(port, DynamicQueryRequest.read(
            read_batch().var_as("ids", g().n_with_label("Doc").values(["i"]))
        ).encode(), timeout=60)
        present = set(out["ids"])
        for lo, hi in acked_chunks:
            missing = [i for i in range(lo, hi) if i not in present]
            assert not missing, f"acked chunk [{lo},{hi}) lost {missing[:5]}"
        assert len(acked_chunks) >= 2, "torture too short"
        # vector search still works over the replayed rows
        out = _post(port, DynamicQueryRequest.read(
            read_batch().var_as(
                "h", g().vector_search_nodes(
                    "Doc", "v", rng.normal(size=32).tolist(), 3
                ).value_map(["i"])
            )
        ).encode(), timeout=60)
        assert len(out["h"]) == 3
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()

"""Telemetry pipeline + per-step tracing tests."""

import json

from helix_tpu.dsl import g, read_batch, write_batch
from helix_tpu.engine import Engine
from helix_tpu.telemetry import Telemetry


def test_events_flush_to_sink(tmp_path):
    sink = tmp_path / "metrics.jsonl"
    tel = Telemetry(sink, level="full")
    tel.log_event("install", version="0.1.0")
    tel.query_event(True, "find_users", "read", 1234)
    tel.close()
    events = [json.loads(line) for line in sink.read_text().splitlines()]
    assert events[0]["event"] == "install"
    assert events[1] == {
        "event": "query_success",
        "ts_ms": events[1]["ts_ms"],
        "seq": events[1]["seq"],
        "query_name": "find_users",
        "request_type": "read",
        "time_taken_usec": 1234,
    }


def test_basic_level_filters_noise(tmp_path):
    sink = tmp_path / "metrics.jsonl"
    tel = Telemetry(sink, level="basic")
    tel.log_event("query_success", query_name="q")  # full-only
    tel.log_event("query_error", query_name="q")    # basic
    tel.close()
    events = [json.loads(line) for line in sink.read_text().splitlines()]
    assert [e["event"] for e in events] == ["query_error"]


def test_off_level_writes_nothing(tmp_path):
    sink = tmp_path / "metrics.jsonl"
    tel = Telemetry(sink, level="off")
    tel.log_event("install")
    tel.close()
    assert not sink.exists()


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("HELIX_TPU_METRICS", "off")
    tel = Telemetry(tmp_path / "m.jsonl")
    assert tel.level == "off"


def test_engine_emits_query_events(tmp_path):
    engine = Engine()
    engine.telemetry = Telemetry(tmp_path / "m.jsonl", level="full")
    engine.execute({
        "request_type": "read",
        "query_name": "probe",
        "query": read_batch().var_as("n", g().n().count()).encode(),
    })
    try:
        engine.execute({"request_type": "read", "query": {"queries": ["Bogus"], "returns": []}})
    except Exception:
        pass
    engine.telemetry.close()
    events = [json.loads(line) for line in (tmp_path / "m.jsonl").read_text().splitlines()]
    kinds = [e["event"] for e in events]
    assert "query_success" in kinds and "query_error" in kinds
    ok = next(e for e in events if e["event"] == "query_success")
    assert ok["query_name"] == "probe" and ok["time_taken_usec"] >= 0


def test_trace_surfaces_per_step_timings():
    engine = Engine()
    engine.execute({
        "request_type": "write",
        "query_name": None,
        "query": write_batch().var_as("u", g().add_n("User", {"name": "x"})).encode(),
    })
    out = engine.execute(
        {
            "request_type": "read",
            "query_name": "traced",
            "query": read_batch()
            .var_as("n", g().n_with_label("User").dedup().count())
            .encode(),
        },
        trace=True,
    )
    assert out["n"] == 1
    trace = out["$trace"]
    assert trace["query_name"] == "traced"
    assert [s["step"] for s in trace["steps"]] == ["NWhere", "Dedup", "Count"]
    assert all(s["us"] >= 0 for s in trace["steps"])
    assert trace["steps"][-1]["rows"] == 1


def test_sse_event_stream(tmp_path):
    """GET /v1/events streams telemetry as SSE (deploy + query events)."""
    import http.client
    import threading

    from helix_tpu.server import HelixHTTPServer

    srv = HelixHTTPServer(host="127.0.0.1", port=0)
    srv.engine.telemetry = Telemetry(tmp_path / "m.jsonl", level="full")
    srv.start()
    try:
        received = []

        def consume():
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
            conn.request("GET", "/v1/events?after=-1")
            resp = conn.getresponse()
            assert resp.headers["Content-Type"] == "text/event-stream"
            while len(received) < 2:
                line = resp.fp.readline()
                if line.startswith(b"data: "):
                    received.append(json.loads(line[6:]))
            conn.close()

        consumer = threading.Thread(target=consume, daemon=True)
        consumer.start()

        from helix_tpu.client import Client
        from helix_tpu.dsl import g as _g, read_batch as _rb

        client = Client(f"http://127.0.0.1:{srv.port}")
        client.execute({
            "request_type": "read", "query_name": "probe",
            "query": _rb().var_as("n", _g().n().count()).encode(),
        })
        client.execute({
            "request_type": "read", "query_name": "probe2",
            "query": _rb().var_as("n", _g().n().count()).encode(),
        })
        consumer.join(timeout=10)
        assert not consumer.is_alive(), "SSE consumer never got 2 events"
        kinds = [e["event"] for e in received]
        assert all(k == "query_success" for k in kinds)
        assert received[0]["seq"] < received[1]["seq"]
    finally:
        srv.stop()

"""Native epoll gateway: wire behavior, fast-path equivalence, pipelining.

The gateway must be byte-compatible with the Python fallback server on
every route, and the C++ vector fast path must return payloads equal
(as JSON values) to the interpreter's slow path for the same stored
query.
"""

import json
import socket
import threading
import time

import numpy as np
import pytest

from helix_tpu.client import Client, HelixError
from helix_tpu.dsl import (
    Expr, define_params, define_queries, g, param, read_batch,
    register_read, write_batch,
)
from helix_tpu.engine import Engine

pytest.importorskip("helix_tpu.native")
from helix_tpu.native import NativeBuildError, load

try:
    load()
except NativeBuildError:  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from helix_tpu.server.native_gateway import NativeGateway

DIM = 8


def _seed_engine(metric="cosine") -> Engine:
    engine = Engine(metric=metric)
    wb = write_batch().var_as(
        "idx", g().create_vector_index_nodes("Doc", "emb")
    )
    rng = np.random.default_rng(3)
    for i in range(64):
        vec = rng.normal(size=DIM)
        vec /= np.linalg.norm(vec)
        wb = wb.var_as(
            f"d{i}",
            g().add_n("Doc", {"emb": [float(x) for x in vec], "title": f"t{i}"}),
        )
    engine.execute(json.loads(wb.to_dynamic_request().to_json_string()))
    return engine


def _bundle():
    p = define_params({"q": param.array(param.f32()), "k": param.i64()})
    return define_queries({
        "read": {
            "vsearch": register_read(
                lambda pp: read_batch().var_as(
                    "hits",
                    g().vector_search_nodes("Doc", "emb", Expr.param("q"), Expr.param("k"))
                       .value_map(["$id", "$distance"]),
                ).returning(["hits"]),
                p,
            ),
        },
    }).build_query_bundle()


@pytest.fixture()
def gateway():
    engine = _seed_engine()
    gw = NativeGateway(engine, host="127.0.0.1", port=0)
    gw.start()
    gw.engine.load_bundle(_bundle())
    gw.on_bundle_loaded()
    yield gw
    gw.stop()


@pytest.fixture()
def client(gateway):
    return Client(f"http://127.0.0.1:{gateway.port}")


def _query_vec(seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=DIM)
    return [float(x) for x in (v / np.linalg.norm(v))]


def test_health(client):
    out = client.health()
    assert out["status"] == "ok"
    assert out["nodes"] == 64


def test_dynamic_read_write(client):
    req = (
        write_batch()
        .var_as("u", g().add_n("User", {"name": "ada"}))
        .returning(["u"])
        .to_dynamic_request()
    )
    out = client.query().dynamic(req).send()
    assert out["u"][0]["name"] == "ada"
    req = (
        read_batch()
        .var_as("n", g().n_with_label("User").count())
        .returning(["n"])
        .to_dynamic_request()
    )
    assert client.query().dynamic(req).send() == {"n": 1}


def test_fast_path_equals_slow_path(gateway, client):
    """The C++-formatted fast response must be JSON-equal to the
    interpreter's for the same stored query."""
    for seed in range(8):
        vec = _query_vec(seed)
        fast = client.call("vsearch", {"q": vec, "k": 5})
        slow = gateway.engine.execute_stored("vsearch", {"q": vec, "k": 5})
        assert fast == slow
        assert len(fast["hits"]) == 5
        dists = [h["$distance"] for h in fast["hits"]]
        assert dists == sorted(dists)
    stats = gateway.stats()
    assert stats["fast_requests"] >= 8


def test_fast_path_respects_live_writes(gateway, client):
    vec = [1.0] + [0.0] * (DIM - 1)
    before = client.call("vsearch", {"q": vec, "k": 3})
    wb = write_batch().var_as(
        "d", g().add_n("Doc", {"emb": vec, "title": "exact"})
    ).returning(["d"])
    out = client.query().dynamic(wb.to_dynamic_request()).send()
    new_id = out["d"][0]["$id"]
    after = client.call("vsearch", {"q": vec, "k": 3})
    assert after["hits"][0]["$id"] == new_id
    assert after["hits"][0]["$distance"] == pytest.approx(0.0, abs=1e-5)
    assert before["hits"][0]["$id"] != new_id


def test_malformed_fast_body_falls_back(gateway, client):
    # wrong arity -> C++ declines; interpreter reports dimension error
    with pytest.raises(HelixError):
        client.call("vsearch", {"q": [1.0, 2.0], "k": 3})
    # unknown key -> C++ declines -> general path; interpreter ignores the
    # extra param, so both paths agree on the payload
    vec = _query_vec()
    out = client.call("vsearch", {"q": vec, "k": 3, "bogus": 1})
    assert out == gateway.engine.execute_stored("vsearch", {"q": vec, "k": 3})


def test_auth(gateway):
    engine = gateway.engine
    gw = NativeGateway(engine, host="127.0.0.1", port=0, api_key="sekret")
    gw2_started = False
    try:
        gw.start()
        gw2_started = True
        denied = Client(f"http://127.0.0.1:{gw.port}")
        req = (
            read_batch()
            .var_as("n", g().n_with_label("Doc").count())
            .returning(["n"])
            .to_dynamic_request()
        )
        with pytest.raises(HelixError, match="invalid api key"):
            denied.query().dynamic(req).send()
        ok = Client(f"http://127.0.0.1:{gw.port}", api_key="sekret")
        assert ok.health()["status"] == "ok"
    finally:
        if gw2_started:
            gw.stop(close_engine=False)


def test_keep_alive_and_pipelining(gateway):
    """Two requests written back-to-back on one connection come back
    in order on the same socket."""
    body = json.dumps({"q": _query_vec(1), "k": 2}).encode()
    req = (
        b"POST /v1/query/vsearch HTTP/1.1\r\n"
        b"Host: x\r\nContent-Type: application/json\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    health = b"GET /v1/health HTTP/1.1\r\nHost: x\r\n\r\n"
    with socket.create_connection(("127.0.0.1", gateway.port), timeout=10) as s:
        s.sendall(req + health + req)
        buf = b""
        deadline = time.time() + 10
        while buf.count(b"HTTP/1.1 200") < 3 and time.time() < deadline:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    responses = buf.split(b"HTTP/1.1 200 OK\r\n")
    assert len(responses) == 4  # leading empty + 3 responses
    assert b'"hits"' in responses[1]
    assert b'"status"' in responses[2]
    assert b'"hits"' in responses[3]


def test_trace_header_uses_interpreter(client):
    out = client.query_raw(
        "/v1/query/vsearch", {"q": _query_vec(2), "k": 2},
        headers={"x-helix-trace": "true"},
    ) if hasattr(client, "query_raw") else None
    if out is None:
        import urllib.request

        req = urllib.request.Request(
            client.url + "/v1/query/vsearch",
            data=json.dumps({"q": _query_vec(2), "k": 2}).encode(),
            headers={"Content-Type": "application/json",
                     "x-helix-trace": "true"},
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
    assert "$trace" not in out  # stored route: trace only on dynamic; hits present
    assert len(out["hits"]) == 2


def test_stored_route_wrapped_parameters(client):
    vec = _query_vec(4)
    bare = client.call("vsearch", {"q": vec, "k": 2})
    wrapped = client.call("vsearch", {"parameters": {"q": vec, "k": 2}})
    assert bare == wrapped


def test_404_and_bad_json(gateway):
    import urllib.error
    import urllib.request

    url = f"http://127.0.0.1:{gateway.port}"
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(url + "/nope")
    assert err.value.code == 404
    req = urllib.request.Request(
        url + "/v1/query", data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400


def test_concurrent_mixed_load(gateway, client):
    """Fast searches + dynamic reads + writes in parallel, all correct."""
    errors = []

    def searcher(seed):
        try:
            for i in range(20):
                out = client.call("vsearch", {"q": _query_vec(seed * 100 + i), "k": 3})
                assert len(out["hits"]) == 3
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def writer():
        try:
            for i in range(10):
                wb = write_batch().var_as(
                    "d", g().add_n("Doc", {"emb": _query_vec(7000 + i), "title": f"w{i}"})
                )
                client.query().dynamic(wb.to_dynamic_request()).send()
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=searcher, args=(s,)) for s in range(4)]
    threads.append(threading.Thread(target=writer))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    assert gateway.engine.store.node_count() == 74


def test_events_stream(gateway, client, tmp_path):
    """SSE stream over the native gateway delivers telemetry events."""
    import urllib.request

    from helix_tpu.telemetry import Telemetry

    gateway.engine.telemetry = Telemetry(
        str(tmp_path / "events.jsonl"), level="full"
    )
    client.health()
    req = urllib.request.Request(
        f"http://127.0.0.1:{gateway.port}/v1/events?after=-1"
    )
    resp = urllib.request.urlopen(req, timeout=10)
    # generate an event, then read until a data frame shows up
    gateway.engine.telemetry.log_event("test_event", detail="x")
    deadline = time.time() + 10
    buf = b""
    while time.time() < deadline and b"data:" not in buf:
        buf += resp.read1(65536)
    assert b"data:" in buf
    resp.close()


def test_k_beyond_fast_cap_serves_via_interpreter(gateway, client):
    """k > K_MAX must not be clamped by the fast path (silent divergence
    from the interpreter, which honors the full k): the C++ body parse
    rejects it to the general path and the result matches the slow path
    exactly."""
    vec = _query_vec(42)
    big_k = NativeGateway.K_MAX + 976
    fast_before = gateway.stats()["fast_requests"]
    out = client.call("vsearch", {"q": vec, "k": big_k})
    # engine holds 64 docs: the interpreter returns them all
    assert len(out["hits"]) == 64
    assert out == gateway.engine.execute_stored(
        "vsearch", {"q": vec, "k": big_k}
    )
    assert gateway.stats()["fast_requests"] == fast_before
    # and a literal-k route beyond the cap is never fast-registered
    from helix_tpu.dsl import param as _param

    p = define_params({"q": _param.array(_param.f32())})
    bundle = define_queries({
        "read": {
            "bigk": register_read(
                lambda pp: read_batch().var_as(
                    "hits",
                    g().vector_search_nodes(
                        "Doc", "emb", Expr.param("q"), 5000
                    ).value_map(["$id", "$distance"]),
                ).returning(["hits"]),
                p,
            ),
        },
    }).build_query_bundle()
    gateway.engine.load_bundle(bundle)
    gateway.on_bundle_loaded()
    assert "bigk" not in {s.name for s in gateway._fast_specs.values()}
    out = client.call("bigk", {"q": vec})
    assert len(out["hits"]) == 64


def _tenant_setup():
    """Engine with a multitenant index: two tenants, distinct vectors."""
    engine = Engine()
    wb = write_batch().var_as(
        "idx",
        g().create_vector_index_nodes("Mem", "emb", tenant_property="owner"),
    )
    rng = np.random.default_rng(11)
    for tenant in ("alice", "bob"):
        for i in range(24):
            vec = rng.normal(size=DIM)
            vec /= np.linalg.norm(vec)
            wb = wb.var_as(
                f"{tenant}{i}",
                g().add_n("Mem", {
                    "emb": [float(x) for x in vec],
                    "owner": tenant, "note": f"{tenant}-{i}",
                }),
            )
    engine.execute(json.loads(wb.to_dynamic_request().to_json_string()))
    p = define_params({
        "q": param.array(param.f32()), "k": param.i64(),
        "owner": param.string(),
    })
    bundle = define_queries({
        "read": {
            "msearch": register_read(
                lambda pp: read_batch().var_as(
                    "hits",
                    g().vector_search_nodes(
                        "Mem", "emb", Expr.param("q"), Expr.param("k"),
                        tenant_value=Expr.param("owner"),
                    ).value_map(["$id", "$distance"]),
                ).returning(["hits"]),
                p,
            ),
        },
    }).build_query_bundle()
    gw = NativeGateway(engine, host="127.0.0.1", port=0)
    gw.start()
    gw.engine.load_bundle(bundle)
    gw.on_bundle_loaded()
    return gw


def test_tenant_fast_path_equals_slow_path():
    """Multitenant stored routes ride the fast path per-tenant with
    results identical to the interpreter."""
    gw = _tenant_setup()
    try:
        client = Client(f"http://127.0.0.1:{gw.port}")
        assert any(
            s.tenant_key == "owner" for s in gw._fast_specs.values()
        ), "tenanted route did not register as fast"
        before = gw.stats()["fast_requests"]
        for seed, owner in [(1, "alice"), (2, "bob"), (3, "alice")]:
            vec = _query_vec(seed)
            fast = client.call("msearch", {"q": vec, "k": 5, "owner": owner})
            slow = gw.engine.execute_stored(
                "msearch", {"q": vec, "k": 5, "owner": owner}
            )
            assert fast == slow
            assert len(fast["hits"]) == 5
        assert gw.stats()["fast_requests"] >= before + 3
        # unknown tenant: empty result (reference dsl.rs:326-330), fast
        out = client.call(
            "msearch", {"q": _query_vec(4), "k": 5, "owner": "nobody"}
        )
        assert out == {"hits": []}
        # missing tenant: the interpreter's error, via the general path
        with pytest.raises(HelixError, match="owner"):
            client.call("msearch", {"q": _query_vec(5), "k": 5})
    finally:
        gw.stop()


def test_tenant_isolation_through_fast_path():
    """alice's hits never contain bob's vectors: compare against a
    per-tenant interpreter query on node ids."""
    gw = _tenant_setup()
    try:
        client = Client(f"http://127.0.0.1:{gw.port}")
        vec = _query_vec(9)
        alice = client.call("msearch", {"q": vec, "k": 24, "owner": "alice"})
        bob = client.call("msearch", {"q": vec, "k": 24, "owner": "bob"})
        alice_ids = {h["$id"] for h in alice["hits"]}
        bob_ids = {h["$id"] for h in bob["hits"]}
        assert len(alice_ids) == 24 and len(bob_ids) == 24
        assert not (alice_ids & bob_ids)
    finally:
        gw.stop()


def test_responses_are_strict_json(gateway):
    """Non-finite stored floats must encode as null in responses — bare
    NaN/Infinity tokens are not JSON and break strict clients (the
    reference's serde/sonic-rs never emit them, sdks/rust/src/lib.rs:407-409).
    The engine accepts them on ingest (lenient parse, like stdlib json)."""

    def raw(body: bytes) -> bytes:
        s = socket.create_connection(("127.0.0.1", gateway.port), timeout=30)
        s.sendall(
            b"POST /v1/query HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body
        )
        buf = b""
        while True:
            chunk = s.recv(1 << 16)
            if not chunk:
                break
            buf += chunk
        s.close()
        return buf

    write = (
        b'{"request_type":"write","query_name":null,"query":{"queries":'
        b'[{"Query":{"name":"d","steps":[{"AddN":{"label":"NanDoc",'
        b'"properties":[["x",{"Value":{"F64":NaN}}],'
        b'["y",{"Value":{"F64":Infinity}}]]}}],"condition":null}}],'
        b'"returns":[]}}'
    )
    resp = raw(write)
    assert b" 200" in resp.split(b"\r\n", 1)[0]

    read = (
        b'{"request_type":"read","query_name":null,"query":{"queries":'
        b'[{"Query":{"name":"n","steps":'
        b'[{"NWhere":{"Eq":["$label",{"String":"NanDoc"}]}},'
        b'{"ValueMap":null}],"condition":null}}],"returns":["n"]}}'
    )
    resp = raw(read)
    head, _, body = resp.partition(b"\r\n\r\n")
    assert b" 200" in head.split(b"\r\n", 1)[0]

    def _reject(tok):
        raise AssertionError(f"non-JSON token {tok!r} in response body")

    parsed = json.loads(body, parse_constant=_reject)
    (row,) = parsed["n"]
    assert row["x"] is None and row["y"] is None


def test_malformed_content_length_rejected(gateway):
    """A Content-Length that doesn't parse must 400 and close — treating
    it as 0 would reparse the body bytes as the next pipelined request
    (request smuggling)."""
    raw = (
        b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: +17\r\n\r\n"
        b"GET /v1/health HTTP"
    )
    with socket.create_connection(("127.0.0.1", gateway.port), timeout=10) as s:
        s.sendall(raw)
        buf = b""
        deadline = time.time() + 10
        while time.time() < deadline:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    assert b"400" in buf.split(b"\r\n", 1)[0]
    assert buf.count(b"HTTP/1.1") == 1  # the smuggled bytes never parsed


def test_trailing_ows_in_content_length_ok(gateway):
    body = b"{}"
    raw = (
        b"GET /v1/health HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: " + str(len(body)).encode() + b" \r\n\r\n" + body
    )
    with socket.create_connection(("127.0.0.1", gateway.port), timeout=10) as s:
        s.sendall(raw)
        buf = b""
        deadline = time.time() + 10
        while b"\r\n\r\n" not in buf and time.time() < deadline:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    assert buf.startswith(b"HTTP/1.1 200")


def test_fast_path_rejects_malformed_commas(gateway, client):
    """Trailing/missing commas are invalid JSON: the fast path must
    decline (-> interpreter 400), never 200 a body the slow path would
    reject."""
    good = json.dumps({"q": _query_vec(3), "k": 2})
    trailing = good[:-1] + ",}"
    missing = good.replace('], "k"', '] "k"')
    for bad in (trailing, missing):
        raw = (
            b"POST /v1/query/vsearch HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: " + str(len(bad)).encode() + b"\r\n\r\n"
            + bad.encode()
        )
        with socket.create_connection(
            ("127.0.0.1", gateway.port), timeout=10
        ) as s:
            s.sendall(raw)
            buf = b""
            deadline = time.time() + 10
            while b"\r\n\r\n" not in buf and time.time() < deadline:
                chunk = s.recv(65536)
                if not chunk:
                    break
                buf += chunk
        status = buf.split(b"\r\n", 1)[0]
        assert b"400" in status or b"500" in status, (bad, buf[:200])


def test_parked_bodies_do_not_leak(gateway, client):
    """Every request (incl. empty-body GETs like health checks and
    follower polls) parks a body entry in C++ that the worker must
    release — the map must drain back to ~0."""
    for _ in range(30):
        client.health()
    deadline = time.time() + 5
    lib, h = gateway._lib, gateway._handle
    while time.time() < deadline:
        if int(lib.hxgw_parked_count(h)) == 0:
            break
        time.sleep(0.05)
    assert int(lib.hxgw_parked_count(h)) == 0


def test_fast_route_missing_k_matches_interpreter(gateway, client):
    """Omitting a required k param must produce the interpreter's 400 on
    BOTH paths (the fast parse used to default k=10 and 200)."""
    vec = _query_vec(5)
    with pytest.raises(HelixError):
        client.call("vsearch", {"q": vec})  # no k


def test_wide_dim_routes_stay_on_interpreter():
    """Routes wider than the C++ vbatch buffer must not register as
    fast routes (the buffer would silently truncate queries)."""
    import numpy as np

    from helix_tpu.dsl import (
        Expr, define_params, define_queries, g, param, read_batch,
        register_read, write_batch,
    )
    from helix_tpu.engine import Engine
    from helix_tpu.server.native_gateway import NativeGateway

    eng = Engine(batch_window_ms=None)
    gw = NativeGateway(eng, host="127.0.0.1", port=0)
    gw.start()
    try:
        wide = 4224  # > MAX_FAST_DIM after lane padding
        req = {
            "request_type": "write", "query_name": None,
            "query": write_batch()
            .var_as("i", g().create_vector_index_nodes("W", "v"))
            .var_as("a", g().add_n("W", {"v": [0.0] * wide}))
            .encode(),
            "parameters": {},
        }
        eng.execute(req)
        p = define_params({"q": param.array(param.f32()), "k": param.i64()})
        bundle = define_queries({
            "read": {
                "wsearch": register_read(
                    lambda pp: read_batch().var_as(
                        "hits",
                        g().vector_search_nodes(
                            "W", "v", Expr.param("q"), Expr.param("k")
                        ).value_map(["$id", "$distance"]),
                    ).returning(["hits"]),
                    p,
                ),
            }
        }).build_query_bundle()
        gw.engine.load_bundle(bundle)
        gw.on_bundle_loaded()
        assert all(
            s.name != "wsearch" for s in gw._fast_specs.values()
        ), "wide route must not be fast-path eligible"
        # and it still serves correctly via the interpreter
        from helix_tpu.client import Client

        out = Client(f"http://127.0.0.1:{gw.port}").call(
            "wsearch", {"q": [0.0] * wide, "k": 1}
        )
        assert len(out["hits"]) == 1
    finally:
        gw.stop()
        gw.engine.close()


def test_duplicate_content_length_rejected(gateway):
    """Two Content-Length headers must 400 and close: a front hop that
    honors the FIRST value while we honor the last desynchronizes the
    connection (request smuggling), exactly like a malformed value."""
    raw = (
        b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: 10\r\nContent-Length: 50\r\n\r\n"
        b"0123456789GET /v1/health HTTP/1.1\r\nHost: x\r\n\r\n"
    )
    with socket.create_connection(("127.0.0.1", gateway.port), timeout=10) as s:
        s.sendall(raw)
        buf = b""
        deadline = time.time() + 10
        while time.time() < deadline:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    assert b"400" in buf.split(b"\r\n", 1)[0]
    assert buf.count(b"HTTP/1.1") == 1  # the trailing bytes never parsed

"""HTTP gateway + client SDK tests (in-process server, real sockets)."""

import pytest

from helix_tpu.client import Client, HelixError
from helix_tpu.dsl import (
    DynamicQueryRequest, Predicate, define_params, define_queries, g, param,
    read_batch, register_read, register_write, write_batch,
)
from helix_tpu.server import HelixHTTPServer


@pytest.fixture
def server():
    srv = HelixHTTPServer(host="127.0.0.1", port=0)
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture
def client(server):
    return Client(f"http://127.0.0.1:{server.port}")


def test_health(client):
    health = client.health()
    assert health["status"] == "ok"
    assert health["nodes"] == 0


def test_dynamic_write_and_read(client):
    out = client.execute(
        DynamicQueryRequest.write(
            write_batch()
            .var_as("created", g().add_n("User", {"name": "ann"}))
            .returning(["created"])
        )
    )
    assert out["created"][0]["name"] == "ann"

    out = client.execute(
        DynamicQueryRequest.read(
            read_batch()
            .var_as("n", g().n_with_label("User").count())
            .returning(["n"])
        )
    )
    assert out == {"n": 1}


def test_readiness_probe_shape(client):
    # The probe the CLI/e2e uses (local_runtime.rs:584).
    out = client.execute(
        {
            "request_type": "read",
            "query_name": None,
            "query": {
                "queries": [
                    {
                        "Query": {
                            "name": "ready",
                            "steps": [
                                {"NWhere": {"Eq": ["$label", {"String": "__HelixReadiness__"}]}},
                                "Count",
                            ],
                            "condition": None,
                        }
                    }
                ],
                "returns": ["ready"],
            },
            "parameters": {},
        }
    )
    assert out == {"ready": 0}


def test_error_is_400_with_taxonomy(client):
    with pytest.raises(HelixError) as err:
        client.execute({"request_type": "bogus", "query": {}})
    assert err.value.status == 400
    assert err.value.body["error"]["kind"] == "QueryError"


def test_warm_header_rejected_on_write(client):
    req = DynamicQueryRequest.write(
        write_batch().var_as("x", g().add_n("User"))
    )
    with pytest.raises(HelixError, match="warm"):
        client.query().warm_only().dynamic(req).send()


def test_stored_routes_deploy_and_call(client):
    p = define_params({"name": param.string()})
    queries = define_queries(
        {
            "write": {
                "add_user": register_write(
                    lambda pp: write_batch()
                    .var_as("user", g().add_n("User", [("name", pp.name)]))
                    .returning(["user"]),
                    p,
                ),
            },
            "read": {
                "find_user": register_read(
                    lambda pp: read_batch()
                    .var_as(
                        "users",
                        g().n_with_label("User").where(Predicate.eq("name", pp.name)).count(),
                    )
                    .returning(["users"]),
                    p,
                ),
            },
        }
    )
    installed = client.deploy_bundle(queries.build_query_bundle())
    assert sorted(installed["installed"]) == ["add_user", "find_user"]

    out = client.call("add_user", {"name": "zoe"})
    assert out["user"][0]["name"] == "zoe"
    assert client.call("find_user", {"name": "zoe"}) == {"users": 1}
    assert client.call("find_user", {"name": "nope"}) == {"users": 0}

    with pytest.raises(HelixError, match="unknown stored query"):
        client.call("missing_route", {})


def test_stored_route_missing_param_is_error(client):
    p = define_params({"name": param.string()})
    queries = define_queries(
        {
            "read": {
                "who": register_read(
                    lambda pp: read_batch().var_as(
                        "u", g().n_with_label("User").where(Predicate.eq("name", pp.name))
                    ),
                    p,
                )
            }
        }
    )
    client.deploy_bundle(queries.build_query_bundle())
    with pytest.raises(HelixError, match="missing required parameter"):
        client.call("who", {})


def test_api_key_auth():
    srv = HelixHTTPServer(host="127.0.0.1", port=0, api_key="sekret")
    srv.start()
    try:
        no_key = Client(f"http://127.0.0.1:{srv.port}")
        with pytest.raises(HelixError) as err:
            no_key.execute({"request_type": "read", "query": {"queries": [], "returns": []}})
        assert err.value.status == 401
        with_key = Client(f"http://127.0.0.1:{srv.port}", api_key="sekret")
        assert with_key.execute(
            {"request_type": "read", "query": {"queries": [], "returns": []}}
        ) == {}
    finally:
        srv.stop()


def test_concurrent_reads(client):
    import concurrent.futures

    client.execute(
        DynamicQueryRequest.write(
            write_batch().var_as("u", g().add_n("User", {"name": "x"}))
        )
    )
    req = DynamicQueryRequest.read(
        read_batch().var_as("n", g().n_with_label("User").count())
    )

    def hit(_):
        return client.execute(req)["n"]

    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        results = list(pool.map(hit, range(32)))
    assert results == [1] * 32


def test_dynamic_batching_coalesces_concurrent_searches():
    """Concurrent vector searches against one partition share dispatches."""
    import concurrent.futures

    from helix_tpu.dsl import DynamicQueryRequest, g, read_batch, write_batch
    from helix_tpu.engine import Engine

    engine = Engine(batch_window_ms=5.0)
    seed = write_batch().var_as(
        "idx", g().create_vector_index_nodes("Doc", "emb")
    )
    for i in range(20):
        seed = seed.var_as(
            f"d{i}", g().add_n("Doc", {"n": i, "emb": [float(i), 1.0]})
        )
    engine.execute(DynamicQueryRequest.write(seed).encode())

    def search(i):
        out = engine.execute(
            DynamicQueryRequest.read(
                read_batch().var_as(
                    "hits",
                    g().vector_search_nodes("Doc", "emb", [float(i), 1.0], 3)
                    .value_map(["n"]),
                )
            ).encode()
        )
        return out["hits"][0]["n"]

    with concurrent.futures.ThreadPoolExecutor(16) as pool:
        results = list(pool.map(search, range(16)))
    assert results == list(range(16))  # every caller got its own answer
    batcher = engine.vectors.batcher
    assert batcher.dispatches >= 1
    assert batcher.dispatches + batcher.coalesced == 16
    assert batcher.coalesced > 0  # at least some coalescing happened


def test_401_drains_body_on_keep_alive():
    """An unauthorized POST's body must be consumed before the 401 or
    the keep-alive stream parses body bytes as the next request."""
    import socket

    from helix_tpu.server import HelixHTTPServer

    srv = HelixHTTPServer(host="127.0.0.1", port=0, api_key="sekret")
    srv.start()
    try:
        body = b"GET /v1/health HTTP/1.1\r\n\r\n"  # smuggle attempt
        raw = (
            b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
            + b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
            b"Authorization: Bearer wrong\r\nContent-Length: 2\r\n\r\n{}"
        )
        import time as _t

        with socket.create_connection(("127.0.0.1", srv.port), timeout=5) as s:
            s.sendall(raw)
            buf = b""
            deadline = _t.time() + 5
            while buf.count(b"HTTP/1.1 401") < 2 and _t.time() < deadline:
                try:
                    chunk = s.recv(65536)
                except TimeoutError:
                    break
                if not chunk:
                    break
                buf += chunk
        # both requests get 401; the smuggled health request never runs
        assert buf.count(b"HTTP/1.1 401") == 2, buf[:300]
        assert b'"status"' not in buf
    finally:
        srv.stop()
        srv.engine.close()


def test_replication_bad_after_is_400(client, server):
    import urllib.error
    import urllib.request

    try:
        urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/v1/replication?after=abc",
            timeout=5,
        )
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as exc:
        assert exc.code == 400


def test_client_error_shapes_do_not_crash():
    """HelixError must surface for every error payload shape the fleet
    emits: kind-only (HA 503 fallback), string errors (control plane),
    and non-JSON bodies."""
    import io
    import urllib.error

    from helix_tpu import client as client_mod

    def fake_urlopen_factory(code, body):
        def fake(req, timeout=None):
            raise urllib.error.HTTPError(
                "http://x", code, "err", {}, io.BytesIO(body)
            )
        return fake

    for code, body, expect in (
        (503, b'{"error": {"kind": "Unavailable"}}', "Unavailable"),
        (400, b'{"error": "name required"}', "name required"),
        (500, b"not json", "HTTP 500"),
        (404, b'{"error": {"kind": "NotFound", "message": "nope"}}', "nope"),
    ):
        orig = client_mod.urllib.request.urlopen
        client_mod.urllib.request.urlopen = fake_urlopen_factory(code, body)
        try:
            with pytest.raises(client_mod.HelixError) as exc_info:
                client_mod._post("http://x/v1/query", {}, {}, None)
            assert expect in str(exc_info.value)
            assert exc_info.value.status == code
        finally:
            client_mod.urllib.request.urlopen = orig


def test_stored_name_is_percent_encoded(client):
    """Names with spaces/slashes must not crash urllib or target a
    different route — they produce a clean unknown-route error."""
    from helix_tpu.client import HelixError

    for name in ("my query", "a/../b", "x?y", "tab\tname"):
        with pytest.raises(HelixError) as exc_info:
            client.call(name, {})
        assert exc_info.value.status in (400, 404), (name, exc_info.value)


def test_objstore_io_errors_propagate(tmp_path):
    """Only a genuinely missing object reads as None; other I/O faults
    raise (silently bootstrapping an empty node is data loss)."""
    from helix_tpu.engine.objstore import FileObjectStore

    store = FileObjectStore(tmp_path / "bucket")
    assert store.get("missing") is None
    (tmp_path / "bucket" / "weird").mkdir()
    with pytest.raises(OSError):
        store.get("weird")  # IsADirectoryError must NOT read as absent

"""MCP endpoint: JSON-RPC handshake, tool listing, tool calls over HTTP."""

import json
import urllib.request

import pytest

from helix_tpu.dsl import DynamicQueryRequest, g, read_batch, write_batch
from helix_tpu.server import HelixHTTPServer


def rpc(port, method, params=None, msg_id=1):
    body = {"jsonrpc": "2.0", "id": msg_id, "method": method}
    if params is not None:
        body["params"] = params
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/mcp",
        data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def tool_text(response):
    result = response["result"]
    assert not result.get("isError"), result
    return json.loads(result["content"][0]["text"])


@pytest.fixture(scope="module")
def server():
    srv = HelixHTTPServer(host="127.0.0.1", port=0)
    srv.start()
    srv.engine.execute(DynamicQueryRequest.write(
        write_batch()
        .var_as("vidx", g().create_vector_index_nodes("Doc", "emb"))
        .var_as("tidx", g().create_text_index_nodes("Doc", "body"))
        .var_as("d1", g().add_n("Doc", {
            "title": "alpha", "body": "graphs store nodes and edges",
            "emb": [1.0, 0.0]}))
        .var_as("d2", g().add_n("Doc", {
            "title": "beta", "body": "vectors power nearest neighbor search",
            "emb": [0.0, 1.0]}))
    ).encode())
    yield srv
    srv.stop()


def test_initialize_and_tool_list(server):
    init = rpc(server.port, "initialize", {
        "protocolVersion": "2025-03-26", "capabilities": {},
        "clientInfo": {"name": "test", "version": "0"},
    })
    assert init["result"]["serverInfo"]["name"] == "helix-tpu"
    assert "tools" in init["result"]["capabilities"]
    tools = rpc(server.port, "tools/list")["result"]["tools"]
    assert {t["name"] for t in tools} == {
        "query", "vector_search", "text_search", "graph_schema"}
    for tool in tools:
        assert tool["inputSchema"]["type"] == "object"


def test_notification_gets_202(server):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
    conn.request("POST", "/mcp", json.dumps({
        "jsonrpc": "2.0", "method": "notifications/initialized"}),
        {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 202
    resp.read()
    conn.close()


def test_vector_and_text_tools(server):
    hits = tool_text(rpc(server.port, "tools/call", {
        "name": "vector_search",
        "arguments": {"label": "Doc", "property": "emb",
                      "vector": [1.0, 0.1], "k": 1},
    }))
    assert hits[0]["title"] == "alpha"
    hits = tool_text(rpc(server.port, "tools/call", {
        "name": "text_search",
        "arguments": {"label": "Doc", "property": "body",
                      "query": "nearest neighbor", "k": 1},
    }))
    assert hits[0]["title"] == "beta"


def test_query_tool_and_schema(server):
    out = tool_text(rpc(server.port, "tools/call", {
        "name": "query",
        "arguments": {"request": DynamicQueryRequest.read(
            read_batch().var_as("n", g().n_with_label("Doc").count())
        ).encode()},
    }))
    assert out["n"] == 2
    schema = tool_text(rpc(server.port, "tools/call", {
        "name": "graph_schema", "arguments": {}}))
    assert schema["node_labels"] == {"Doc": 2}
    assert {i["kind"] for i in schema["indexes"]} == {"NodeVector", "NodeText"}


def test_tool_errors_are_mcp_shaped(server):
    # Unknown tool -> JSON-RPC error
    resp = rpc(server.port, "tools/call", {"name": "nope", "arguments": {}})
    assert resp["error"]["code"] == -32602
    # Engine error -> isError tool result, not a crash
    result = rpc(server.port, "tools/call", {
        "name": "vector_search",
        "arguments": {"label": "NoSuch", "property": "emb",
                      "vector": [1.0, 0.0]},
    })["result"]
    assert result["isError"] is True
    # Unknown method
    resp = rpc(server.port, "bogus/method")
    assert resp["error"]["code"] == -32601


def test_mcp_disabled_returns_404():
    srv = HelixHTTPServer(host="127.0.0.1", port=0, mcp=False)
    srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as err:
            rpc(srv.port, "tools/list")
        assert err.value.code == 404
    finally:
        srv.stop()


def test_replica_mcp_rejects_writes():
    primary = HelixHTTPServer(host="127.0.0.1", port=0)
    primary.start()
    replica = HelixHTTPServer(
        host="127.0.0.1", port=0,
        replica_of=f"http://127.0.0.1:{primary.port}")
    replica.start()
    try:
        result = rpc(replica.port, "tools/call", {
            "name": "query",
            "arguments": {"request": DynamicQueryRequest.write(
                write_batch().var_as("u", g().add_n("User"))
            ).encode()},
        })["result"]
        assert result["isError"] is True
        assert "read-only replica" in result["content"][0]["text"]
    finally:
        replica.stop()
        primary.stop()


def test_mcp_query_tool_matches_http_route(server):
    """The MCP query tool and POST /v1/query must return identical
    payloads for the same request."""
    request = DynamicQueryRequest.read(
        read_batch()
        .var_as("docs", g().n_with_label("Doc").order_by("title", "Asc")
                .value_map(["title"]))
        .var_as("n", g().n_with_label("Doc").count())
    ).encode()

    via_mcp = tool_text(rpc(server.port, "tools/call", {
        "name": "query", "arguments": {"request": request}}))

    import urllib.request as _rq
    req = _rq.Request(
        f"http://127.0.0.1:{server.port}/v1/query",
        data=json.dumps(request).encode(), method="POST")
    with _rq.urlopen(req, timeout=30) as resp:
        via_http = json.loads(resp.read())
    assert via_mcp == via_http

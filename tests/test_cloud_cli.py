"""Control-plane command tests: auth, cluster registry, push, sync."""

import json

import pytest

from helix_tpu.server import HelixHTTPServer
from tests.test_cli import run_cli


@pytest.fixture(autouse=True)
def state_home(tmp_path, monkeypatch):
    home = tmp_path / "home"
    monkeypatch.setenv("HELIX_TPU_HOME", str(home))
    import importlib

    from helix_tpu.cli import cloud

    importlib.reload(cloud)
    yield home
    importlib.reload(cloud)


@pytest.fixture
def gateway():
    srv = HelixHTTPServer(host="127.0.0.1", port=0)
    srv.start()
    yield srv
    srv.stop()


def test_auth_lifecycle(state_home):
    code, out, _ = run_cli(["auth", "status"])
    assert code == 0 and "not logged in" in out
    code, out, _ = run_cli(
        ["auth", "login", "--user-id", "u1", "--user-key", "k1"]
    )
    assert code == 0
    assert "helix_user_id=u1" in (state_home / "credentials").read_text()
    code, out, _ = run_cli(["auth", "status"])
    assert "logged in as u1" in out
    assert run_cli(["auth", "logout"])[0] == 0


def test_cluster_registry(state_home):
    code, out, _ = run_cli(["cluster"])
    assert "no clusters" in out
    assert run_cli(
        ["cluster", "add", "prod", "--gateway", "http://example:6969"]
    )[0] == 0
    code, out, _ = run_cli(["cluster", "list"])
    assert "prod" in out and "http://example:6969" in out
    code, out, _ = run_cli(["cluster", "list", "--format", "json"])
    assert json.loads(out)["prod"]["gateway_url"] == "http://example:6969"
    assert run_cli(["cluster", "remove", "prod"])[0] == 0


def test_push_requires_auth(state_home, tmp_path):
    run_cli(["init", "--path", str(tmp_path / "proj")])
    with pytest.raises(SystemExit, match="not logged in"):
        run_cli(["push", "prod"], cwd=tmp_path / "proj")


def test_push_and_sync_roundtrip(state_home, gateway, tmp_path):
    run_cli(["auth", "login", "--user-id", "u", "--user-key", "k"])
    run_cli(
        ["cluster", "add", "dev", "--gateway", f"http://127.0.0.1:{gateway.port}"]
    )
    root = tmp_path / "proj"
    run_cli(["init", "--path", str(root)])
    db = root / "db"
    db.mkdir()
    (db / "queries.py").write_text(
        "queries = define_queries({\n"
        '    "read": {\n'
        '        "count_users": register_read(\n'
        '            lambda p: read_batch().var_as("n", g().n_with_label("User").count()).returning(["n"]),\n'
        '            define_params({}),\n'
        "        )\n"
        "    }\n"
        "})\n"
    )
    code, out, err = run_cli(["push", "dev"], cwd=root)
    assert code == 0, err
    assert "count_users" in out and "pushed 1 source files" in out
    # The route is live on the gateway.
    from helix_tpu.client import Client

    client = Client(f"http://127.0.0.1:{gateway.port}")
    assert client.call("count_users", {}) == {"n": 0}

    # Sync: no changes -> in sync.
    code, out, _ = run_cli(["sync", "dev", "--dry-run"], cwd=root)
    assert code == 0 and "in sync" in out

    # Remote-only file appears in the pull plan and gets pulled.
    snapshot = gateway.engine.source_snapshot
    snapshot["files"]["extra.py"] = {
        "content_b64": "IyBleHRyYQ==",  # "# extra"
        "sha256": "x",
        "last_modified_ms": 0,
    }
    code, out, _ = run_cli(["sync", "dev", "--yes"], cwd=root)
    assert code == 0 and "pull:  extra.py" in out
    assert (db / "extra.py").read_text() == "# extra"

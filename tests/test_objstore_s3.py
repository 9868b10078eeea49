"""Execution coverage for the ``s3://`` snapshot-store backend.

The reference's disk mode is S3-backed (MinIO locally,
``helix-cli/src/local_runtime.rs:773-786``).  These tests run the real
client code — SigV4 signing, path-style REST, NoSuchKey handling —
against an in-process signature-verifying stub (``tests/s3_stub.py``),
including the full disk-mode lifecycle: checkpoint to the bucket, lose
the local disk, bootstrap a replacement node from the bucket.
"""

import pytest

from helix_tpu.engine.objstore import S3ObjectStore, open_store

from .s3_stub import S3Stub


@pytest.fixture()
def stub(monkeypatch):
    with S3Stub("AKSTUBKEY", "stub-secret-key") as s3:
        for key, value in s3.env().items():
            monkeypatch.setenv(key, value)
        yield s3


def test_put_get_roundtrip(stub):
    store = open_store("s3://snapshots/prefix/a")
    assert isinstance(store, S3ObjectStore)
    store.put("snapshot.bin", b"\x00\x01hello")
    assert store.get("snapshot.bin") == b"\x00\x01hello"
    assert stub.blobs == {"snapshots/prefix/a/snapshot.bin": b"\x00\x01hello"}


def test_get_missing_returns_none(stub):
    store = open_store("s3://snapshots")
    assert store.get("snapshot.bin") is None


def test_overwrite_replaces(stub):
    store = open_store("s3://b")
    store.put("k", b"one")
    store.put("k", b"two")
    assert store.get("k") == b"two"


def test_bad_secret_fails_loudly(stub, monkeypatch):
    """Auth failures must raise, never read as 'no snapshot' — a
    replacement node silently bootstrapping empty would fork history."""
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "wrong")
    store = open_store("s3://b")
    with pytest.raises(RuntimeError, match="403"):
        store.put("k", b"x")
    with pytest.raises(RuntimeError, match="403"):
        store.get("k")


def test_missing_credentials_rejected(monkeypatch):
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    with pytest.raises(RuntimeError, match="AWS_ACCESS_KEY_ID"):
        open_store("s3://bucket")


def test_binary_and_special_keys(stub):
    store = open_store("s3://b/pre fix")
    payload = bytes(range(256)) * 40
    store.put("snap shot.bin", payload)
    assert store.get("snap shot.bin") == payload


def _ingest_user(engine, name):
    from helix_tpu.dsl import g, write_batch

    engine.execute({
        "request_type": "write", "query_name": None,
        "query": write_batch().var_as(
            "n", g().add_n("User", {"name": name})
        ).encode(),
        "parameters": {},
    })


def _count_users(engine):
    from helix_tpu.dsl import SourcePredicate, g, read_batch

    out = engine.execute({
        "request_type": "read", "query_name": None,
        "query": read_batch().var_as(
            "c", g().n_where(SourcePredicate.eq("$label", "User")).count()
        ).returning(["c"]).encode(),
        "parameters": {},
    })
    return out["c"]


def test_disk_lifecycle_restart_from_bucket(stub, tmp_path):
    """The reference MinIO contract end-to-end: write → checkpoint to
    the bucket → lose the node's disk → a replacement bootstraps from
    the bucket alone."""
    from helix_tpu.engine import Engine

    eng = Engine(
        data_dir=str(tmp_path / "node_a"),
        snapshot_store="s3://snapshots/dev",
    )
    for i in range(5):
        _ingest_user(eng, f"u{i}")
    assert _count_users(eng) == 5
    eng.checkpoint()
    assert "snapshots/dev/snapshot.bin" in stub.blobs

    # replacement node: brand-new empty data dir, same bucket
    fresh = Engine(
        data_dir=str(tmp_path / "node_b"),
        snapshot_store="s3://snapshots/dev",
    )
    assert _count_users(fresh) == 5
    # and it keeps serving writes + re-checkpointing to the bucket
    _ingest_user(fresh, "u5")
    fresh.checkpoint()
    third = Engine(
        data_dir=str(tmp_path / "node_c"),
        snapshot_store="s3://snapshots/dev",
    )
    assert _count_users(third) == 6

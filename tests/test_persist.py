"""Durability tests: native WAL, snapshot checkpoint, crash recovery."""


import pytest

from helix_tpu.dsl import NodeRef, SourcePredicate, g, read_batch, write_batch
from helix_tpu.engine import Engine
from helix_tpu.native import Wal, replay


def wreq(batch):
    return {
        "request_type": "write",
        "query_name": None,
        "query": batch.encode(),
        "parameters": {},
    }


def rreq(batch):
    return {
        "request_type": "read",
        "query_name": None,
        "query": batch.encode(),
        "parameters": {},
    }


def test_wal_roundtrip(tmp_path):
    path = tmp_path / "test.wal"
    wal = Wal(path)
    records = [b"alpha", b"beta" * 1000, b"", b'{"json": true}']
    for rec in records:
        wal.append(rec, sync=False)
    wal.flush()
    wal.close()
    assert list(replay(path)) == records


def test_wal_torn_tail_ignored(tmp_path):
    path = tmp_path / "torn.wal"
    wal = Wal(path)
    wal.append(b"good-record")
    wal.close()
    # Simulate a crash mid-append: garbage half-frame at the tail.
    with open(path, "ab") as fh:
        fh.write(b"\xff\xff\xff")
    assert list(replay(path)) == [b"good-record"]


def test_wal_reset(tmp_path):
    path = tmp_path / "reset.wal"
    wal = Wal(path)
    wal.append(b"one")
    wal.reset()
    wal.append(b"two")
    wal.close()
    assert list(replay(path)) == [b"two"]


def test_engine_recovers_from_wal(tmp_path):
    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    eng.execute(wreq(
        write_batch()
        .var_as("a", g().add_n("User", {"name": "ann"}))
        .var_as("b", g().add_n("User", {"name": "bob"}))
        .var_as("e", g().n(NodeRef.var("a")).add_e("KNOWS", NodeRef.var("b")))
    ))
    eng.persistence.close()  # simulate crash WITHOUT checkpoint

    eng2 = Engine(data_dir=str(data))
    out = eng2.execute(rreq(
        read_batch()
        .var_as("users", g().n_with_label("User").count())
        .var_as(
            "friends",
            g().n_where(SourcePredicate.eq("name", "ann")).out("KNOWS").values(["name"]),
        )
    ))
    assert out["users"] == 2
    assert out["friends"] == ["bob"]


def test_engine_checkpoint_then_recover(tmp_path):
    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    eng.execute(wreq(
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "embedding"))
        .var_as("d1", g().add_n("Doc", {"title": "X", "embedding": [1.0, 0.0]}))
    ))
    eng.checkpoint()
    eng.execute(wreq(
        write_batch().var_as("d2", g().add_n("Doc", {"title": "Y", "embedding": [0.0, 1.0]}))
    ))
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    out = eng2.execute(rreq(
        read_batch().var_as(
            "hits",
            g().vector_search_nodes("Doc", "embedding", [0.0, 1.0], 1).value_map(["title"]),
        )
    ))
    # Snapshot restored d1 + index; WAL replayed d2; index backfilled both.
    assert out["hits"] == [{"title": "Y"}]


def test_ids_stable_across_recovery(tmp_path):
    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    out1 = eng.execute(wreq(
        write_batch().var_as("u", g().add_n("User", {"name": "a"}))
    ))
    first_id = out1["u"][0]["$id"]
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    out2 = eng2.execute(wreq(
        write_batch().var_as("u", g().add_n("User", {"name": "b"}))
    ))
    assert out2["u"][0]["$id"] == first_id + 1  # counter recovered


def test_failed_write_not_logged(tmp_path):
    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    with pytest.raises(Exception):
        eng.execute(wreq(
            write_batch()
            .var_as("a", g().add_n("User", {"name": "x"}))
            .var_as("bad", g().n(NodeRef.var("a")).add_e("E", NodeRef.ids([999])))
        ))
    eng.persistence.close()
    eng2 = Engine(data_dir=str(data))
    out = eng2.execute(rreq(read_batch().var_as("n", g().n().count())))
    assert out["n"] == 0


def test_unique_index_survives_recovery(tmp_path):
    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    eng.execute(wreq(
        write_batch().var_as(
            "idx",
            g().create_index(
                {"NodeEquality": {"label": "U", "property": "email", "unique": True}}
            ),
        )
    ))
    eng.execute(wreq(write_batch().var_as("u", g().add_n("U", {"email": "a@x"}))))
    eng.checkpoint()
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    with pytest.raises(Exception, match="unique"):
        eng2.execute(wreq(write_batch().var_as("u", g().add_n("U", {"email": "a@x"}))))


def test_routes_and_source_survive_recovery(tmp_path):
    from helix_tpu.dsl import define_params, define_queries, register_read

    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    p = define_params({})
    queries = define_queries({
        "read": {
            "count_all": register_read(
                lambda pp: read_batch().var_as("n", g().n().count()).returning(["n"]),
                p,
            )
        }
    })
    eng.load_bundle(queries.build_query_bundle())
    eng.source_snapshot = {"files": {"queries.py": {"sha256": "abc"}}}
    eng.checkpoint()
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    assert eng2.execute_stored("count_all", {}) == {"n": 0}
    assert eng2.source_snapshot["files"]["queries.py"]["sha256"] == "abc"


def test_vector_checkpoint_blocks_roundtrip(tmp_path):
    """Long vector props checkpoint as stacked matrices and rehydrate."""
    import numpy as np

    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    rng = np.random.default_rng(8)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    batch = write_batch().var_as("idx", g().create_vector_index_nodes("Doc", "emb"))
    for i in range(50):
        batch = batch.var_as(
            f"d{i}",
            g().add_n("Doc", {
                "i": i,
                "emb": [float(x) for x in vecs[i]],
                "short": [1.0, 2.0],          # below extraction threshold
            }),
        )
    eng.execute(wreq(batch))
    eng.checkpoint()
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    out = eng2.execute(rreq(
        read_batch().var_as(
            "hit",
            g().vector_search_nodes("Doc", "emb", [float(x) for x in vecs[7]], 1)
            .value_map(["i", "emb", "short"]),
        )
    ))
    row = out["hit"][0]
    assert row["i"] == 7
    assert row["short"] == [1.0, 2.0]
    assert np.allclose(row["emb"], vecs[7], rtol=1e-6)  # f32-exact


def test_snapshot_store_mirror_and_bootstrap(tmp_path):
    """Checkpoints mirror to the object store; a node with no local
    snapshot bootstraps from it (reference: S3-backed engine storage)."""
    from helix_tpu.dsl import DynamicQueryRequest, g, write_batch
    from helix_tpu.engine import Engine

    bucket = f"file://{tmp_path / 'bucket'}"
    eng = Engine(data_dir=str(tmp_path / "node_a"), snapshot_store=bucket)
    eng.execute(DynamicQueryRequest.write(
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "v"))
        .var_as("d", g().add_n("Doc", {"i": 7, "v": [1.0] * 8}))
    ).encode())
    eng.checkpoint()
    assert (tmp_path / "bucket" / "snapshot.bin").exists()
    eng.close()

    # Fresh machine: empty data dir, same bucket.
    fresh = Engine(data_dir=str(tmp_path / "node_b"), snapshot_store=bucket)
    from helix_tpu.dsl import read_batch

    out = fresh.execute(DynamicQueryRequest.read(
        read_batch()
        .var_as("n", g().n_with_label("Doc").count())
        .var_as("hit", g().vector_search_nodes("Doc", "v", [1.0] * 8, 1)
                .value_map(["i"]))
    ).encode())
    assert out["n"] == 1 and out["hit"][0]["i"] == 7
    fresh.close()


def test_snapshot_store_local_snapshot_wins(tmp_path):
    """When both exist, the local snapshot (plus local WAL) is
    authoritative; the bucket is only a bootstrap source."""
    from helix_tpu.dsl import DynamicQueryRequest, g, read_batch, write_batch
    from helix_tpu.engine import Engine
    from helix_tpu.engine.objstore import MemoryObjectStore

    store = MemoryObjectStore("t-local-wins")
    eng = Engine(data_dir=str(tmp_path / "n"), snapshot_store=store)
    eng.execute(DynamicQueryRequest.write(
        write_batch().var_as("a", g().add_n("A"))
    ).encode())
    eng.checkpoint()
    # Post-checkpoint write lands only in the local WAL.
    eng.execute(DynamicQueryRequest.write(
        write_batch().var_as("b", g().add_n("B"))
    ).encode())
    eng.persistence.close()  # simulate crash without final checkpoint

    again = Engine(data_dir=str(tmp_path / "n"), snapshot_store=store)
    out = again.execute(DynamicQueryRequest.read(
        read_batch().var_as("labels", g().n().label())
    ).encode())
    assert sorted(out["labels"]) == ["A", "B"]
    again.close()


def test_flaky_snapshot_store_does_not_fail_checkpoint(tmp_path):
    from helix_tpu.dsl import DynamicQueryRequest, g, write_batch
    from helix_tpu.engine import Engine

    class Broken:
        def put(self, key, data):
            raise OSError("bucket down")

        def get(self, key):
            return None

    eng = Engine(data_dir=str(tmp_path / "n"))
    eng.persistence.snapshot_store = Broken()
    eng.execute(DynamicQueryRequest.write(
        write_batch().var_as("a", g().add_n("A"))
    ).encode())
    eng.checkpoint()  # must not raise
    assert (tmp_path / "n" / "snapshot.bin").exists()
    eng.close()


def test_s3_store_requires_credentials(monkeypatch):
    """The stdlib S3 backend needs the reference's disk-mode env
    (local_runtime.rs:773-786); full execution coverage lives in
    tests/test_objstore_s3.py against the signature-verifying stub."""
    import pytest as _pytest

    from helix_tpu.engine.objstore import open_store

    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    with _pytest.raises(RuntimeError, match="AWS_ACCESS_KEY_ID"):
        open_store("s3://some-bucket/prefix")


def test_crash_between_snapshot_and_wal_truncate_no_double_apply(tmp_path):
    """A crash after the snapshot is replaced but before the WAL is
    truncated must not double-apply the WAL on restart (snapshot carries
    a WAL-sequence watermark; records at/below it are skipped)."""
    from helix_tpu.dsl import g, write_batch, read_batch
    from .test_engine_basic import run_read, run_write

    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    for i in range(3):
        run_write(
            eng,
            write_batch().var_as("n", g().add_n("User", {"name": f"u{i}"})),
        )
    # Simulate the crash window: checkpoint without the WAL truncation.
    real_reset = eng.persistence.wal.reset
    eng.persistence.wal.reset = lambda: None
    eng.checkpoint()
    eng.persistence.wal.reset = real_reset
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    out = run_read(eng2, read_batch().var_as("c", g().n().count()))
    assert out["c"] == 3  # NOT 6
    # And new writes after recovery still persist.
    run_write(eng2, write_batch().var_as("n", g().add_n("User", {"name": "u3"})))
    eng2.close()
    eng3 = Engine(data_dir=str(data))
    out = run_read(eng3, read_batch().var_as("c", g().n().count()))
    assert out["c"] == 4
    eng3.close()


def test_tampered_snapshot_fails_loudly(tmp_path):
    from helix_tpu.dsl import g, write_batch
    from .test_engine_basic import run_write

    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    run_write(eng, write_batch().var_as("n", g().add_n("User", {"name": "a"})))
    eng.checkpoint()
    eng.close()
    snap = data / "snapshot.bin"
    blob = bytearray(snap.read_bytes())
    blob[len(blob) // 2] ^= 0xFF  # flip a byte in the payload
    snap.write_bytes(bytes(blob))
    with pytest.raises(Exception, match="checksum|forbidden|unsupported"):
        Engine(data_dir=str(data))


def test_malicious_snapshot_rejected(tmp_path):
    """A snapshot smuggling a callable through pickle must raise, not
    execute (restricted unpickler)."""
    import pickle

    data = tmp_path / "data"
    data.mkdir()
    evil = pickle.dumps({"version": 2, "boom": __import__("os").system})
    (data / "snapshot.bin").write_bytes(evil)
    with pytest.raises(Exception, match="forbidden"):
        Engine(data_dir=str(data))


def test_array_vector_props_extract_into_blocks():
    """The bulk-ingest fast path stores vectors as array.array
    ({"F64Array": array('d', ...)}, exec.py fast_arrays); the snapshot
    compaction must stack those into numpy blocks exactly like lists."""
    from array import array

    from helix_tpu.engine.persist import _REF_KEY, _VectorExtractor

    ex = _VectorExtractor()
    out = ex.strip({"emb": {"F64Array": array("d", [float(i) for i in range(16)])}})
    assert _REF_KEY in out["emb"]
    out2 = ex.strip({"emb": {"F32Array": [1.0] * 16}})
    assert _REF_KEY in out2["emb"]
    blocks = ex.blocks()
    assert blocks[("F64Array", 16)].shape == (1, 16)
    assert blocks[("F32Array", 16)].shape == (1, 16)


def test_array_vector_checkpoint_roundtrip(tmp_path):
    """End-to-end: vectors held as array.array survive checkpoint ->
    recover with search intact (and go through the block path)."""
    from array import array

    from helix_tpu.engine.persist import build_snapshot_payload

    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    eng.execute(wreq(
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "emb"))
        .var_as("d", g().add_n("Doc", {"i": 1, "emb": [float(x) for x in range(16)]}))
    ))
    # emulate the fast-ingest representation on the stored row
    nid = next(iter(eng.store.nodes))
    eng.store.nodes[nid].props["emb"] = {
        "F64Array": array("d", [float(x) for x in range(16)])
    }
    payload = build_snapshot_payload(eng)
    assert payload["vector_blocks"], "array.array vectors must be stacked"
    eng.checkpoint()
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    out = eng2.execute(rreq(
        read_batch().var_as(
            "hit",
            g().vector_search_nodes("Doc", "emb", [float(x) for x in range(16)], 1)
            .value_map(["i"]),
        )
    ))
    assert out["hit"][0]["i"] == 1
    eng2.close()


def test_streaming_snapshot_file_read(tmp_path):
    """read_snapshot_file: framed, legacy, and corrupted files behave
    exactly like the in-memory reader without a full-blob copy."""
    import pickle

    from helix_tpu.engine.persist import (
        frame_snapshot_blob,
        read_snapshot_file,
    )

    payload = {"version": 2, "hello": [1, 2, 3]}
    blob = pickle.dumps(payload, protocol=5)
    framed = tmp_path / "framed.bin"
    framed.write_bytes(frame_snapshot_blob(blob))
    assert read_snapshot_file(framed) == payload

    legacy = tmp_path / "legacy.bin"
    legacy.write_bytes(blob)
    assert read_snapshot_file(legacy) == payload

    corrupt = bytearray(frame_snapshot_blob(blob))
    corrupt[-1] ^= 0xFF
    bad = tmp_path / "bad.bin"
    bad.write_bytes(bytes(corrupt))
    with pytest.raises(RuntimeError, match="checksum"):
        read_snapshot_file(bad)


def test_mirror_failures_are_visible(tmp_path):
    """Object-store mirror upload failures must be observable (health
    surfaces them), not silently swallowed (silent staleness = silent
    data loss on a later bootstrap-from-mirror)."""
    from helix_tpu.dsl import DynamicQueryRequest

    class Broken:
        def put(self, key, data):
            raise OSError("bucket down")

        def get(self, key):
            return None

    eng = Engine(data_dir=str(tmp_path / "n"))
    eng.persistence.snapshot_store = Broken()
    eng.execute(DynamicQueryRequest.write(
        write_batch().var_as("a", g().add_n("A"))
    ).encode())
    eng.checkpoint()
    assert eng.persistence.mirror_failures == 1
    assert "bucket down" in eng.persistence.mirror_error

    from types import SimpleNamespace

    from helix_tpu.server.routes import dispatch

    srv = SimpleNamespace(engine=eng, replica_of=None, mcp_enabled=False)
    result = dispatch(srv, "GET", "/v1/health", b"")
    assert result.payload["mirror_failures"] == 1
    assert "bucket down" in result.payload["mirror_error"]

    # a later success clears the error (count stays as history)
    class Fine:
        def put(self, key, data):
            pass

        def get(self, key):
            return None

    eng.persistence.snapshot_store = Fine()
    eng.checkpoint()
    assert eng.persistence.mirror_error is None
    assert eng.persistence.mirror_failures == 1
    eng.close()


def test_unique_edge_index_survives_recovery(tmp_path):
    """EdgeEquality {unique: true} arrives via raw wire specs; the
    checkpoint must preserve the flag or restored nodes silently accept
    duplicates the primary rejected."""
    data = tmp_path / "data"
    eng = Engine(data_dir=str(data))
    eng.execute(wreq(
        write_batch().var_as(
            "idx",
            g().create_index(
                {"EdgeEquality": {"label": "Ref", "property": "slot",
                                  "unique": True}}
            ),
        )
    ))
    eng.execute(wreq(
        write_batch()
        .var_as("a", g().add_n("N"))
        .var_as("b", g().add_n("N"))
    ))
    eng.execute(wreq(
        write_batch()
        .var_as("src", g().n_with_label("N").limit(1))
        .var_as(
            "e",
            g().n(NodeRef.var("src")).add_e("Ref", NodeRef.var("src"),
                                            {"slot": 1}),
        )
    ))
    with pytest.raises(Exception, match="unique"):
        eng.execute(wreq(
            write_batch()
            .var_as("src", g().n_with_label("N").limit(1))
            .var_as(
                "e2",
                g().n(NodeRef.var("src")).add_e("Ref", NodeRef.var("src"),
                                                {"slot": 1}),
            )
        ))
    eng.checkpoint()
    eng.persistence.close()

    eng2 = Engine(data_dir=str(data))
    with pytest.raises(Exception, match="unique"):
        eng2.execute(wreq(
            write_batch()
            .var_as("src", g().n_with_label("N").limit(1))
            .var_as(
                "e2",
                g().n(NodeRef.var("src")).add_e("Ref", NodeRef.var("src"),
                                                {"slot": 1}),
            )
        ))
    eng2.close()


def test_poisoned_wal_header_fails_loudly(tmp_path):
    """A WAL whose header is torn or not a WAL must refuse to open:
    appending past a bad header would fsync-acknowledge records that
    replay can never read (reader rejects the whole file on magic
    mismatch)."""
    bad = tmp_path / "bad.wal"
    bad.write_bytes(b"NOTAWAL!" + b"x" * 32)
    with pytest.raises(OSError):
        Wal(bad)
    torn = tmp_path / "torn.wal"
    torn.write_bytes(b"HXW")  # crash mid-header-write
    with pytest.raises(OSError):
        Wal(torn)
    # a valid header (even with a torn record tail) still opens
    good = tmp_path / "good.wal"
    w = Wal(good)
    w.append(b"rec")
    w.close()
    with open(good, "ab") as fh:
        fh.write(b"\xff\xff")
    w2 = Wal(good)
    w2.append(b"rec2")
    w2.close()

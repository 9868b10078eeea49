"""Capacity envelope (``db_max_size_gb``) enforcement.

The reference engine serves inside a provisioned size envelope
(``helix-cli/src/config.rs:203-205``, default 20 GB).  helix-tpu
enforces it at the write path: once the sampled footprint estimate
exceeds ``max_size_bytes``, write batches are rejected with a
WriteError unless they contain a reclaim step (Drop*/RemoveProperty),
so a full database can always be shrunk back under its cap.  Reads are
never affected.
"""

import pytest

from helix_tpu.dsl import SourcePredicate, g, read_batch, write_batch
from helix_tpu.engine import Engine, WriteError
from helix_tpu.engine.engine import _has_reclaim_step, _tagged_bytes


def run(engine, batch, kind, params=None, types=None):
    req = {
        "request_type": kind,
        "query_name": None,
        "query": batch.encode(),
        "parameters": params or {},
    }
    if types:
        req["parameter_types"] = types
    return engine.execute(req)


def bulk_insert(engine, count, payload_len=200):
    rows = [{"name": f"u{i}", "blob": "x" * payload_len} for i in range(count)]
    batch = write_batch().for_each_param(
        "rows",
        write_batch().var_as(
            "n",
            g().add_n("User", [
                ("name", {"Expr": {"Param": "rows.name"}}),
                ("blob", {"Expr": {"Param": "rows.blob"}}),
            ]),
        ),
    )
    run(engine, batch, "write", params={"rows": rows},
        types={"rows": {"Array": "Object"}})


def count_users(engine):
    res = run(
        engine,
        read_batch().var_as(
            "c", g().n_where(SourcePredicate.eq("$label", "User")).count()
        ).returning(["c"]),
        "read",
    )
    return res["c"]


def test_writes_rejected_past_cap():
    engine = Engine(max_size_bytes=100_000)
    bulk_insert(engine, 2000)  # ~0.5 MB of string payload
    with pytest.raises(WriteError, match="db_max_size_gb"):
        run(engine, write_batch().var_as(
            "n", g().add_n("User", {"name": "overflow"})
        ), "write")
    # reads keep working above the cap
    assert count_users(engine) == 2000


def test_reclaim_batches_stay_allowed_and_reopen_writes():
    engine = Engine(max_size_bytes=100_000)
    bulk_insert(engine, 2000)
    with pytest.raises(WriteError):
        bulk_insert(engine, 1)
    # a Drop batch is allowed above the cap...
    run(engine, write_batch().var_as(
        "gone",
        g().n_where(SourcePredicate.eq("$label", "User")).drop(),
    ), "write")
    assert count_users(engine) == 0
    # ...and once the estimate refreshes, normal writes reopen
    run(engine, write_batch().var_as(
        "n", g().add_n("User", {"name": "fresh"})
    ), "write")
    assert count_users(engine) == 1


def test_remove_property_reclaim_unwedges_writes():
    """RemoveProperty reclaims bytes without changing row counts, so the
    sampled estimate's row-drift refresh never fires — the over-cap
    check must recompute before rejecting (round-3 advisor finding)."""
    engine = Engine(max_size_bytes=100_000)
    bulk_insert(engine, 2000)  # blobs dominate the footprint
    with pytest.raises(WriteError):
        bulk_insert(engine, 1)
    # reclaim the blobs: zero rows added or removed
    run(engine, write_batch().var_as(
        "trimmed",
        g().n_where(SourcePredicate.eq("$label", "User"))
           .remove_property("blob"),
    ), "write")
    assert count_users(engine) == 2000
    # the footprint is now far under the cap; a normal write must pass
    run(engine, write_batch().var_as(
        "n", g().add_n("User", {"name": "fresh"})
    ), "write")
    assert count_users(engine) == 2001


def test_partial_drop_below_drift_threshold_unwedges_writes():
    """A Drop batch that removes fewer rows than the 128-row drift
    floor must still reopen writes once the real footprint is under
    the cap (round-3 advisor finding: the existing test dropped ALL
    rows, which cleared the threshold by accident)."""
    engine = Engine(max_size_bytes=100_000)
    bulk_insert(engine, 150, payload_len=2000)  # ~300 KB over a 100 KB cap
    with pytest.raises(WriteError):
        bulk_insert(engine, 1)
    # drop 120 of the 150 heavy rows — below the 128-row refresh
    # floor, so the cached over-cap estimate would go stale
    run(engine, write_batch().var_as(
        "gone",
        g().n_where(SourcePredicate.eq("$label", "User"))
           .range(0, 120).drop(),
    ), "write")
    assert count_users(engine) == 30
    run(engine, write_batch().var_as(
        "n", g().add_n("User", {"name": "fresh"})
    ), "write")
    assert count_users(engine) == 31


def test_unlimited_by_default():
    engine = Engine()
    bulk_insert(engine, 2000)
    run(engine, write_batch().var_as(
        "n", g().add_n("User", {"name": "more"})
    ), "write")
    assert count_users(engine) == 2001


def test_estimate_counts_vector_payloads():
    engine = Engine(max_size_bytes=1 << 40)
    batch = write_batch().for_each_param(
        "rows",
        write_batch().var_as(
            "n",
            g().add_n("Doc", [("emb", {"Expr": {"Param": "rows.emb"}})]),
        ),
    )
    rows = [{"emb": [float(i % 7)] * 128} for i in range(1500)]
    run(engine, batch, "write", params={"rows": rows},
        types={"rows": {"Array": "Object"}})
    approx = engine.approx_data_bytes()
    # 1500 rows x 128-d f64/f32 vectors: at least 4 bytes/dim each
    assert approx >= 1500 * 128 * 4
    # and not wildly above the 8-byte-per-dim ceiling + overheads
    assert approx <= 1500 * (128 * 8 + 200)


def test_reclaim_step_scan():
    drop_batch = write_batch().var_as(
        "gone", g().n_where(SourcePredicate.eq("$label", "U")).drop()
    ).encode()
    add_batch = write_batch().var_as(
        "n", g().add_n("U", {"name": "x"})
    ).encode()
    assert _has_reclaim_step(drop_batch)
    assert not _has_reclaim_step(add_batch)


def test_tagged_bytes_shapes():
    assert _tagged_bytes({"String": "abcd"}) == 20
    assert _tagged_bytes({"F32Array": [0.0] * 4}) == 32
    assert _tagged_bytes({"I64": 5}) == 16
    assert _tagged_bytes(
        {"Object": {"k": {"String": "vv"}}}
    ) == 16 + 1 + 18
    assert _tagged_bytes("not-tagged") == 16


def test_server_arg_plumbing():
    from helix_tpu.server.http_server import build_arg_parser

    args = build_arg_parser().parse_args(["--max-size-gb", "0.5"])
    assert args.max_size_gb == 0.5


def test_health_reports_capacity():
    from helix_tpu.server.routes import dispatch

    engine = Engine(max_size_bytes=100_000)
    bulk_insert(engine, 1200)

    class Srv:
        pass

    srv = Srv()
    srv.engine = engine
    srv.replica_of = None
    srv.mcp_enabled = False
    result = dispatch(srv, "GET", "/v1/health", b"")
    assert result.status == 200
    body = result.payload
    assert body["max_size_bytes"] == 100_000
    assert body["approx_data_bytes"] > 100_000


def test_recovery_and_restart_not_blocked_by_cap(tmp_path):
    """Checkpoint restore and WAL replay bypass enforcement (recovery
    must never be rejected); fresh writes stay gated after restart."""
    engine = Engine(data_dir=str(tmp_path), max_size_bytes=100_000)
    bulk_insert(engine, 2000)
    engine.close()
    e2 = Engine(data_dir=str(tmp_path), max_size_bytes=100_000)
    assert count_users(e2) == 2000
    with pytest.raises(WriteError, match="db_max_size_gb"):
        run(e2, write_batch().var_as(
            "n", g().add_n("User", {"name": "late"})
        ), "write")
    e2.close()

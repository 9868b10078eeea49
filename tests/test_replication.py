"""Read-replica replication: primary record shipping, follower catch-up,
write rejection on replicas."""

import time

import pytest

from helix_tpu.client import Client, HelixError
from helix_tpu.dsl import DynamicQueryRequest, NodeRef, g, read_batch, write_batch
from helix_tpu.server import HelixHTTPServer


@pytest.fixture
def pair():
    primary = HelixHTTPServer(host="127.0.0.1", port=0)
    primary.start()
    replica = HelixHTTPServer(
        host="127.0.0.1", port=0,
        replica_of=f"http://127.0.0.1:{primary.port}",
    )
    replica.start()
    yield primary, replica
    replica.stop()
    primary.stop()


def wait_for(predicate, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.1)
    return False


def count_users(client):
    return client.execute(DynamicQueryRequest.read(
        read_batch().var_as("n", g().n_with_label("User").count())
    ).encode())["n"]


def test_replica_follows_primary(pair):
    primary, replica = pair
    pclient = Client(f"http://127.0.0.1:{primary.port}")
    rclient = Client(f"http://127.0.0.1:{replica.port}")

    for i in range(5):
        pclient.execute(DynamicQueryRequest.write(
            write_batch()
            .var_as("u", g().add_n("User", {"i": i}))
            .var_as("e", g().n(NodeRef.var("u")).add_e("SELF", NodeRef.var("u")))
        ).encode())

    assert wait_for(lambda: count_users(rclient) == 5), (
        f"replica saw {count_users(rclient)} users, follower error: "
        f"{replica.follower.last_error}"
    )
    # Deterministic replay: same ids on both sides.
    ids_p = pclient.execute(DynamicQueryRequest.read(
        read_batch().var_as("ids", g().n_with_label("User").id())
    ).encode())["ids"]
    ids_r = rclient.execute(DynamicQueryRequest.read(
        read_batch().var_as("ids", g().n_with_label("User").id())
    ).encode())["ids"]
    assert ids_p == ids_r

    # Late writes also flow.
    pclient.execute(DynamicQueryRequest.write(
        write_batch().var_as("u", g().add_n("User", {"i": 99}))
    ).encode())
    assert wait_for(lambda: count_users(rclient) == 6)


def test_replica_rejects_writes(pair):
    primary, replica = pair
    rclient = Client(f"http://127.0.0.1:{replica.port}")
    with pytest.raises(HelixError, match="read-only replica"):
        rclient.execute(DynamicQueryRequest.write(
            write_batch().var_as("u", g().add_n("User"))
        ).encode())


def test_replication_feed_shape(pair):
    primary, _ = pair
    pclient = Client(f"http://127.0.0.1:{primary.port}")
    pclient.execute(DynamicQueryRequest.write(
        write_batch().var_as("u", g().add_n("User", {"i": 1}))
    ).encode())
    import json
    import urllib.request

    with urllib.request.urlopen(
        f"http://127.0.0.1:{primary.port}/v1/replication?after=-1"
    ) as resp:
        feed = json.loads(resp.read())
    assert feed["reseed_required"] is False
    assert feed["head_seq"] == 0
    assert feed["records"][0]["request"]["request_type"] == "write"


@pytest.mark.parametrize("seed", range(8))
def test_replication_fuzz_state_equivalence(seed):
    """Random write streams: replaying the primary's record ring into a
    fresh engine reproduces the exact store state (ids, props, edges)."""
    import numpy as np

    from helix_tpu.engine import Engine

    rng = np.random.default_rng(200 + seed)
    primary = Engine()
    for step in range(int(rng.integers(3, 15))):
        batch = write_batch()
        roll = rng.random()
        if roll < 0.5 or primary.store.node_count() == 0:
            batch = batch.var_as(
                "u",
                g().add_n(str(rng.choice(["A", "B"])), {
                    "x": int(rng.integers(0, 100)),
                    "v": [float(v) for v in rng.normal(size=4)],
                }),
            )
        elif roll < 0.75:
            ids = primary.store.node_order
            src = int(rng.choice(ids))
            dst = int(rng.choice(ids))
            batch = batch.var_as(
                "e", g().n({"Ids": [src]}).add_e("R", {"Ids": [dst]})
            )
        else:
            batch = batch.var_as(
                "m",
                g().n_with_label(str(rng.choice(["A", "B"])))
                .set_property("x", int(rng.integers(0, 100))),
            )
        primary.execute(DynamicQueryRequest.write(batch).encode())

    replica = Engine()
    records, reseed = primary.replication.since(-1, limit=10_000)
    assert not reseed
    for record in records:
        replica.apply_replicated(record["request"], record["now_ms"])

    def dump(engine):
        return engine.execute(DynamicQueryRequest.read(
            read_batch()
            .var_as("nodes", g().n().value_map())
            .var_as("edges", g().e_with_label("R").edge_properties())
        ).encode())

    assert dump(replica) == dump(primary)
    assert replica.store.save_counters() == primary.store.save_counters()


def test_replica_bootstraps_from_seed_snapshot():
    """A replica joining after the primary's ring has trimmed must
    bootstrap from GET /v1/snapshot and then tail normally."""
    primary = HelixHTTPServer(host="127.0.0.1", port=0)
    primary.engine.replication.cap = 4  # force early ring trim
    primary.start()
    try:
        pclient = Client(f"http://127.0.0.1:{primary.port}")
        pclient.execute(DynamicQueryRequest.write(
            write_batch().var_as(
                "idx", g().create_vector_index_nodes("User", "emb"))
        ).encode())
        for i in range(12):
            pclient.execute(DynamicQueryRequest.write(
                write_batch().var_as("u", g().add_n("User", {
                    "i": i, "emb": [float(i), 1.0, 0.0, 0.5]}))
            ).encode())
        records, reseed = primary.engine.replication.since(-1)
        assert reseed, "precondition: ring must have trimmed"

        replica = HelixHTTPServer(
            host="127.0.0.1", port=0,
            replica_of=f"http://127.0.0.1:{primary.port}",
        )
        replica.start()
        try:
            rclient = Client(f"http://127.0.0.1:{replica.port}")
            assert wait_for(lambda: count_users(rclient) == 12), (
                f"replica saw {count_users(rclient)} users, follower "
                f"error: {replica.follower.last_error}"
            )
            # Vector index survived the seed (hooks backfilled).
            hit = rclient.execute(DynamicQueryRequest.read(
                read_batch().var_as("h", g().vector_search_nodes(
                    "User", "emb", [11.0, 1.0, 0.0, 0.5], 1).value_map(["i"]))
            ).encode())["h"][0]["i"]
            assert hit == 11
            # Post-seed writes flow through normal tailing.
            pclient.execute(DynamicQueryRequest.write(
                write_batch().var_as("u", g().add_n("User", {
                    "i": 99, "emb": [0.0, 0.0, 1.0, 0.0]}))
            ).encode())
            assert wait_for(lambda: count_users(rclient) == 13)
            # Deterministic ids across seed + tail.
            ids_p = pclient.execute(DynamicQueryRequest.read(
                read_batch().var_as("ids", g().n_with_label("User").id())
            ).encode())["ids"]
            ids_r = rclient.execute(DynamicQueryRequest.read(
                read_batch().var_as("ids", g().n_with_label("User").id())
            ).encode())["ids"]
            assert ids_p == ids_r
        finally:
            replica.stop()
    finally:
        primary.stop()


def test_seed_unpickler_rejects_forbidden_globals():
    import pickle

    import pytest as _pytest

    from helix_tpu.engine.replication import _SeedUnpickler

    import numpy as np
    ok = {"seed_seq": 3, "payload": {"vector_blocks": {
        ("F32Array", 4): np.ones((2, 4), dtype=np.float32)}}}
    out = _SeedUnpickler.loads(pickle.dumps(ok, protocol=5))
    assert out["seed_seq"] == 3
    assert out["payload"]["vector_blocks"][("F32Array", 4)].shape == (2, 4)

    evil = pickle.dumps(pickle.loads)  # any non-numpy global
    with _pytest.raises(pickle.UnpicklingError, match="forbidden global"):
        _SeedUnpickler.loads(evil)


def test_seed_roundtrip_preserves_counters_and_routes():
    from helix_tpu.engine import Engine

    primary = Engine()
    primary.execute(DynamicQueryRequest.write(
        write_batch()
        .var_as("idx", g().create_vector_index_nodes("Doc", "v"))
        .var_as("d", g().add_n("Doc", {"v": [1.0] * 8, "t": "x"}))
        .var_as("e", g().n_with_label("Doc").add_e("SELF", NodeRef.var("d")))
    ).encode())
    primary.routes = {"q1": {"kind": "read", "query": {}, "parameters": []}}

    seed = primary.export_replica_seed()
    assert seed["seed_seq"] == 0

    replica = Engine()
    # Pre-seed garbage state must be replaced wholesale.
    replica.execute(DynamicQueryRequest.write(
        write_batch().var_as("junk", g().add_n("Junk"))
    ).encode())
    replica.load_replica_seed(seed)
    assert replica.store.save_counters() == primary.store.save_counters()
    assert replica.routes == primary.routes
    assert replica.replication.head_seq() == 0
    out = replica.execute(DynamicQueryRequest.read(
        read_batch()
        .var_as("labels", g().n().label())
        .var_as("edges", g().e_with_label("SELF").count())
    ).encode())
    assert out == {"labels": ["Doc"], "edges": 1}


def test_replica_seeds_through_native_gateway_stream():
    """Seed bootstrap over the native gateway: /v1/snapshot streams in
    chunks (close-delimited) and the follower stream-unpickles it."""
    pytest.importorskip("helix_tpu.native")
    from helix_tpu.native import NativeBuildError, load

    try:
        load()
    except NativeBuildError:  # pragma: no cover
        pytest.skip("native toolchain unavailable")
    from helix_tpu.server.native_gateway import NativeGateway

    primary = NativeGateway(host="127.0.0.1", port=0)
    primary.engine.replication.cap = 4  # force early ring trim
    primary.start()
    try:
        pclient = Client(f"http://127.0.0.1:{primary.port}")
        # seed data BEFORE the replica exists; the tiny ring trims, so
        # the replica must bootstrap from the streamed seed snapshot
        for i in range(20):
            pclient.execute(DynamicQueryRequest.write(
                write_batch().var_as("u", g().add_n("User", {"i": i}))
            ).encode())
        _, reseed = primary.engine.replication.since(-1)
        assert reseed, "precondition: ring must have trimmed"

        replica = NativeGateway(
            host="127.0.0.1", port=0,
            replica_of=f"http://127.0.0.1:{primary.port}",
        )
        replica.start()
        try:
            rclient = Client(f"http://127.0.0.1:{replica.port}")
            assert wait_for(lambda: count_users(rclient) == 20), (
                f"replica saw {count_users(rclient)}, follower error: "
                f"{replica.follower.last_error}"
            )
            # and it keeps tailing after the seed
            pclient.execute(DynamicQueryRequest.write(
                write_batch().var_as("u", g().add_n("User", {"i": 99}))
            ).encode())
            assert wait_for(lambda: count_users(rclient) == 21)
        finally:
            replica.stop(close_engine=True)
    finally:
        primary.stop(close_engine=True)


def test_since_rejects_positions_the_ring_never_issued():
    """A seq beyond the live head belongs to a previous primary epoch
    (colliding sequence space after a restart): force a reseed instead
    of silently returning an empty page forever."""
    from helix_tpu.engine.replication import ReplicationLog

    ring = ReplicationLog()
    ring.append({"i": 0}, now_ms=0)
    records, reseed = ring.since(5)
    assert reseed is True and records == []
    # exactly at head: normal empty tail, no reseed
    records, reseed = ring.since(0)
    assert reseed is False and records == []
    # an empty fresh ring tails normally from -1
    empty = ReplicationLog()
    records, reseed = empty.since(-1)
    assert reseed is False and records == []


def test_page_byte_cap_bounds_response_size():
    """Bulk-ingest records are multi-MB; one replication page stops at
    PAGE_BYTES so neither side serializes the whole ring per poll."""
    from helix_tpu.engine.replication import ReplicationLog

    ring = ReplicationLog()
    ring.PAGE_BYTES = 10_000  # instance override for the test
    for i in range(10):
        ring.append({"i": i}, now_ms=i, approx_bytes=3_000)
    page1, reseed = ring.since(-1, limit=512)
    assert not reseed
    assert [r["request"]["i"] for r in page1] == [0, 1, 2, 3]
    # the next poll picks up exactly where the capped page stopped
    page2, reseed = ring.since(page1[-1]["seq"])
    assert not reseed
    assert page2[0]["seq"] == page1[-1]["seq"] + 1
    assert [r["request"]["i"] for r in page2] == [4, 5, 6, 7]


def test_epoch_rolls_on_reset():
    from helix_tpu.engine.replication import ReplicationLog

    ring = ReplicationLog()
    first = ring.epoch
    ring.reset_to(7)
    assert ring.epoch != first
    assert ring.head_seq() == 6


def test_follower_reseeds_after_primary_epoch_change(pair):
    """A restarted primary issues a fresh (colliding) sequence space.
    The follower detects the epoch change and reseeds from the snapshot
    instead of applying new-epoch records on top of old-epoch state."""
    from helix_tpu.engine import Engine

    primary, replica = pair
    pclient = Client(f"http://127.0.0.1:{primary.port}")
    rclient = Client(f"http://127.0.0.1:{replica.port}")
    for i in range(5):
        pclient.execute(DynamicQueryRequest.write(
            write_batch().var_as("u", g().add_n("User", {"i": i}))
        ).encode())
    assert wait_for(lambda: count_users(rclient) == 5)

    # Simulate a primary restart that lost all state: replace engine
    # state wholesale with an empty seed (ring renumbers from 0 and the
    # epoch rolls, exactly like a fresh process).
    old_epoch = primary.engine.replication.epoch
    primary.engine.load_replica_seed(Engine().export_replica_seed())
    assert primary.engine.replication.epoch != old_epoch
    for i in range(2):
        pclient.execute(DynamicQueryRequest.write(
            write_batch().var_as("u", g().add_n("User", {"i": 100 + i}))
        ).encode())

    # Follower is at applied_seq=4 from the OLD epoch; the new ring's
    # head is 1.  Epoch mismatch (and the never-issued position) force
    # a reseed; the replica converges to the restarted primary's state.
    assert wait_for(lambda: count_users(rclient) == 2), (
        f"replica saw {count_users(rclient)}, follower error: "
        f"{replica.follower.last_error}"
    )
    ids_p = pclient.execute(DynamicQueryRequest.read(
        read_batch().var_as("ids", g().n_with_label("User").id())
    ).encode())["ids"]
    ids_r = rclient.execute(DynamicQueryRequest.read(
        read_batch().var_as("ids", g().n_with_label("User").id())
    ).encode())["ids"]
    assert ids_p == ids_r


def test_follower_reseeds_after_apply_failure(pair):
    """A record the replica cannot apply leaves it divergent; the
    follower must reseed from the snapshot, never skip the write."""
    primary, replica = pair
    pclient = Client(f"http://127.0.0.1:{primary.port}")
    rclient = Client(f"http://127.0.0.1:{replica.port}")

    # let the first-contact reseed finish so the write below arrives
    # through the tailing path (apply_replicated), not the seed snapshot
    assert wait_for(lambda: replica.follower.primary_epoch is not None)

    orig = replica.engine.apply_replicated
    failures = {"n": 0}

    def flaky(request, now_ms, request_bytes=None):
        if failures["n"] == 0:
            failures["n"] += 1
            raise RuntimeError("injected apply failure")
        return orig(request, now_ms, request_bytes=request_bytes)

    replica.engine.apply_replicated = flaky
    pclient.execute(DynamicQueryRequest.write(
        write_batch().var_as("u", g().add_n("User", {"i": 1}))
    ).encode())
    assert wait_for(lambda: count_users(rclient) == 1), (
        f"replica saw {count_users(rclient)}, follower error: "
        f"{replica.follower.last_error}"
    )
    assert failures["n"] == 1  # the bad apply happened exactly once


def test_ring_byte_cap_evicts_bulk_records():
    """Bulk-ingest records are multi-MB each; the ring caps retained
    BYTES, not just record count, so a burst of big writes cannot pin
    gigabytes (replicas behind the window reseed from /v1/snapshot)."""
    from helix_tpu.engine.replication import ReplicationLog

    ring = ReplicationLog(cap=1000, bytes_cap=10_000)
    for i in range(10):
        ring.append({"i": i}, now_ms=i, approx_bytes=3_000)
    # 10 x 3000 bytes > 10k cap: only the newest ~3 stay
    assert 1 <= len(ring._records) <= 4
    assert ring._records[-1]["request"] == {"i": 9}
    # a fresh reader (and anyone behind the evicted window) must reseed
    records, reseed = ring.since(-1, limit=100)
    assert reseed is True and records == []
    # a reader at the live head still tails normally
    head = ring.head_seq()
    records, reseed = ring.since(head - 1)
    assert reseed is False and [r["seq"] for r in records] == [head]
    # small records are bounded by record count as before
    ring2 = ReplicationLog(cap=5, bytes_cap=1 << 30)
    for i in range(9):
        ring2.append({"i": i}, now_ms=i, approx_bytes=10)
    assert len(ring2._records) == 5
    assert [r["request"]["i"] for r in ring2._records] == [4, 5, 6, 7, 8]


def test_cascaded_replica_chain_converges():
    """primary -> R1 -> R2: writes propagate through the chain, and a
    primary restart (epoch roll) reconverges BOTH hops — the cascaded
    case load_replica_seed's ring alignment exists for."""
    import json as _json
    import urllib.request

    from helix_tpu.dsl import DynamicQueryRequest, g, read_batch, write_batch
    from helix_tpu.server.http_server import HelixHTTPServer

    def post(port, req):
        data = _json.dumps(req).encode()
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/query", data=data,
            headers={"content-type": "application/json"}), timeout=10)
        return _json.loads(r.read())

    def count(port):
        return post(port, DynamicQueryRequest.read(
            read_batch().var_as("n", g().n_with_label("D").count())
        ).encode())["n"]

    def wait_count(port, want, timeout=25):
        deadline = time.time() + timeout
        got = -1
        while time.time() < deadline:
            got = count(port)
            if got == want:
                return got
            time.sleep(0.2)
        return got

    primary = HelixHTTPServer(host="127.0.0.1", port=0)
    primary.start()
    r1 = HelixHTTPServer(
        host="127.0.0.1", port=0,
        replica_of=f"http://127.0.0.1:{primary.port}",
    )
    r1.start()
    r2 = HelixHTTPServer(
        host="127.0.0.1", port=0,
        replica_of=f"http://127.0.0.1:{r1.port}",
    )
    r2.start()
    try:
        for i in range(5):
            post(primary.port, DynamicQueryRequest.write(
                write_batch().var_as("d", g().add_n("D", {"i": i}))
            ).encode())
        assert wait_count(r1.port, 5) == 5
        assert wait_count(r2.port, 5) == 5, (
            f"R2 stuck; r2.last_error={r2.follower.last_error}"
        )

        # primary restarts with fresh (empty, new-epoch) state: the
        # chain must reseed hop by hop and follow the new lineage
        pport = primary.port
        primary.stop()
        primary.engine.close()
        primary2 = HelixHTTPServer(host="127.0.0.1", port=pport)
        primary2.start()
        try:
            for i in range(3):
                post(pport, DynamicQueryRequest.write(
                    write_batch().var_as("d", g().add_n("D", {"i": 100 + i}))
                ).encode())
            assert wait_count(r1.port, 3) == 3, r1.follower.last_error
            assert wait_count(r2.port, 3) == 3, r2.follower.last_error
        finally:
            primary2.stop()
            primary2.engine.close()
    finally:
        for srv in (r2, r1):
            srv.stop()
            srv.engine.close()

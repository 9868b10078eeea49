"""Concurrency hammer: concurrent reads and writes must never observe
torn state or crash (single-writer + shared-readers discipline)."""

import concurrent.futures
import threading

from helix_tpu.dsl import DynamicQueryRequest, NodeRef, g, read_batch, write_batch
from helix_tpu.engine import Engine
from helix_tpu.engine.rwlock import RWLock


def test_rwlock_mutual_exclusion():
    lock = RWLock()
    state = {"readers": 0, "writing": False}
    errors = []
    guard = threading.Lock()

    def reader():
        for _ in range(200):
            with lock.read():
                with guard:
                    state["readers"] += 1
                    if state["writing"]:
                        errors.append("read during write")
                with guard:
                    state["readers"] -= 1

    def writer():
        for _ in range(50):
            with lock.write():
                with guard:
                    if state["writing"] or state["readers"]:
                        errors.append("writer not exclusive")
                    state["writing"] = True
                with guard:
                    state["writing"] = False

    threads = [threading.Thread(target=reader) for _ in range(4)] + [
        threading.Thread(target=writer) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []


def test_concurrent_reads_and_writes_consistent():
    engine = Engine()

    def write(i):
        engine.execute(DynamicQueryRequest.write(
            write_batch()
            .var_as("u", g().add_n("User", {"i": i}))
            .var_as("e", g().n(NodeRef.var("u")).add_e("SELF", NodeRef.var("u")))
        ).encode())
        return True

    read_req = DynamicQueryRequest.read(
        read_batch()
        .var_as("users", g().n_with_label("User").count())
        .var_as("edges", g().e_with_label("SELF").count())
    ).encode()

    def read(_):
        out = engine.execute(read_req)
        # Invariant: every committed user has exactly one self edge, and
        # reads never observe a half-applied batch.
        assert out["users"] == out["edges"], out
        return out["users"]

    with concurrent.futures.ThreadPoolExecutor(12) as pool:
        futures = [pool.submit(write, i) for i in range(60)]
        futures += [pool.submit(read, i) for i in range(120)]
        for future in concurrent.futures.as_completed(futures):
            future.result()

    final = engine.execute(read_req)
    assert final == {"users": 60, "edges": 60}


def test_batcher_adaptive_window_skips_wait_for_lone_request():
    """A lone request after an idle period must not pay the straggler
    window as latency (adaptive dispatch)."""
    import time

    import numpy as np

    from helix_tpu.engine.batching import DynamicBatcher

    class FakePartition:
        def search_many(self, queries, k):
            n = queries.shape[0]
            return (np.zeros((n, k), dtype=np.int64),
                    np.zeros((n, k), dtype=np.float32))

    batcher = DynamicBatcher(window_s=0.5)  # punitive window
    q = np.zeros(4, dtype=np.float32)
    t0 = time.perf_counter()
    batcher.submit(FakePartition(), q, 3)
    lone_latency = time.perf_counter() - t0
    assert lone_latency < 0.25, (
        f"lone request paid the straggler window: {lone_latency:.3f}s"
    )


def test_hammer_appends_patches_and_scans():
    """Concurrent bulk appends, property patches, and filtered scans
    over the incremental-snapshot machinery: reads must always observe
    a committed prefix (count is a multiple of the batch size) and
    patched values must never tear (age is always one of the two
    committed constants)."""
    engine = Engine(secondary_indices=["P.key"])
    seed = DynamicQueryRequest.write(
        write_batch().var_as(
            "p", g().add_n("P", {"key": "k0", "age": 1})
        )
    ).encode()
    engine.execute(seed)

    def append(i):
        batch = write_batch()
        for j in range(10):
            batch = batch.var_as(
                f"p{j}", g().add_n("P", {"key": f"a{i}-{j}", "age": 1})
            )
        engine.execute(DynamicQueryRequest.write(batch).encode())

    def patch(i):
        engine.execute({
            "request_type": "write", "query_name": "u",
            "query": {"queries": [{"Query": {"name": "s", "steps": [
                {"NWhere": {"And": [
                    {"Eq": ["$label", {"String": "P"}]},
                    {"Eq": ["key", {"String": "k0"}]},
                ]}},
                {"SetProperty": ["age", {"Value": {"I64": 1 if i % 2 else 7}}]}],
                "condition": None}}], "returns": []},
            "parameters": {}, "parameter_types": {}})

    def scan(_):
        out = engine.execute({
            "request_type": "read", "query_name": "r",
            "query": {"queries": [
                {"Query": {"name": "total", "steps": [
                    {"NWhere": {"Eq": ["$label", {"String": "P"}]}},
                    "Count"], "condition": None}},
                {"Query": {"name": "aged", "steps": [
                    {"NWhere": {"And": [
                        {"Eq": ["$label", {"String": "P"}]},
                        {"Eq": ["key", {"String": "k0"}]},
                    ]}}, {"Values": ["age"]}], "condition": None}},
            ], "returns": ["total", "aged"]},
            "parameters": {}, "parameter_types": {}})
        assert (out["total"] - 1) % 10 == 0, out
        assert out["aged"] in ([1], [7]), out

    with concurrent.futures.ThreadPoolExecutor(10) as pool:
        futures = [pool.submit(append, i) for i in range(40)]
        futures += [pool.submit(patch, i) for i in range(60)]
        futures += [pool.submit(scan, i) for i in range(150)]
        for future in concurrent.futures.as_completed(futures):
            future.result()
    final = engine.execute({
        "request_type": "read", "query_name": "r",
        "query": {"queries": [{"Query": {"name": "c", "steps": [
            {"NWhere": {"Eq": ["$label", {"String": "P"}]}}, "Count"],
            "condition": None}}], "returns": ["c"]},
        "parameters": {}, "parameter_types": {}})
    assert final["c"] == 401

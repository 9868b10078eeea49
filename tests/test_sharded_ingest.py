"""Ingest-while-sharded: mutation under the mesh serving paths.

Round-4 verdict item 9: the dryrun certified sharded *reads*; this
drives the write/refresh cycle — AddN + vector writes -> shard refresh
(matrix.version bump re-shards on the next search) -> search/traversal
parity vs a single-device engine, plus tombstone flow (Drop) through
the sharded candidate filter.  Runs on the 8-virtual-device CPU mesh
(tests/conftest.py).
"""

import json

import numpy as np
import pytest

from helix_tpu.dsl import g, read_batch, write_batch
from helix_tpu.engine import Engine

DIM = 16


def _ingest(eng: Engine, rng: np.random.Generator, count: int = 211) -> None:
    wb = write_batch().var_as(
        "ix", g().create_vector_index_nodes("Doc", "emb")
    )
    for i in range(count):  # prime: ragged over every shard split
        wb = wb.var_as(f"n{i}", g().add_n("Doc", {
            "i": int(i),
            "emb": [float(x) for x in rng.normal(size=DIM)],
        }))
    eng.execute({"request_type": "write", "query_name": None,
                 "query": wb.encode(), "parameters": {}})
    ids = eng.execute({
        "request_type": "read", "query_name": None,
        "query": read_batch().var_as(
            "u", g().n_with_label("Doc").id()
        ).returning(["u"]).encode(),
        "parameters": {},
    })["u"]
    eb = write_batch()
    for j in range(400):
        a, b = rng.integers(0, count, 2)
        eb = eb.var_as(f"e{j}", g().n({"Ids": [ids[a]]}).add_e(
            "REL", {"Ids": [ids[b]]}
        ))
    eng.execute({"request_type": "write", "query_name": None,
                 "query": eb.encode(), "parameters": {}})


def _vsearch(eng: Engine, q, k: int = 5) -> list[dict]:
    out = eng.execute({
        "request_type": "read", "query_name": None,
        "query": read_batch().var_as(
            "hits",
            g().vector_search_nodes(
                "Doc", "emb", [float(x) for x in q], k
            ).value_map(["$id", "i"]),
        ).returning(["hits"]).encode(),
        "parameters": {},
    })
    return out["hits"]


def _hybrid(eng: Engine, q) -> dict:
    return eng.execute({
        "request_type": "read", "query_name": None,
        "query": read_batch().var_as(
            "rows",
            g().vector_search_nodes(
                "Doc", "emb", [float(x) for x in q], 5
            ).out("REL").value_map(["i"]),
        ).returning(["rows"]).encode(),
        "parameters": {},
    })


@pytest.fixture
def engines():
    sharded = Engine(shard_threshold=1, graph_shard_threshold=1)
    exact = Engine()
    rng_a, rng_b = np.random.default_rng(5), np.random.default_rng(5)
    _ingest(sharded, rng_a)
    _ingest(exact, rng_b)
    yield sharded, exact
    sharded.close()
    exact.close()


def _part(eng: Engine):
    return next(iter(eng.vectors.indexes.values())).partitions[("",)]


def test_ingest_refreshes_shards_and_keeps_parity(engines):
    sharded, exact = engines
    qrng = np.random.default_rng(31)
    q = qrng.normal(size=DIM)

    # pre-mutation: sharded reads serve and match
    assert _vsearch(sharded, q) == _vsearch(exact, q)
    part = _part(sharded)
    assert part._shard_state is not None, "sharded path never engaged"
    version_before = part._shard_state["version"]

    # mutation round on BOTH engines: new docs with vectors + edges
    new_vecs = qrng.normal(size=(23, DIM))
    for eng in (sharded, exact):
        wb = write_batch()
        for i, vec in enumerate(new_vecs):
            wb = wb.var_as(f"m{i}", g().add_n("Doc", {
                "i": 1000 + i,
                "emb": [float(x) for x in vec],
            }))
        eng.execute({"request_type": "write", "query_name": None,
                     "query": wb.encode(), "parameters": {}})

    # a query vector AT a new embedding must now hit the new doc, and
    # the sharded engine must have re-sharded (version advanced)
    got = _vsearch(sharded, new_vecs[7], k=1)
    assert got[0]["i"] == 1007, got
    assert got == _vsearch(exact, new_vecs[7], k=1)
    state = _part(sharded)._shard_state
    assert state is not None and state["version"] != version_before, (
        "matrix mutation did not refresh the shard state"
    )
    assert state["version"] == _part(sharded).matrix.version

    # full parity sweep post-mutation
    for qi in range(4):
        q2 = qrng.normal(size=DIM)
        assert _vsearch(sharded, q2) == _vsearch(exact, q2)
        assert json.dumps(_hybrid(sharded, q2)) == \
            json.dumps(_hybrid(exact, q2))


def test_tombstone_flows_through_sharded_search(engines):
    sharded, exact = engines
    qrng = np.random.default_rng(77)
    q = qrng.normal(size=DIM)
    top = _vsearch(sharded, q, k=1)[0]
    assert top == _vsearch(exact, q, k=1)[0]

    # drop the top hit on both engines
    for eng in (sharded, exact):
        eng.execute({
            "request_type": "write", "query_name": None,
            "query": write_batch().var_as(
                "d", g().n({"Ids": [top["$id"]]}).drop()
            ).encode(),
            "parameters": {},
        })

    got_s = _vsearch(sharded, q)
    got_e = _vsearch(exact, q)
    assert got_s == got_e
    assert top["$id"] not in [h["$id"] for h in got_s], (
        "tombstoned id leaked through the sharded candidate filter"
    )


def test_edge_writes_refresh_sharded_traversal(engines):
    sharded, exact = engines
    qrng = np.random.default_rng(13)
    q = qrng.normal(size=DIM)
    before_s = json.dumps(_hybrid(sharded, q))
    assert before_s == json.dumps(_hybrid(exact, q))

    # wire fresh edges out of the CURRENT top hits on both engines, on
    # a label the prior graph never used (proves label-table refresh
    # too, not just adjacency rebuild)
    hit_ids = [h["$id"] for h in _vsearch(sharded, q)]
    assert hit_ids == [h["$id"] for h in _vsearch(exact, q)]
    for eng in (sharded, exact):
        eb = write_batch()
        for j, hid in enumerate(hit_ids):
            eb = eb.var_as(f"e{j}", g().n({"Ids": [hid]}).add_e(
                "FRESH", {"Ids": [hit_ids[(j + 1) % len(hit_ids)]]}
            ))
        eng.execute({"request_type": "write", "query_name": None,
                     "query": eb.encode(), "parameters": {}})

    fresh = read_batch().var_as(
        "rows",
        g().vector_search_nodes(
            "Doc", "emb", [float(x) for x in q], 5
        ).out("FRESH").value_map(["i"]),
    ).returning(["rows"])
    req = {"request_type": "read", "query_name": None,
           "query": fresh.encode(), "parameters": {}}
    got = sharded.execute(req)
    want = exact.execute(req)
    assert json.dumps(got) == json.dumps(want)
    assert len(got["rows"]) == len(hit_ids), "new edges not traversed"

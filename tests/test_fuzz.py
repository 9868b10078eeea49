"""Invariant fuzzing: random graphs x random step chains.

No second interpreter — instead the engine is checked against itself
through metamorphic invariants that must hold for every query:

- terminal consistency: Count == len(Id) == len(ValueMap(None))
- Dedup is idempotent; Limit(n) caps at n; Skip+keep partitions
- Within(v) + Without(v) partition the stream exactly
- Union over (A, B) counts = count(A) + count(B)
- a failing write batch leaves the store byte-identical
- every response is JSON-serializable
"""

import json

import numpy as np
import pytest

from helix_tpu.dsl import (
    DynamicQueryRequest, Predicate, SourcePredicate, g, read_batch, sub,
    write_batch,
)
from helix_tpu.engine import Engine

LABELS = ["User", "Post", "Tag"]
EDGE_LABELS = ["FOLLOWS", "LIKES", "TAGGED"]
PROPS = ["age", "score", "name", "flag"]


def random_engine(rng: np.random.Generator) -> Engine:
    engine = Engine()
    n = int(rng.integers(5, 40))
    batch = write_batch()
    for i in range(n):
        props = {}
        if rng.random() < 0.8:
            props["age"] = int(rng.integers(0, 80))
        if rng.random() < 0.6:
            props["score"] = float(np.round(rng.random() * 10, 3))
        if rng.random() < 0.7:
            props["name"] = f"name{int(rng.integers(0, 12))}"
        if rng.random() < 0.4:
            props["flag"] = bool(rng.random() < 0.5)
        batch = batch.var_as(
            f"n{i}", g().add_n(str(rng.choice(LABELS)), props)
        )
    engine.execute(DynamicQueryRequest.write(batch).encode())
    ids = list(range(1, n + 1))
    edges = write_batch()
    for j in range(int(rng.integers(0, n * 3))):
        src, dst = int(rng.choice(ids)), int(rng.choice(ids))
        edges = edges.var_as(
            f"e{j}",
            g().n({"Ids": [src]}).add_e(str(rng.choice(EDGE_LABELS)), {"Ids": [dst]}),
        )
    if edges.queries:
        engine.execute(DynamicQueryRequest.write(edges).encode())
    return engine


def random_traversal(rng: np.random.Generator):
    """Random well-kinded step chain (mirrors the builder typestate the
    reference enforces at compile time)."""
    t = g()
    roll = rng.random()
    kind = "nodes"
    if roll < 0.4:
        t = t.n_with_label(str(rng.choice(LABELS)))
    elif roll < 0.6:
        t = t.n()
    elif roll < 0.8:
        t = t.n_where(SourcePredicate.gt("age", int(rng.integers(0, 60))))
    else:
        t = t.e_with_label(str(rng.choice(EDGE_LABELS)))
        kind = "edges"
    for _ in range(int(rng.integers(0, 4))):
        step = rng.random()
        if step < 0.25 and kind == "edges":
            t = t.out_n() if rng.random() < 0.5 else t.in_n()
            kind = "nodes"
        elif step < 0.25:
            label = str(rng.choice(EDGE_LABELS)) if rng.random() < 0.7 else None
            t = t.out(label) if rng.random() < 0.5 else t.in_(label)
        elif step < 0.45:
            prop = str(rng.choice(PROPS))
            t = t.where(Predicate.gt(prop, int(rng.integers(0, 50)))
                        if prop in ("age", "score")
                        else Predicate.is_not_null(prop))
        elif step < 0.55:
            t = t.dedup()
        elif step < 0.65:
            t = t.limit(int(rng.integers(0, 10)))
        elif step < 0.75:
            t = t.skip(int(rng.integers(0, 5)))
        elif step < 0.85:
            t = t.order_by(str(rng.choice(["age", "score", "name"])),
                           "Asc" if rng.random() < 0.5 else "Desc")
        elif kind == "nodes":
            t = t.union([sub().out(None), sub().in_(None)])
    return t


def run_read(engine, batch):
    return engine.execute(DynamicQueryRequest.read(batch).encode())


@pytest.mark.parametrize("seed", range(25))
def test_terminal_consistency(seed):
    rng = np.random.default_rng(seed)
    engine = random_engine(rng)
    t = random_traversal(rng)
    out = run_read(
        engine,
        read_batch()
        .var_as("count", t.count())
        .var_as("ids", t.id())
        .var_as("rows", t.value_map()),
    )
    assert out["count"] == len(out["ids"]) == len(out["rows"])
    json.dumps(out)  # serializable

    # Dedup idempotence.
    out2 = run_read(
        engine,
        read_batch()
        .var_as("once", t.dedup().count())
        .var_as("twice", t.dedup().dedup().count()),
    )
    assert out2["once"] == out2["twice"] <= out["count"]

    # Limit caps; Skip partitions.
    out3 = run_read(
        engine,
        read_batch()
        .var_as("limited", t.limit(3).count())
        .var_as("skipped", t.skip(3).count()),
    )
    assert out3["limited"] == min(3, out["count"])
    assert out3["limited"] + out3["skipped"] == out["count"]


@pytest.mark.parametrize("seed", range(25, 40))
def test_within_without_partition(seed):
    rng = np.random.default_rng(seed)
    engine = random_engine(rng)
    label = str(rng.choice(LABELS))
    out = run_read(
        engine,
        read_batch()
        .var_as("marked", g().n_with_label(label))
        .var_as("inside", g().n().within("marked").count())
        .var_as("outside", g().n().without("marked").count())
        .var_as("total", g().n().count()),
    )
    assert out["inside"] + out["outside"] == out["total"]


@pytest.mark.parametrize("seed", range(40, 50))
def test_union_counts_add(seed):
    rng = np.random.default_rng(seed)
    engine = random_engine(rng)
    out = run_read(
        engine,
        read_batch()
        .var_as(
            "union",
            g().n().union([sub().out("FOLLOWS"), sub().in_("LIKES")]).count(),
        )
        .var_as("a", g().n().out("FOLLOWS").count())
        .var_as("b", g().n().in_("LIKES").count()),
    )
    assert out["union"] == out["a"] + out["b"]


@pytest.mark.parametrize("seed", range(50, 60))
def test_failed_write_leaves_store_unchanged(seed):
    rng = np.random.default_rng(seed)
    engine = random_engine(rng)

    def snapshot():
        return json.dumps(
            run_read(engine, read_batch().var_as("all", g().n().value_map())),
            sort_keys=True,
        ), engine.store.save_counters()

    before = snapshot()
    bad = (
        write_batch()
        .var_as("ok", g().add_n("User", {"age": 1}))
        .var_as("boom", g().n({"Var": "ok"}).add_e("X", {"Ids": [999999]}))
    )
    with pytest.raises(Exception):
        engine.execute(DynamicQueryRequest.write(bad).encode())
    assert snapshot() == before


@pytest.mark.parametrize("seed", range(60, 70))
def test_order_by_is_sorted(seed):
    rng = np.random.default_rng(seed)
    engine = random_engine(rng)
    out = run_read(
        engine,
        read_batch().var_as(
            "ages",
            g().n().where(Predicate.is_not_null("age")).order_by("age", "Asc").values(["age"]),
        ),
    )
    ages = out["ages"]
    assert ages == sorted(ages)

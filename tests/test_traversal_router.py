"""Measured-cost traversal routing (device vs native CSR sweep).

Round 3 routed device-first on backend identity; the bench then caught
a config where the device path measured slower than the host sweep.
The router picks by measured EWMA cost, with warm-up exclusion and
periodic exploration (round-4 verdict item 3).
"""

import numpy as np
import pytest

from helix_tpu.engine.exec import TraversalRouter


def test_forced_modes(monkeypatch):
    router = TraversalRouter()
    monkeypatch.setenv("HELIX_TRAVERSAL_BACKEND", "device")
    assert router.choose(True, True) == "device"
    monkeypatch.setenv("HELIX_TRAVERSAL_BACKEND", "native")
    assert router.choose(True, True) == "native"


def test_unavailable_path_never_chosen(monkeypatch):
    monkeypatch.delenv("HELIX_TRAVERSAL_BACKEND", raising=False)
    router = TraversalRouter()
    assert router.choose(False, True) == "native"
    assert router.choose(True, False) == "device"


def test_bootstrap_samples_both_then_picks_cheaper(monkeypatch):
    monkeypatch.delenv("HELIX_TRAVERSAL_BACKEND", raising=False)
    router = TraversalRouter()
    seen = set()
    # bootstrap: each path runs until it has a recorded (post-warmup)
    # sample; feed two runs per path (first is warm-up, discarded)
    for _ in range(8):
        path = router.choose(True, True)
        seen.add(path)
        router.record(path, 0.010 if path == "device" else 0.002)
        if len(router.ewma) == 2:
            break
    assert seen == {"device", "native"}
    # native measured 5x cheaper: it must win from here
    assert router.choose(True, True) == "native"


def test_warmup_run_not_recorded():
    router = TraversalRouter()
    router.record("device", 30.0)  # compile-dominated first run
    assert "device" not in router.ewma
    router.record("device", 0.001)
    assert router.ewma["device"] == pytest.approx(1.0)


def test_exploration_resamples_loser(monkeypatch):
    monkeypatch.delenv("HELIX_TRAVERSAL_BACKEND", raising=False)
    router = TraversalRouter()
    for path, ms in (("device", 1.0), ("native", 5.0)):
        router.record(path, 0.0)        # warm-up
        router.record(path, ms / 1000)  # recorded sample
    choices = [router.choose(True, True) for _ in range(router.EXPLORE_EVERY)]
    assert choices.count("native") == 1  # exactly one exploration probe
    assert choices.count("device") == router.EXPLORE_EVERY - 1


def test_route_can_flip_when_conditions_change(monkeypatch):
    monkeypatch.delenv("HELIX_TRAVERSAL_BACKEND", raising=False)
    router = TraversalRouter()
    for path, ms in (("device", 1.0), ("native", 3.0)):
        router.record(path, 0.0)
        router.record(path, ms / 1000)
    assert router.choose(True, True) == "device"
    # device path degrades (e.g. snapshot outgrew HBM scratch): the
    # EWMA crosses over and the route flips
    for _ in range(10):
        router.record("device", 0.020)
    assert router.choose(True, True) == "native"


def test_engine_traversal_identical_under_both_routes(monkeypatch):
    """The two backends must agree bit-for-bit on the served result."""
    from helix_tpu.dsl import Predicate, SourcePredicate, g, read_batch, write_batch
    from helix_tpu.engine import Engine

    def build():
        eng = Engine()
        rng = np.random.default_rng(3)
        batch = write_batch()
        for i in range(200):
            batch = batch.var_as(f"n{i}", g().add_n("User", {"i": int(i)}))
        eng.execute({"request_type": "write", "query_name": None,
                     "query": batch.encode(), "parameters": {}})
        ids = eng.execute({
            "request_type": "read", "query_name": None,
            "query": read_batch().var_as(
                "u", g().n_with_label("User").id()
            ).returning(["u"]).encode(),
            "parameters": {},
        })["u"]
        eb = write_batch()
        for j in range(600):
            a, b = rng.integers(0, 200, 2)
            eb = eb.var_as(
                f"e{j}",
                g().n({"Ids": [ids[a]]}).add_e("FOLLOWS", {"Ids": [ids[b]]}),
            )
        eng.execute({"request_type": "write", "query_name": None,
                     "query": eb.encode(), "parameters": {}})
        return eng

    query = read_batch().var_as(
        "c",
        g().n_where(SourcePredicate.eq("$label", "User"))
           .out("FOLLOWS").out("FOLLOWS")
           .where_(Predicate.lt("i", 150))
           .dedup().count(),
    ).returning(["c"])
    results = {}
    for mode in ("native", "device"):
        monkeypatch.setenv("HELIX_TRAVERSAL_BACKEND", mode)
        eng = build()
        results[mode] = eng.execute({
            "request_type": "read", "query_name": None,
            "query": query.encode(), "parameters": {},
        })["c"]
    assert results["native"] == results["device"]
    assert results["native"] > 0

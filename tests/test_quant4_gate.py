"""Recall-safety gate for the int4 residency rung.

Round-4 verdict item 1: at 10M rows the int4 rung served recall 0.8637
while the budget gate happily routed into it.  The gate now refuses the
rung whenever the scale-aware candidate pool (the auto-laddered
ef_search analog, ``ops/quant4.recall_safe_pool_int4``) exceeds
``INT4_MAX_POOL`` — the budget walk skips to host-IVF, which holds the
floor.  An explicit ``quant_candidates`` override re-enables it.
"""

import jax
import numpy as np
import pytest

from helix_tpu.engine.vector import Partition
from helix_tpu.ops import quant4
from helix_tpu.ops.quant4 import recall_safe_pool_int4


def test_pool_rule_is_scale_aware():
    # floor at small n, linear growth past it (calibration anchors in
    # the docstring: 1e6 -> ~1k, 1e7 -> ~10k)
    assert recall_safe_pool_int4(10_000) == 320
    assert recall_safe_pool_int4(1_000_000) == 976
    assert recall_safe_pool_int4(10_000_000) == 9765
    assert recall_safe_pool_int4(100_000, k=16) == 512


def _partition(n=4096, d=16, budget_rows_factor=1.0):
    rng = np.random.default_rng(3)
    part = Partition("cosine")
    data = rng.normal(size=(n, d)).astype(np.float32)
    part.add_bulk(list(range(1, n + 1)), data)
    # budget: fits int4 (dim_pad/2 + 4 per row) but not int8
    dim_pad = part.matrix.dim_pad
    part.hbm_budget_bytes = int(
        n * (dim_pad // 2 + 4) * budget_rows_factor
    )
    return part


@pytest.fixture
def single_device(monkeypatch):
    # conftest provisions 8 virtual devices; the int4 rung only exists
    # single-device (a mesh serves it via sharded int8)
    dev = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **kw: [dev])
    return dev


def test_gate_serves_when_pool_safe(single_device):
    part = _partition()
    assert part._use_quant4()
    assert not part._use_host_ivf()


def test_gate_refuses_past_pool_cap(single_device, monkeypatch):
    part = _partition()
    # shrink the cap below the needed pool instead of building 17M rows
    monkeypatch.setattr(quant4, "INT4_MAX_POOL", 64)
    assert recall_safe_pool_int4(part.matrix.n) > 64
    assert not part._use_quant4(), (
        "gate served int4 past the recall-safe pool cap"
    )
    # the budget walk lands on host-IVF (recall-safe), not nothing
    assert part._use_host_ivf()


def test_explicit_override_reenables(single_device, monkeypatch):
    part = _partition()
    monkeypatch.setattr(quant4, "INT4_MAX_POOL", 64)
    part.quant_candidates = recall_safe_pool_int4(part.matrix.n)
    assert part._use_quant4(), "operator override must win"
    assert not part._use_host_ivf()
    # an override NARROWER than the safe pool does not re-enable
    part.quant_candidates = 32
    assert not part._use_quant4()


def test_mesh_serves_via_sharded_int8():
    """On a multi-device mesh the rung routes to sharded int8 — the
    int4 pool rule must not push mesh serving to host-IVF."""
    part = _partition()
    assert len(jax.devices()) > 1  # conftest mesh
    assert part._use_quant4()
    assert not part._use_host_ivf()


def test_search_results_stay_recall_safe(single_device):
    """End-to-end through search_many on the int4 tier at the
    scale-aware pool: recall vs the exact oracle holds the floor."""
    rng = np.random.default_rng(11)
    n, d, k = 5000, 32, 10
    part = Partition("cosine")
    centers = rng.normal(size=(50, d)).astype(np.float32)
    data = centers[rng.integers(0, 50, n)] + \
        0.3 * rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    part.add_bulk(list(range(1, n + 1)), data)
    dim_pad = part.matrix.dim_pad
    part.hbm_budget_bytes = int(n * (dim_pad // 2 + 4))
    assert part._use_quant4()
    qs = centers[rng.integers(0, 50, 32)] + \
        0.3 * rng.normal(size=(32, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    ids, dists = part.search_many(qs, k)
    sims = qs @ data.T
    oracle = np.argsort(-sims, axis=1)[:, :k] + 1  # ids are 1-based
    recall = np.mean([
        len(set(ids[i].tolist()) & set(oracle[i].tolist())) / k
        for i in range(len(qs))
    ])
    assert recall >= 0.95, recall

"""int8 rung with on-device f16 re-rank (ops/quant.py
device_rerank_topk): distance/position contract vs the f32 oracle and
the host re-rank path, tombstone + sentinel handling, live-mask cache
invalidation, and the Partition budget predicate that selects it."""

import numpy as np
import pytest

from helix_tpu.engine.vector import Partition
from helix_tpu.ops.distance import PackedMatrix
from helix_tpu.ops.quant import QuantizedResident, device_rerank_topk

pytest.importorskip("helix_tpu.native")
from helix_tpu.native import NativeBuildError, load

try:
    load()
except NativeBuildError:  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def clustered(rng, n, d, n_clusters=50):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    data = centers[assign] + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True) + 1e-9
    return data, centers


def _queries(rng, centers, b, d):
    qs = centers[rng.integers(0, len(centers), size=b)] + 0.3 * rng.normal(
        size=(b, d)
    ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return qs


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_device_rerank_matches_f32_oracle(metric):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, d, b, kc, k = 500, 64, 8, 32, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    if metric == "cosine":
        data /= np.linalg.norm(data, axis=1, keepdims=True)
    qs = rng.normal(size=(b, d)).astype(np.float32)
    cand = np.stack([
        rng.choice(n, size=kc, replace=False) for _ in range(b)
    ]).astype(np.int32)
    live = np.ones(n, np.uint8)
    sq = np.einsum("nd,nd->n", data, data).astype(np.float32)

    dists, pos = device_rerank_topk(
        jnp.asarray(data, jnp.bfloat16), jnp.asarray(sq), jnp.asarray(qs),
        jnp.asarray(cand), jnp.asarray(live), jnp.int32(n),
        k=k, metric=metric,
    )
    dists = np.asarray(dists)
    pos = np.asarray(pos)

    # oracle: exact f32 over the SAME candidate pool
    for i in range(b):
        rows = data[cand[i]]
        if metric == "cosine":
            od = 1.0 - rows @ qs[i]
        else:
            od = np.sum((rows - qs[i]) ** 2, axis=1)
        order = np.argsort(od)[:k]
        want = cand[i][order]
        # f16 row storage can swap near-ties; compare as sets and check
        # distance fidelity against exact f32 per returned position
        assert set(pos[i]) == set(want), (pos[i], want)
        got_rows = data[pos[i]]
        if metric == "cosine":
            exact = 1.0 - np.einsum("kd,d->k", got_rows, qs[i])
        else:
            exact = np.sum((got_rows - qs[i]) ** 2, axis=1)
        assert np.allclose(dists[i], exact, rtol=2e-2, atol=2e-2)
        assert (np.diff(dists[i]) >= -1e-6).all()


def test_device_rerank_sentinels_and_tombstones():
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    n, d, k = 40, 16, 6
    data = rng.normal(size=(n, d)).astype(np.float32)
    qs = rng.normal(size=(2, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", data, data).astype(np.float32)
    live = np.ones(n, np.uint8)
    live[[3, 5, 7]] = 0
    # pool mixes live, dead, -1 padding, and out-of-range junk
    cand = np.array([
        [0, 3, 5, 7, -1, n + 9, 1, 2],
        [3, 5, 7, -1, -1, -1, -1, -1],     # only dead/padding -> all ragged
    ], np.int32)
    dists, pos = device_rerank_topk(
        jnp.asarray(data, jnp.bfloat16), jnp.asarray(sq), jnp.asarray(qs),
        jnp.asarray(cand), jnp.asarray(live), jnp.int32(n), k=k,
    )
    dists = np.asarray(dists)
    pos = np.asarray(pos)
    valid0 = pos[0][pos[0] >= 0]
    assert set(valid0) == {0, 1, 2}          # dead/junk never surface
    assert (dists[0][3:] == np.inf).all() and (pos[0][3:] == -1).all()
    assert (pos[1] == -1).all() and (dists[1] == np.inf).all()


def test_quantized_resident_device_vs_host_rerank():
    rng = np.random.default_rng(9)
    n, d, b, k = 6_000, 64, 16, 10
    data, centers = clustered(rng, n, d)
    matrix = PackedMatrix(d, "cosine")
    matrix.extend(data)
    qs = _queries(rng, centers, b, d)
    live = np.ones(n, bool)
    live[::97] = False                        # scattered tombstones

    qr = QuantizedResident()
    dh, ph = qr.search(matrix, qs, k, live, "cosine")
    dd, pd = qr.search(matrix, qs, k, live, "cosine", rerank_device=True)
    assert pd.shape == (b, k)
    for i in range(b):
        hs, ds = set(ph[i][ph[i] >= 0]), set(pd[i][pd[i] >= 0])
        # same candidate pool, same live mask: near-tie swaps only
        assert len(hs & ds) >= k - 1, (hs, ds)
        assert not any(live[p] == False for p in ds)  # noqa: E712
    # distances are f16-row exact: close to the host f32 re-rank
    assert np.allclose(dd, dh, rtol=2e-2, atol=2e-2)


def test_device_live_mask_cache_invalidation():
    rng = np.random.default_rng(10)
    n, d, k = 2_000, 32, 5
    data, centers = clustered(rng, n, d)
    matrix = PackedMatrix(d, "cosine")
    matrix.extend(data)
    live = np.ones(n, bool)
    qr = QuantizedResident()
    q = data[123:124]                        # query = an exact row
    _, pos = qr.search(matrix, q, k, live, "cosine", rerank_device=True)
    assert 123 in set(pos[0])
    # tombstone the hit the way Partition.remove does (overwrite bumps
    # the matrix version, which keys both device caches)
    live[123] = False
    matrix.overwrite(123, None)
    _, pos2 = qr.search(matrix, q, k, live, "cosine", rerank_device=True)
    assert 123 not in set(pos2[0])


def test_partition_rerank_mode_predicate(monkeypatch):
    rng = np.random.default_rng(11)
    n, d = 4_000, 64
    data, _ = clustered(rng, n, d)
    dim_pad = 128
    # budget fits int8 + f16 (3 B/dim) but not exact (6 B/dim)
    budget = int(n * dim_pad * 4)
    part = Partition("cosine", hbm_budget_bytes=budget)
    for i, row in enumerate(data):
        part.add(i + 1, row)
    assert part._use_quant()
    assert part._quant_rerank_device()
    monkeypatch.setenv("HELIX_QUANT_RERANK", "host")
    assert not part._quant_rerank_device()
    monkeypatch.delenv("HELIX_QUANT_RERANK")
    # budget fits int8 but not the f16 re-rank copy -> host re-rank
    part.hbm_budget_bytes = int(n * dim_pad * 2)
    assert part._use_quant()
    assert not part._quant_rerank_device()
    monkeypatch.setenv("HELIX_QUANT_RERANK", "device")
    assert part._quant_rerank_device()


# -- mesh-sharded device re-rank (8-device CPU mesh via conftest) --------


def _partition_corpus(seed, n, d, metric="cosine"):
    rng = np.random.default_rng(seed)
    data, centers = clustered(rng, n, d)
    dim_pad = 128
    budget = int(n * dim_pad * 2)        # int8 fits, exact doesn't
    part = Partition(metric, hbm_budget_bytes=budget)
    for i, row in enumerate(data):
        part.add(i + 1, row)
    qs = _queries(rng, centers, 12, d)
    return part, data, qs


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_sharded_device_vs_host_rerank_parity(monkeypatch, metric):
    import jax

    assert len(jax.devices()) > 1   # conftest mesh
    part, data, qs = _partition_corpus(20, 5_000, 64, metric)
    part._live[50:60] = False       # tombstones cross the parity too
    part._n_live -= 10
    part.matrix.version += 1        # what Partition.remove would do
    k = 8
    monkeypatch.setenv("HELIX_QUANT_RERANK", "host")
    ids_h, d_h = part.search_many(qs, k)
    part._shard_state = None        # searcher caches are mode-specific
    monkeypatch.setenv("HELIX_QUANT_RERANK", "device")
    ids_d, d_d = part.search_many(qs, k)
    assert ids_d.shape == ids_h.shape
    for i in range(len(qs)):
        hs, ds = set(ids_h[i]) - {0}, set(ids_d[i]) - {0}
        assert len(hs & ds) >= k - 1, (hs, ds)   # f16 near-tie swaps only
        for e in ds:
            assert part._live[part.pos[e]]
    assert np.allclose(d_d, d_h, rtol=2e-2, atol=2e-2)


def test_sharded_per_chip_predicate():
    part, _, _ = _partition_corpus(21, 4_000, 64)
    # whole-corpus f16+int8 exceeds the budget, but 1/8th per chip fits
    assert not part._quant_rerank_device()
    assert part._quant_rerank_device_sharded(8)
    assert not part._quant_rerank_device_sharded(1)

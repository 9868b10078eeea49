"""int8 quantized residency tier (ops/quant.py): recall vs the f32
oracle, tier gating between exact / int8 / host-IVF, and correctness
through the engine partition."""

import numpy as np
import pytest

from helix_tpu.engine.vector import Partition
from helix_tpu.ops.distance import PackedMatrix
from helix_tpu.ops.quant import int8_coarse_topk, quantize_rows

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


def test_quantize_rows_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(200, 64)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    values, scales = quantize_rows(rows)
    assert values.dtype == np.int8 and np.abs(values).max() <= 127
    recon = values.astype(np.float32) * scales[:, None]
    assert np.abs(recon - rows).max() <= scales.max() / 2 + 1e-7
    # zero row: scale 1, all-zero values
    z, s = quantize_rows(np.zeros((1, 8), np.float32))
    assert s[0] == 1.0 and not z.any()


def test_int8_coarse_recall_vs_oracle():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    data, centers = clustered(rng, 20_000, 64)
    qs = centers[rng.integers(0, 50, size=32)] + 0.3 * rng.normal(
        size=(32, 64)
    ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    values, scales = quantize_rows(data)
    sims_i8, idx = int8_coarse_topk(
        jnp.asarray(values), jnp.asarray(scales), jnp.asarray(qs),
        jnp.int32(len(data)), jnp.sum(jnp.asarray(data) ** 2, axis=1),
        k=80,
    )
    idx = np.asarray(idx)
    oracle = np.argsort(-(qs @ data.T), axis=1)[:, :10]
    # the true top-10 must land inside the 80 int8 candidates
    containment = np.mean([
        len(set(oracle[i]) & set(idx[i])) / 10 for i in range(len(qs))
    ])
    assert containment >= 0.98, containment


def test_partition_quant_tier_end_to_end():
    rng = np.random.default_rng(2)
    n, d, k = 8_000, 64, 10
    data, centers = clustered(rng, n, d)
    # budget: exact (6 B/dim) doesn't fit, int8 (1 B/dim + 4) does
    dim_pad = 128
    budget = int(n * dim_pad * 2)
    assert n * dim_pad * 6 > budget > n * (dim_pad + 4)
    part = Partition("cosine", hbm_budget_bytes=budget)
    for i, row in enumerate(data):
        part.add(i + 1, row)
    assert part._use_quant() and not part._use_host_ivf()

    qs = centers[rng.integers(0, 50, size=16)] + 0.3 * rng.normal(
        size=(16, d)
    ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    ids, dists = part.search_many(qs, k)
    oracle = np.argsort(-(qs @ data.T), axis=1)[:, :k] + 1
    recall = np.mean([
        len(set(ids[i]) & set(oracle[i])) / k for i in range(len(qs))
    ])
    assert recall >= 0.95, recall
    assert np.all(np.diff(dists, axis=1) >= -1e-6)

    # tombstones drop out
    victim = int(ids[0][0])
    part.remove(victim)
    ids2, _ = part.search_many(qs[:1], k)
    assert victim not in ids2[0]


def test_tier_ladder_gating():
    """exact -> quant -> host-IVF as the corpus outgrows each budget."""
    part = Partition("cosine", hbm_budget_bytes=1 << 20)  # 1 MB
    rng = np.random.default_rng(3)
    mat = PackedMatrix(64, "cosine")
    part.matrix = mat

    def set_rows(n):
        mat.n = n  # residency accounting only reads n/dim_pad

    set_rows(1000)   # exact: 1000*128*6 = 768 KB <= 1 MB
    assert not part._use_quant() and not part._use_host_ivf()
    set_rows(5000)   # exact 3.8 MB > 1 MB; int8 660 KB <= 1 MB
    assert part._use_quant() and not part._use_host_ivf()
    set_rows(20_000)  # int8 2.6 MB > 1 MB
    assert not part._use_quant() and part._use_host_ivf()


def test_sharded_int8_matches_oracle_on_mesh():
    """Mesh-sharded int8 coarse + merge on the 8-device virtual mesh:
    the true top-10 must survive into the merged candidates, ragged row
    counts included."""
    from helix_tpu.ops.quant import ShardedInt8Search, quantize_rows
    from helix_tpu.parallel import make_mesh

    rng = np.random.default_rng(4)
    n, d, k = 4001, 64, 10  # ragged over 8 shards
    data, centers = clustered(rng, n, d)
    qs = centers[rng.integers(0, 50, size=16)] + 0.3 * rng.normal(
        size=(16, d)
    ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    values, scales = quantize_rows(data)
    search = ShardedInt8Search(make_mesh(), k=80)
    xs, sc, sq, n_valid = search.shard_arrays(
        values, scales, np.sum(data * data, axis=1).astype(np.float32)
    )
    _, cand = search(xs, sc, sq, qs, n_valid)
    cand = np.asarray(cand)
    assert np.all((cand >= 0) & (cand < ((n + 1023) // 1024) * 1024))
    oracle = np.argsort(-(qs @ data.T), axis=1)[:, :k]
    containment = np.mean([
        len(set(oracle[i]) & set(cand[i])) / k for i in range(len(qs))
    ])
    assert containment >= 0.98, containment


def test_partition_quant_sharded_end_to_end():
    """With a mesh present, the quant tier serves through the sharded
    int8 path and matches the brute-force oracle after re-rank."""
    import jax

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(5)
    n, d, k = 6_000, 64, 10
    data, centers = clustered(rng, n, d)
    dim_pad = 128
    budget = int(n * dim_pad * 2)
    part = Partition("cosine", hbm_budget_bytes=budget)
    mat = PackedMatrix(d, "cosine")
    mat.extend(data)
    part.matrix = mat
    part._ensure_capacity(mat.n)
    part._ids[: mat.n] = np.arange(1, mat.n + 1, dtype=np.uint64)
    part._live[: mat.n] = True
    part.n_rows = mat.n
    part._n_live = mat.n
    assert part._use_quant()

    qs = centers[rng.integers(0, 50, size=8)] + 0.3 * rng.normal(
        size=(8, d)
    ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    ids, dists = part.search_many(qs, k)
    assert part._shard_state and part._shard_state.get("kind") == "int8"
    oracle = np.argsort(-(qs @ mat.data[:n, :d].T), axis=1)[:, :k] + 1
    recall = np.mean([
        len(set(ids[i]) & set(oracle[i])) / k for i in range(len(qs))
    ])
    assert recall >= 0.95, recall
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_int8_fused_kernel_interpret_matches_oracle():
    """The fused int8 Pallas kernel (interpret mode on CPU) must keep
    the true top-k inside its candidates and agree with the XLA coarse
    path's quantized scores."""
    import jax.numpy as jnp

    from helix_tpu.ops.fused_topk import TILE
    from helix_tpu.ops.quant import int8_fused_coarse

    from helix_tpu.ops.quant import quantize_rows_unit

    rng = np.random.default_rng(8)
    n, d, k = TILE, 128, 10
    n_live = n - 300  # padding rows must never win
    data, centers = clustered(rng, n_live, d)
    padded = np.zeros((n, d), np.float32)
    padded[:n_live] = data
    values = quantize_rows_unit(padded)
    qs = centers[rng.integers(0, 50, size=4)] + 0.3 * rng.normal(
        size=(4, d)
    ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    sims, ids = int8_fused_coarse(
        jnp.asarray(values), jnp.asarray(qs),
        jnp.int32(n_live), k=64, interpret=True,
    )
    ids = np.asarray(ids)
    assert np.all((ids >= 0) & (ids < n))
    assert np.all(ids < n_live)  # masked padding never surfaces
    oracle = np.argsort(-(qs @ data.T), axis=1)[:, :k]
    containment = np.mean([
        len(set(oracle[i]) & set(ids[i])) / k for i in range(len(qs))
    ])
    assert containment >= 0.9, containment

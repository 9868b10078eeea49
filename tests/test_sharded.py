"""Sharded search over the 8-device virtual CPU mesh: correctness vs the
single-device exact kernel."""

import jax
import numpy as np
import pytest

from helix_tpu.ops.distance import PackedMatrix, search_packed
from helix_tpu.parallel import ShardedVectorSearch, make_mesh


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(4000, 64)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(16, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return data, queries


def brute_force_ids(data, queries, k):
    sims = queries @ data.T
    return np.argsort(-sims, axis=1)[:, :k]


def test_eight_way_shard_matches_exact(dataset):
    data, queries = dataset
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    search = ShardedVectorSearch(mesh, k=10, chunk=512, bf16=False)
    sq = np.sum(data * data, axis=1)
    xs, sqd, n_valid = search.shard_arrays(data, sq)
    dists, idx = search(xs, queries, n_valid, sqd)
    expected = brute_force_ids(data, queries, 10)
    idx = np.asarray(idx)
    agree = np.mean([
        len(set(idx[i]) & set(expected[i])) / 10 for i in range(len(queries))
    ])
    assert agree >= 0.999
    dists = np.asarray(dists)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)  # ascending


def test_two_by_four_mesh(dataset):
    data, queries = dataset
    mesh = make_mesh(data=2)
    assert mesh.shape == {"data": 2, "shard": 4}
    search = ShardedVectorSearch(mesh, k=5, chunk=512, bf16=False)
    sq = np.sum(data * data, axis=1)
    xs, sqd, n_valid = search.shard_arrays(data, sq)
    dists, idx = search(xs, queries, n_valid, sqd)
    expected = brute_force_ids(data, queries, 5)
    assert np.array_equal(np.sort(np.asarray(idx), axis=1), np.sort(expected, axis=1))


def test_l2_metric_sharded(dataset):
    data, queries = dataset
    mesh = make_mesh()
    search = ShardedVectorSearch(mesh, k=7, metric="l2", chunk=512, bf16=False)
    sq = np.sum(data * data, axis=1)
    xs, sqd, n_valid = search.shard_arrays(data, sq)
    dists, idx = search(xs, queries, n_valid, sqd)
    d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    expected = np.argsort(d2, axis=1)[:, :7]
    assert np.array_equal(np.sort(np.asarray(idx), axis=1), np.sort(expected, axis=1))


def test_single_device_kernel_matches_numpy(dataset):
    data, queries = dataset
    matrix = PackedMatrix(64, "cosine")
    for row in data:
        matrix.append(row)
    dists, idx = search_packed(matrix, queries, 10, use_device=True)
    expected = brute_force_ids(data, queries, 10)
    assert np.array_equal(np.sort(idx, axis=1), np.sort(expected, axis=1))
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_engine_sharded_serving_matches_exact():
    """Engine partitions above shard_threshold serve from the mesh-sharded
    path (8 virtual devices) with exact results via the native re-rank."""
    import numpy as np

    from helix_tpu.dsl import DynamicQueryRequest, g, read_batch, write_batch
    from helix_tpu.engine import Engine

    rng = np.random.default_rng(9)
    data = rng.normal(size=(800, 24)).astype(np.float32)

    def build(**kwargs):
        eng = Engine(**kwargs)
        rows = [{"i": int(i), "emb": [float(x) for x in data[i]]} for i in range(len(data))]
        eng.execute(DynamicQueryRequest.write(
            write_batch().var_as("idx", g().create_vector_index_nodes("Doc", "emb"))
        ).encode())
        eng.execute(
            {
                "request_type": "write",
                "query": write_batch().for_each_param(
                    "docs",
                    write_batch().var_as("d", g().add_n("Doc", [
                        ("i", {"Expr": {"Param": "docs.i"}}),
                        ("emb", {"Expr": {"Param": "docs.emb"}}),
                    ])),
                ).encode(),
                "parameters": {"docs": rows},
                "parameter_types": {"docs": {"Array": "Object"}},
            }
        )
        return eng

    def hits(eng, q):
        out = eng.execute(DynamicQueryRequest.read(
            read_batch().var_as(
                "hits", g().vector_search_nodes("Doc", "emb", [float(x) for x in q], 5).value_map(["i"])
            )
        ).encode())
        return [h["i"] for h in out["hits"]]

    sharded = build(shard_threshold=100)
    exact = build()
    for qi in (3, 77, 400):
        assert hits(sharded, data[qi]) == hits(exact, data[qi])
    part = next(iter(sharded.vectors.indexes.values())).partitions[("",)]
    assert part._shard_state is not None  # the sharded path actually ran


@pytest.mark.parametrize("n_rows,k", [
    (4001, 10),    # prime-ish: every shard split pads
    (3999, 10),
    (37, 16),      # k > per-shard row count (37/8 < 16): merge must
                   # draw whole result sets across shards
    (7, 12),       # k > total rows: short result, no padded-row leakage
])
def test_ragged_shard_sizes_and_k_overflow(n_rows, k):
    """Non-divisible row counts and k exceeding per-shard hits — the
    shard-boundary/padding cases the small aligned tests can't catch."""
    rng = np.random.default_rng(n_rows)
    data = rng.normal(size=(n_rows, 32)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(8, 32)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    mesh = make_mesh()
    k_eff = min(k, n_rows)
    search = ShardedVectorSearch(mesh, k=k_eff, chunk=256, bf16=False)
    sq = np.sum(data * data, axis=1)
    xs, sqd, n_valid = search.shard_arrays(data, sq)
    dists, idx = search(xs, queries, n_valid, sqd)
    idx = np.asarray(idx)
    dists = np.asarray(dists)
    # no padded-row indices may ever surface
    finite = np.isfinite(dists)
    assert np.all((idx >= 0) & (idx < n_rows) | ~finite)
    expected = brute_force_ids(data, queries, k_eff)
    assert np.array_equal(
        np.sort(idx[finite].reshape(len(queries), -1), axis=1)
        if finite.all() else np.sort(idx, axis=1),
        np.sort(expected, axis=1),
    )
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


@pytest.mark.parametrize("n_rows,k", [
    (1000, 800),   # k wider than the per-shard chunk: locals clamp,
                   # the merge re-expands
    (100, 640),    # k wider than the whole corpus: overflow slots pad
])
def test_k_wider_than_per_shard_chunk(n_rows, k):
    """k exceeding the per-shard scan width used to crash lax.top_k at
    trace time; per-shard paths now clamp and the merge pads."""
    rng = np.random.default_rng(k)
    data = rng.normal(size=(n_rows, 32)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(4, 32)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    mesh = make_mesh()
    search = ShardedVectorSearch(mesh, k=k, chunk=256, bf16=False)
    sq = np.sum(data * data, axis=1)
    xs, sqd, n_valid = search.shard_arrays(data, sq)
    dists, idx = search(xs, queries, n_valid, sqd)
    dists = np.asarray(dists)
    idx = np.asarray(idx)
    assert dists.shape == (4, k) and idx.shape == (4, k)
    finite = np.isfinite(dists)
    # every live row must be found, in distance order, before overflow
    k_real = min(k, n_rows)
    assert finite[:, :k_real].all()
    assert np.all((idx[finite] >= 0) & (idx[finite] < n_rows))
    expected = brute_force_ids(data, queries, k_real)
    got = np.where(finite, idx, -1)[:, :k_real]
    assert np.array_equal(np.sort(got, axis=1), np.sort(expected, axis=1))

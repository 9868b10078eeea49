"""Graph-based ANN (beam search): recall vs brute force, ef scaling."""

import numpy as np
import pytest

from helix_tpu.ops.beam import BeamIndex


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(11)
    n, d = 20_000, 32
    centers = rng.normal(size=(128, d)).astype(np.float32)
    data = centers[rng.integers(0, 128, n)] + 0.3 * rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.integers(0, 128, 32)] + 0.3 * rng.normal(
        size=(32, d)
    ).astype(np.float32)
    return data, queries


@pytest.fixture(scope="module")
def index(dataset):
    data, _ = dataset
    return BeamIndex.build(data, degree=24, kmeans_iters=5, adjacent=4, seed=0)


def brute(data, queries, k):
    dn = data / np.linalg.norm(data, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    return np.argsort(-(qn @ dn.T), axis=1)[:, :k]


def recall(got, want):
    k = want.shape[1]
    return float(np.mean([
        len(set(got[i]) & set(want[i])) / k for i in range(len(want))
    ]))


def test_graph_is_well_formed(dataset, index):
    data, _ = dataset
    neighbors = np.asarray(index.neighbors)
    n = len(data)
    # No self loops among valid entries; at least half the slots filled.
    rows = np.arange(n)[:, None]
    valid = neighbors < n
    assert not np.any((neighbors == rows) & valid)
    assert valid.mean() > 0.5


def test_beam_recall(dataset, index):
    data, queries = dataset
    oracle = brute(data, queries, 10)
    _, got = index.search(queries, 10, ef=64, iters=8)
    assert recall(got, oracle) >= 0.9


def test_ef_scales_recall(dataset, index):
    data, queries = dataset
    oracle = brute(data, queries, 10)
    lo = recall(index.search(queries, 10, ef=16, iters=4)[1], oracle)
    hi = recall(index.search(queries, 10, ef=96, iters=10)[1], oracle)
    assert hi >= lo
    assert hi >= 0.95


def test_distances_ascending_and_valid(dataset, index):
    data, queries = dataset
    dists, ids = index.search(queries, 5, ef=48, iters=6)
    assert np.all(np.diff(dists, axis=1) >= -1e-5)
    assert np.all((ids >= 0) & (ids < len(data)))

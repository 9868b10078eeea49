"""IVF ANN index: recall vs brute force, nprobe scaling, build integrity."""

import numpy as np
import pytest

from helix_tpu.ops.ivf import IVFIndex


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(3)
    n, d = 20_000, 32
    centers = rng.normal(size=(100, d)).astype(np.float32)
    data = centers[rng.integers(0, 100, n)] + 0.25 * rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.integers(0, 100, 32)] + 0.25 * rng.normal(
        size=(32, d)
    ).astype(np.float32)
    return data, queries


def brute(data, queries, k):
    dn = data / np.linalg.norm(data, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ dn.T
    return np.argsort(-sims, axis=1)[:, :k]


def recall(got, want):
    k = want.shape[1]
    return np.mean([
        len(set(got[i]) & set(want[i])) / k for i in range(len(want))
    ])


def test_ivf_recall_at_high_nprobe(dataset):
    data, queries = dataset
    index = IVFIndex.build(data, n_clusters=128, iters=6, seed=0)
    oracle = brute(data, queries, 10)
    _, got = index.search(queries, 10, nprobe=32)
    assert recall(got, oracle) >= 0.95


def test_ivf_nprobe_scales_recall(dataset):
    data, queries = dataset
    index = IVFIndex.build(data, n_clusters=128, iters=6, seed=0)
    oracle = brute(data, queries, 10)
    recalls = []
    for nprobe in (1, 4, 16, 64):
        _, got = index.search(queries, 10, nprobe=nprobe)
        recalls.append(recall(got, oracle))
    assert recalls == sorted(recalls)  # monotone non-decreasing
    assert recalls[-1] >= 0.98


def test_ivf_distances_ascending(dataset):
    data, queries = dataset
    index = IVFIndex.build(data, n_clusters=64, iters=4)
    dists, _ = index.search(queries, 10, nprobe=16)
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_ivf_build_covers_all_rows(dataset):
    data, _ = dataset
    index = IVFIndex.build(data, n_clusters=64, iters=3)
    rows = np.asarray(index.cell_rows)
    valid = rows[rows < len(data)]
    assert len(np.unique(valid)) == len(data)  # every row in exactly one cell
    assert index.build_seconds > 0

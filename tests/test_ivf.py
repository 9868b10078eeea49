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


class TestHostIVF:
    """Beyond-HBM tier: host-resident corpus, device centroids only."""

    def _data(self, n=5000, d=32, b=32, seed=3):
        import numpy as np

        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(64, d)).astype(np.float32)
        data = centers[rng.integers(0, 64, n)] + 0.3 * rng.normal(
            size=(n, d)
        ).astype(np.float32)
        queries = centers[rng.integers(0, 64, b)] + 0.3 * rng.normal(
            size=(b, d)
        ).astype(np.float32)
        return data, queries

    def test_recall_against_oracle(self):
        import numpy as np

        from helix_tpu.ops.ivf import HostIVFIndex

        data, queries = self._data()
        idx = HostIVFIndex.build(data, n_clusters=128, iters=5)
        dn = data / np.linalg.norm(data, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        oracle = np.argsort(-(qn @ dn.T), axis=1)[:, :10]
        _, ids = idx.search(queries, 10, nprobe=16)
        recall = np.mean([
            len(set(ids[i][:10]) & set(oracle[i])) / 10
            for i in range(len(queries))
        ])
        assert recall >= 0.9, recall

    def test_sampled_build_streamed_assign(self):
        import numpy as np

        from helix_tpu.ops.ivf import HostIVFIndex

        data, queries = self._data(n=4000)
        # force the beyond-HBM build shape: sample < corpus, tiny chunks
        idx = HostIVFIndex.build(
            data, n_clusters=64, iters=4, sample_cap=1000, assign_chunk=700
        )
        assert idx.n == len(data)
        _, ids = idx.search(queries[:4], 5, nprobe=8)
        assert ids.shape == (4, 5)

    def test_partition_tier_engages_and_matches_exact(self):
        import numpy as np

        from helix_tpu.engine.vector import Partition

        data, queries = self._data(n=3000, d=16)
        exact = Partition("cosine")
        budget = Partition("cosine", hbm_budget_bytes=1)  # force host tier
        ids = list(range(1, len(data) + 1))
        exact.add_bulk(ids, data)
        budget.add_bulk(ids, data)
        assert budget._use_host_ivf()
        got_e, _ = exact.search_many(queries, 10)
        got_b, _ = budget.search_many(queries, 10)
        recall = np.mean([
            len(set(got_b[i]) & set(got_e[i])) / 10
            for i in range(len(queries))
        ])
        assert recall >= 0.9, recall

    def test_partition_tier_delta_and_tombstones(self):
        import numpy as np

        from helix_tpu.engine.vector import Partition

        data, queries = self._data(n=2500, d=16)
        part = Partition("cosine", hbm_budget_bytes=1)
        ids = list(range(1, len(data) + 1))
        part.add_bulk(ids, data)
        part.search_many(queries[:2], 5)  # builds the snapshot
        # delta rows after the build + a deletion
        part.add(9001, queries[0])
        part.remove(ids[0])
        got, dists = part.search_many(queries[:1], 3)
        assert 9001 in got[0]          # delta row found exactly
        assert ids[0] not in got[0]    # tombstone dropped
        assert dists[0][0] <= 1e-5     # the exact-match delta row ranks first


class TestProbeRouting:
    """Round-4: host-probed scoring path + measured-cost routing
    (``ProbeRouter``).  The union-stream device path pays H2D bytes;
    the host path pays per-query incidences through the native
    re-rank; the router predicts both from measured per-unit rates."""

    def _build(self, n=6000, d=24, b=16, seed=11):
        import numpy as np

        from helix_tpu.ops.ivf import HostIVFIndex

        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(48, d)).astype(np.float32)
        data = centers[rng.integers(0, 48, n)] + 0.3 * rng.normal(
            size=(n, d)
        ).astype(np.float32)
        queries = centers[rng.integers(0, 48, b)] + 0.3 * rng.normal(
            size=(b, d)
        ).astype(np.float32)
        idx = HostIVFIndex.build(data, n_clusters=64, iters=4)
        return idx, data, queries

    def test_host_path_matches_probed_oracle(self, monkeypatch):
        import numpy as np

        from helix_tpu.ops.ivf import probe_cells

        idx, data, queries = self._build()
        monkeypatch.setenv("HELIX_IVF_BACKEND", "host")
        k, nprobe = 8, 6
        dists, ids = idx.search(queries, k, nprobe=nprobe)
        assert idx.last_path == "host"
        assert idx.last_streamed_bytes == 0

        # oracle: exact scores over each query's OWN probed cells
        import jax.numpy as jnp

        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        cells = np.asarray(probe_cells(
            idx.centroids, jnp.asarray(qn), nprobe=nprobe
        ))
        for qi in range(len(queries)):
            rows = np.concatenate([
                np.arange(idx.indptr[c], idx.indptr[c + 1])
                for c in cells[qi]
            ])
            sims = idx.packed[rows] @ qn[qi]
            want = idx.row_to_original[rows[np.argsort(-sims)[:k]]]
            got = ids[qi][ids[qi] >= 0]
            assert set(got) == set(want[: len(got)])

    def test_forced_device_path_unchanged(self, monkeypatch):
        idx, data, queries = self._build()
        monkeypatch.setenv("HELIX_IVF_BACKEND", "device")
        dists, ids = idx.search(queries, 5, nprobe=8)
        assert idx.last_path == "device"
        assert idx.last_streamed_bytes > 0
        assert ids.shape[1] == 5

    def test_auto_routing_samples_both_then_converges(self, monkeypatch):
        import numpy as np

        idx, data, queries = self._build()
        monkeypatch.delenv("HELIX_IVF_BACKEND", raising=False)
        paths = []
        for _ in range(6):
            idx.search(queries, 5, nprobe=8)
            paths.append(idx.last_path)
        # bootstrap sampled both; afterwards every decision had rates
        assert {"host", "device"} <= set(paths)
        assert set(idx.router.rate) == {"host", "device"}
        # the two paths agree on membership at this tiny scale
        monkeypatch.setenv("HELIX_IVF_BACKEND", "host")
        _, h_ids = idx.search(queries, 10, nprobe=64)
        monkeypatch.setenv("HELIX_IVF_BACKEND", "device")
        _, d_ids = idx.search(queries, 10, nprobe=64)
        overlap = np.mean([
            len(set(h_ids[i][h_ids[i] >= 0]) & set(d_ids[i])) / 10
            for i in range(len(queries))
        ])
        assert overlap >= 0.95, overlap


def test_empty_probe_union_refreshes_last_path(monkeypatch):
    """The observability contract says last_path refreshes on EVERY
    search, including the empty-union early return (it used to keep the
    previous search's value)."""
    import numpy as np

    import helix_tpu.ops.ivf as ivf_mod

    rng = np.random.default_rng(3)
    data = rng.normal(size=(600, 16)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    idx = ivf_mod.HostIVFIndex.build(data, n_clusters=8, normalize=False)
    qs = data[:4]
    monkeypatch.setenv("HELIX_IVF_BACKEND", "device")
    idx.search(qs, 3, nprobe=2, normalize=False)
    assert idx.last_path == "device"
    # force a probe set of empty cells only
    empty_cell = int(np.argmin(np.diff(idx.indptr)))
    if idx.indptr[empty_cell + 1] > idx.indptr[empty_cell]:
        # no naturally empty cell: empty one artificially (its rows
        # fold into the next cell, which this test never probes)
        idx.indptr = idx.indptr.copy()
        idx.indptr[empty_cell + 1] = idx.indptr[empty_cell]
    monkeypatch.setattr(
        ivf_mod, "probe_cells",
        lambda *a, **k: np.full((len(qs), 1), empty_cell, np.int64),
    )
    d, i = idx.search(qs, 3, nprobe=1, normalize=False)
    assert i.shape == (len(qs), 0)
    assert idx.last_path == "empty"

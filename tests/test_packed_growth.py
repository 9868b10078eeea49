"""PackedMatrix background growth: the ingest path must never stall on
an O(N) copy (measured: the synchronous doubling at 1M rows cost 0.4-12 s
in the serving path), and the async swap must preserve every row through
interleaved appends and overwrites."""

import numpy as np

from helix_tpu.ops.distance import PackedMatrix


def test_background_grow_preserves_rows():
    rng = np.random.default_rng(0)
    mat = PackedMatrix(16, "l2")  # l2: rows stored verbatim
    rows = rng.normal(size=(4000, 16)).astype(np.float32)
    # drive through many growth cycles with small batches
    for i in range(0, len(rows), 100):
        mat.extend(rows[i : i + 100])
    # force any pending background copy to land
    mat._ensure_rows(0)
    if mat._grow_thread is not None:
        mat._swap_grown()
    np.testing.assert_allclose(mat.data[: mat.n, :16], rows, rtol=0, atol=0)
    np.testing.assert_allclose(
        mat.sq_norms[: mat.n], np.sum(rows * rows, axis=1), rtol=1e-5
    )


def test_overwrite_during_pending_grow_is_not_lost():
    rng = np.random.default_rng(1)
    mat = PackedMatrix(8, "l2")
    mat.extend(rng.normal(size=(460, 8)).astype(np.float32))  # 460/512 = 90%
    mat._start_background_grow(2 * mat.capacity)
    # overwrite rows below the copy watermark while the grow is pending
    patch = np.arange(8, dtype=np.float32)
    mat.overwrite(3, patch)
    mat.overwrite(100, None)  # tombstone form
    mat._swap_grown()
    np.testing.assert_allclose(mat.data[3, :8], patch)
    assert np.all(mat.data[100] == 0.0)
    assert mat.capacity >= 1024


def test_appends_after_grow_start_survive_swap():
    rng = np.random.default_rng(2)
    mat = PackedMatrix(8, "l2")
    base = rng.normal(size=(460, 8)).astype(np.float32)
    mat.extend(base)
    mat._start_background_grow(2 * mat.capacity)
    late = rng.normal(size=(30, 8)).astype(np.float32)
    mat.extend(late)  # lands while (or after) the copier runs
    mat._swap_grown()
    np.testing.assert_allclose(mat.data[460:490, :8], late)
    np.testing.assert_allclose(mat.data[:460, :8], base)


def test_burst_outrunning_copier_grows_synchronously():
    mat = PackedMatrix(8, "l2")
    # one giant extend far past any background target
    big = np.ones((10_000, 8), np.float32)
    mat.extend(big)
    assert mat.n == 10_000 and mat.capacity >= 10_000
    np.testing.assert_allclose(mat.data[9_999, :8], big[-1])


def test_failed_copier_falls_back_to_synchronous_growth():
    """A copier thread that dies mid-copy must be discarded — the
    synchronous path grows instead; incomplete buffers never become
    the matrix."""
    rng = np.random.default_rng(4)
    mat = PackedMatrix(8, "l2")
    rows = rng.normal(size=(460, 8)).astype(np.float32)
    mat.extend(rows)

    mat._start_background_grow(2 * mat.capacity)
    n0, grown, sq, ok = mat._grow_buffers
    mat._grow_thread.join()
    ok[0] = False  # simulate a crash before completion
    late = rng.normal(size=(200, 8)).astype(np.float32)
    mat.extend(late)  # forces swap -> discard -> synchronous growth
    assert mat.n == 660 and mat.capacity >= 660
    np.testing.assert_allclose(mat.data[:460, :8], rows)
    np.testing.assert_allclose(mat.data[460:660, :8], late)

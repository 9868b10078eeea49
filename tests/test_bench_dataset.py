"""Real-dataset mode of bench.py (round-4 verdict item 5).

SIFT1M/GIST1M cannot be fetched in this zero-egress image, so these
tests exercise the exact loader + oracle machinery on a synthetic
TEXMEX-layout mini corpus: fvecs/ivecs round-trip, cosine mode
(normalized, in-run oracle) and l2 mode (raw vectors, published
groundtruth as the oracle) — end-to-end through ``python bench.py``.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import _load_texmex, read_fvecs, read_ivecs  # noqa: E402


def write_fvecs(path: Path, vecs: np.ndarray) -> None:
    n, d = vecs.shape
    out = np.empty((n, d + 1), np.float32)
    out[:, 0] = np.frombuffer(
        np.full(n, d, np.int32).tobytes(), np.float32
    )
    out[:, 1:] = vecs
    out.tofile(path)


def write_ivecs(path: Path, ids: np.ndarray) -> None:
    n, d = ids.shape
    out = np.empty((n, d + 1), np.int32)
    out[:, 0] = d
    out[:, 1:] = ids
    out.tofile(path)


@pytest.fixture
def mini_sift(tmp_path):
    rng = np.random.default_rng(4)
    n, d, nq, k_gt = 3000, 32, 128, 100
    base = (rng.normal(size=(n, d)) * 20 + 100).astype(np.float32)
    queries = (rng.normal(size=(nq, d)) * 20 + 100).astype(np.float32)
    # L2 ground truth on the RAW vectors (what TEXMEX publishes)
    d2 = (
        np.sum(base * base, axis=1)[None, :]
        - 2.0 * queries @ base.T
        + np.sum(queries * queries, axis=1)[:, None]
    )
    gt = np.argsort(d2, axis=1)[:, :k_gt].astype(np.int32)
    ds = tmp_path / "sift"
    ds.mkdir()
    write_fvecs(ds / "sift_base.fvecs", base)
    write_fvecs(ds / "sift_query.fvecs", queries)
    write_ivecs(ds / "sift_groundtruth.ivecs", gt)
    return ds, base, queries, gt


def test_fvecs_ivecs_roundtrip(mini_sift):
    ds, base, queries, gt = mini_sift
    got = read_fvecs(str(ds / "sift_base.fvecs"))
    assert got.shape == base.shape and np.array_equal(got, base)
    got_gt = read_ivecs(str(ds / "sift_groundtruth.ivecs"))
    assert np.array_equal(got_gt, gt)
    loaded = _load_texmex(str(ds))
    assert loaded["name"] == "sift"
    assert np.array_equal(loaded["queries"], queries)


def test_load_texmex_missing_files_names_fetch_recipe(tmp_path):
    with pytest.raises(FileNotFoundError, match="fetch_sift.sh"):
        _load_texmex(str(tmp_path))


def _run_bench(ds: Path, extra_env: dict) -> dict:
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_SIFT=str(ds),
        BENCH_ROUNDS="4",
        BENCH_BATCH="64",
        BENCH_SKIP_BASELINE="1",
        BENCH_SKIP_GATEWAY="1",
        **extra_env,
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_bench_cosine_mode_on_real_layout(mini_sift):
    ds, *_ = mini_sift
    out = _run_bench(ds, {})
    assert out["dataset"] == "sift"
    assert out["distance_metric"] == "cosine"
    assert out["recall_at_10"] >= 0.95
    assert "oracle" not in out  # normalized: published GT inapplicable


@pytest.mark.slow
def test_bench_l2_mode_uses_published_groundtruth(mini_sift):
    ds, *_ = mini_sift
    out = _run_bench(ds, {"BENCH_METRIC": "l2"})
    assert out["dataset"] == "sift"
    assert out["distance_metric"] == "l2"
    assert out["oracle"] == "published_groundtruth"
    assert out["recall_at_10"] >= 0.95

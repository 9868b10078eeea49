"""Fused Pallas candidate kernel: correctness in interpret mode (CPU)."""

import numpy as np
import pytest

import helix_tpu.ops.fused_topk as F


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    original = pl.pallas_call

    def interpreted(*args, **kwargs):
        kwargs["interpret"] = True
        return original(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interpreted)
    try:
        F._bucket_candidates.clear_cache()
    except AttributeError:
        pass
    yield
    try:
        F._bucket_candidates.clear_cache()
    except AttributeError:
        pass


def test_fused_topk_matches_oracle():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, d, b, k = F.TILE * 2, 128, 8, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    xs32 = jnp.asarray(data)
    xs16 = xs32.astype(jnp.bfloat16)
    sq = jnp.sum(xs32 * xs32, axis=1)
    dists, idx = F.fused_topk(
        xs16, xs32, jnp.asarray(queries), jnp.int32(n), sq, k=k
    )
    idx = np.asarray(idx)
    dists = np.asarray(dists)

    sims = queries @ data.T
    oracle = np.argsort(-sims, axis=1)[:, :k]
    # Bucketed selection can only lose a top-k item to a colliding top-k
    # item; with random data and n/64 buckets the overlap is ~1.0.
    overlap = np.mean(
        [len(set(idx[i]) & set(oracle[i])) / k for i in range(b)]
    )
    assert overlap >= 0.9
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_n_valid_masks_padding():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n_valid = 100
    n = F.TILE
    data = np.zeros((n, 128), np.float32)
    data[:n_valid] = rng.normal(size=(n_valid, 128))
    data[:n_valid] /= np.linalg.norm(data[:n_valid], axis=1, keepdims=True)
    # Padding rows are zero but would win cosine ties; n_valid must
    # exclude them.
    queries = data[:4] + 0.0
    xs32 = jnp.asarray(data)
    dists, idx = F.fused_topk(
        xs32.astype(jnp.bfloat16), xs32, jnp.asarray(queries),
        jnp.int32(n_valid), jnp.sum(xs32 * xs32, axis=1), k=3,
    )
    idx = np.asarray(idx)
    # Valid slots point inside the live rows; unfillable slots are -1
    # (only 2 buckets contain live rows, so at most 2 candidates).
    assert np.all((idx < n_valid) | (idx == -1))
    assert np.all(idx[:, 0] == np.arange(4))

"""Fused Pallas packed-bucket kernel: correctness in interpret mode (CPU)."""

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
    for fn in (F._bucket_scores, F.fused_topk):
        try:
            fn.clear_cache()
        except AttributeError:
            pass
    yield
    for fn in (F._bucket_scores, F.fused_topk):
        try:
            fn.clear_cache()
        except AttributeError:
            pass


def make_data(n, d, b, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return data, queries


def run_fused(data, queries, n_valid, k):
    import jax.numpy as jnp

    n_pad = F.pad_rows_for_fused(data.shape[0])
    xs32 = np.zeros((n_pad, data.shape[1]), np.float32)
    xs32[: data.shape[0]] = data
    xs16 = jnp.asarray(xs32, jnp.bfloat16)
    sq = jnp.sum(jnp.asarray(xs32) ** 2, axis=1)
    return F.fused_topk(
        xs16, jnp.asarray(xs32), jnp.asarray(queries),
        jnp.int32(n_valid), sq, k=k,
    )


def test_fused_topk_matches_oracle():
    n, d, b, k = F.TILE, 128, 4, 5
    data, queries = make_data(n, d, b)
    dists, ids = run_fused(data, queries, n, k)
    dists, ids = np.asarray(dists), np.asarray(ids)

    sims = queries @ data.T
    oracle = np.argsort(-sims, axis=1)[:, :k]
    for row in range(b):
        got, want = set(ids[row]), set(oracle[row])
        # bf16-selection window loss tolerated; ranking must be sane
        assert len(got & want) >= k - 1, (row, got, want)
        assert np.all(np.diff(dists[row]) >= -1e-6)  # ascending
    # Exact re-rank: distances agree with f32 oracle for matched ids
    for row in range(b):
        for col in range(k):
            idx = ids[row, col]
            if idx in set(oracle[row]):
                expected = 1.0 - float(sims[row, idx])
                assert abs(dists[row, col] - expected) < 1e-3


def test_fused_topk_masks_padding_rows():
    n_valid, d, b, k = F.TILE - 100, 128, 4, 5
    data, queries = make_data(F.TILE, d, b, seed=1)
    # poison the padding region with perfect matches
    data[n_valid:] = queries[0]
    dists, ids = run_fused(data, queries, n_valid, k)
    assert np.all(np.asarray(ids) < n_valid)


def test_packed_index_bits_recover_row_ids():
    """The low-mantissa packing must round-trip the bucket-local argmax."""
    n, d, b, k = F.TILE, 128, 4, 1
    data, queries = make_data(n, d, b, seed=2)
    # Plant an unambiguous best match for query 0 at a known row
    target = 5431
    data[target] = queries[0]
    dists, ids = run_fused(data, queries, n, k)
    assert int(np.asarray(ids)[0, 0]) == target
    assert float(np.asarray(dists)[0, 0]) < 1e-2


def test_supports_fused_gating():
    assert F.supports_fused(F.TILE * 4, 128, "cosine", "tpu")
    assert not F.supports_fused(F.TILE * 4, 128, "cosine", "cpu")
    assert not F.supports_fused(F.TILE * 4, 128, "l2", "tpu")
    assert not F.supports_fused(F.TILE * 4 + 512, 128, "cosine", "tpu")
    assert not F.supports_fused(F.TILE // 2, 128, "cosine", "tpu")


def test_tile_rows_adapt_to_dimension():
    assert F._tile_rows(128) == F.TILE
    assert F._tile_rows(1024) == 2048
    assert F._tile_rows(4096) == 512      # floor
    assert F.TILE % F._tile_rows(1024) == 0


def test_resident_topk_auto_falls_back_on_cpu():
    """On the CPU test backend the auto router must use the XLA path and
    return exact results."""
    import jax.numpy as jnp

    from helix_tpu.ops.distance import resident_topk_auto

    rng = np.random.default_rng(3)
    n, d, b, k = 4096, 64, 4, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = data[:b]
    xs16 = jnp.asarray(data, jnp.bfloat16)
    xs32 = jnp.asarray(data)
    sq = jnp.sum(xs32 * xs32, axis=1)
    dists, ids = resident_topk_auto(
        xs16, xs32, jnp.asarray(queries), jnp.int32(n), sq,
        k=k, metric="cosine",
    )
    assert np.asarray(ids)[:, 0].tolist() == list(range(b))  # self-hits


def test_supports_fused_gates():
    """Dispatcher gates: wide dims (VMEM tile budget) and k beyond the
    bucket count route to the XLA path instead of crashing/overflowing
    inside the fused kernel."""
    from helix_tpu.ops.fused_topk import BUCKET, TILE, supports_fused

    n = 8 * TILE
    assert supports_fused(n, 128, "cosine", "tpu")
    assert supports_fused(n, 128, "cosine", "tpu", k=n // BUCKET)
    # k beyond one-candidate-per-bucket: refuse
    assert not supports_fused(n, 128, "cosine", "tpu", k=n // BUCKET + 1)
    # d=8192 gives a 256-row budget < the 512-row minimum tile: refuse
    assert not supports_fused(n, 8192, "cosine", "tpu")
    assert supports_fused(n, 4096, "cosine", "tpu")
    assert not supports_fused(n, 128, "l2", "tpu")
    assert not supports_fused(n, 128, "cosine", "cpu")
    assert not supports_fused(n + 64, 128, "cosine", "tpu")


def test_tile_rows_shared_helper():
    from helix_tpu.ops.fused_topk import TILE, _tile_rows, tile_rows_for
    from helix_tpu.ops.quant import _i8_tile_rows
    from helix_tpu.ops.quant4 import _i4_tile_rows

    # bf16 at 128-d: full budget -> full tile
    assert tile_rows_for(128 * 2) == TILE
    # int8 fits 2x the rows of bf16 at equal width (same byte budget)
    assert _i8_tile_rows(4096) == 2 * tile_rows_for(4096 * 2)
    # packed int4 budgets its UNPACK working set (packed + int32 +
    # nibble intermediates = 7x the packed bytes), not just the packed
    # tile — the old packed-only budget let 2048-d pick a tile whose
    # int32 intermediate alone filled VMEM
    from helix_tpu.ops.quant4 import _I4_ROW_VMEM_FACTOR

    assert _i4_tile_rows(4096 // 2) == tile_rows_for(
        _I4_ROW_VMEM_FACTOR * 2048
    )
    # at serving width (128-d) the combined VMEM working-set cap
    # (score tile + double-buffered matrix tiles <= 12 MB) admits the
    # full tile for int8 (8 MB + 2 MB) but halves int4, whose unpack
    # working set is 7x its packed bytes (8 MB + 7 MB would not fit)
    assert _i8_tile_rows(128, 256) == TILE
    assert _i4_tile_rows(64, 256) == TILE // 2
    # bf16 at 128-d / batch 256: exactly at the cap (8 MB + 4 MB) —
    # the round-5 sweep's measured-fastest config
    assert _tile_rows(128, 256) == TILE
    # every result divides TILE (non-divisors would drop tail rows)
    for rb in (64, 128, 999, 4096, 8192, 100_000):
        assert TILE % tile_rows_for(rb) == 0

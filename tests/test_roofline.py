"""benchmarks/roofline.py: clamp logic + cache-proof scan harness.

The bench methodology is load-bearing (the driver's BENCH/LADDER
artifacts are built on it), so its pieces get unit coverage: the
physical-bound clamp must flag impossible measurements and leave honest
ones alone, and the scan harness must produce sane throughput on CPU.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks.roofline import (  # noqa: E402
    apply_roofline, device_specs, roofline_batch_seconds, timed_scan_qps,
)


def test_apply_roofline_clamps_impossible():
    row = {"qps": 1_000_000.0}
    out = apply_roofline(row, batch=256, floor_s=0.001)  # cap = 256k
    assert out["clamped_to_roofline"] is True
    assert out["qps"] == 256_000.0
    assert out["measured_qps_raw"] == 1_000_000.0
    assert out["roofline_qps"] == 256_000.0


def test_apply_roofline_keeps_honest_measurement():
    row = {"qps": 100_000.0}
    out = apply_roofline(row, batch=256, floor_s=0.001)
    assert "clamped_to_roofline" not in out
    assert out["qps"] == 100_000.0
    assert out["roofline_qps"] == 256_000.0


def test_apply_roofline_noop_without_bound():
    row = {"qps": 5.0}
    assert apply_roofline(dict(row), 8, None) == row
    assert apply_roofline(dict(row), 8, 0.0) == row


def test_roofline_batch_seconds_on_cpu_backend():
    # CPU backend: no published roofline -> None (callers skip clamping)
    specs = device_specs()
    floor = roofline_batch_seconds(bytes_read=1e9, mxu_ops=1e9)
    if specs is None:
        assert floor is None
    else:  # a real TPU is attached: the bound must be positive
        assert floor > 0


def test_timed_scan_qps_runs_and_blocks_all_outputs():
    import jax.numpy as jnp

    mat = jnp.asarray(np.random.default_rng(0).normal(
        size=(512, 32)
    ).astype(np.float32))

    def fn(qb, m):
        sims = qb @ m.T
        import jax

        _, idx = jax.lax.top_k(sims, 4)
        return idx

    qps, diag = timed_scan_qps(
        fn, batch=16, d=32, dim_pad=32, rounds=8, reps=2,
        operands=(mat,),
    )
    assert qps > 0
    assert len(diag["per_batch_ms_samples"]) == 2
    assert diag["full_scan_s_median"] > 0


def test_timed_scan_single_round_does_not_divide_by_zero():
    """rounds=1 used to make half == rounds and divide by zero; it must
    clamp to two distinct scan lengths instead."""
    import jax.numpy as jnp

    from benchmarks.roofline import timed_scan_qps

    qps, diag = timed_scan_qps(
        lambda qb: jnp.argsort(-qb[:, :4], axis=1)[:, :2],
        batch=8, d=4, dim_pad=4, rounds=1, reps=1,
    )
    assert qps > 0

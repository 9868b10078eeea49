"""Physical roofline cross-checks + cache-proof scan timing.

Two measurement hazards on this dev TPU tunnel are documented in
docs/BENCH_NOTES.md ("Out-of-order dispatch completion"): the runtime
caches byte-identical dispatches, and `block_until_ready` can report
early.  Round 4 adds a third observed artifact: even a scan over a
*rotated* stack reads absurdly fast when the same stack object is
re-dispatched for min-of-3 timing (LADDER exact rung measured 3.16M
QPS — 4x the v5e HBM roofline for a 256 MB bf16 matrix read per
batch, which is physically impossible).

This module provides the two defenses every timed loop now uses:

1. ``timed_scan_qps`` — every timed invocation scans a NEVER-BEFORE-
   SEEN query stack (device-RNG generated, so no H2D cost), with the
   tunnel's per-invocation RPC cancelled by two-point differencing
   (time at ``rounds`` and ``rounds/2`` scans and divide the delta).
2. ``roofline_qps`` — the speed-of-light bound from the chip's HBM
   bandwidth and MXU throughput.  A measured number above the bound
   is reported as the bound, with the raw measurement preserved under
   ``measured_qps_raw`` and ``clamped_to_roofline: true`` — an
   impossible number is a measurement artifact by definition.

Chip table: v5e (TPU v5 lite) = 819 GB/s HBM, 197 TFLOP/s bf16,
394 TOP/s int8 (public spec sheet figures).
"""

from __future__ import annotations

import functools
import statistics
import time

# device_kind substring -> (hbm_bytes_per_s, bf16_flops, int8_ops)
_CHIPS = {
    "v5 lite": (819e9, 197e12, 394e12),
    "v5e": (819e9, 197e12, 394e12),
    "v5p": (2765e9, 459e12, 918e12),
    "v4": (1228e9, 275e12, 275e12),
    "v6 lite": (1640e9, 918e12, 1836e12),
    "v6e": (1640e9, 918e12, 1836e12),
}


def device_specs() -> tuple[float, float, float] | None:
    """(HBM B/s, bf16 FLOP/s, int8 OP/s) for the attached chip, or
    None when the backend is not a recognized TPU (no clamping then —
    the CPU fallback path has no published roofline)."""
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for sub, specs in _CHIPS.items():
        if sub in kind:
            return specs
    return None


def roofline_batch_seconds(
    *, bytes_read: float, mxu_ops: float, dtype: str = "bf16",
) -> float | None:
    """Speed-of-light seconds for one batch: max of the HBM read time
    and the MXU time (they overlap on TPU).  ``dtype`` picks the MXU
    rate ("bf16" or "int8")."""
    specs = device_specs()
    if specs is None:
        return None
    bw, bf16, int8 = specs
    rate = int8 if dtype == "int8" else bf16
    return max(bytes_read / bw, mxu_ops / rate)


def apply_roofline(row: dict, batch: int, floor_s: float | None) -> dict:
    """Clamp ``row['qps']`` to the physical bound, preserving the raw
    measurement.  No-op when the bound is unknown or not exceeded."""
    if floor_s is None or floor_s <= 0:
        return row
    cap = batch / floor_s
    row["roofline_qps"] = round(cap, 1)
    if row["qps"] > cap:
        row["measured_qps_raw"] = row["qps"]
        row["qps"] = round(cap, 1)
        row["clamped_to_roofline"] = True
    return row


def timed_scan_qps(
    fn_q, *, batch: int, d: int, dim_pad: int, rounds: int = 48,
    reps: int = 3, seed: int = 7, normalize: bool = True,
    operands: tuple = (),
) -> tuple[float, dict]:
    """Sustained per-batch throughput of
    ``fn_q(qb, *operands) -> idx [B, k]``.

    Each timed invocation runs ONE jitted ``lax.scan`` over a
    device-generated stack of ``rounds`` distinct query batches that
    has never been dispatched before (jax.random from a fresh key), so
    neither the byte-identical-dispatch cache nor cross-invocation
    coalescing can serve it.  The tunnel's one RPC per invocation is
    cancelled by differencing the ``rounds`` and ``rounds/2`` scans;
    the median of ``reps`` independent differences is reported.

    Pass every LARGE device array (the resident matrix, scales, norms)
    through ``operands``, never by closure: closure-captured arrays
    become constants of the lowered computation, and this dev tunnel's
    remote-compile endpoint rejects the resulting multi-hundred-MB
    compile request with HTTP 413.

    Returns ``(qps, diagnostics)``.
    """
    import jax
    import jax.numpy as jnp

    # the estimate differences a full scan against a half-length scan,
    # so two distinct lengths are required (rounds=1 would divide by 0)
    rounds = max(rounds, 2)
    half = max(rounds // 2, 1)

    @jax.jit
    def scan_over(stack, *ops):
        def body(carry, qb):
            idx = fn_q(qb, *ops)
            return carry, idx[:, 0]

        _, outs = jax.lax.scan(body, 0, stack)
        return outs

    @functools.partial(jax.jit, static_argnames=("r",))
    def make_stack(key, r):
        qs = jax.random.normal(key, (r, batch, d), jnp.float32)
        if normalize:
            qs = qs / (jnp.linalg.norm(qs, axis=-1, keepdims=True) + 1e-9)
        if dim_pad > d:
            qs = jnp.pad(qs, ((0, 0), (0, 0), (0, dim_pad - d)))
        return qs

    key = jax.random.PRNGKey(seed)
    for r in (half, rounds):  # compile both scan lengths off the clock
        key, sub = jax.random.split(key)
        jax.block_until_ready(scan_over(make_stack(sub, r), *operands))

    samples = []
    raw = []
    for _ in range(reps):
        times = {}
        for r in (half, rounds):
            key, sub = jax.random.split(key)
            stack = jax.block_until_ready(make_stack(sub, r))
            t0 = time.perf_counter()
            out = scan_over(stack, *operands)
            jax.block_until_ready(out)
            times[r] = time.perf_counter() - t0
        raw.append(times)
        samples.append(
            max(
                (times[rounds] - times[half]) / (rounds - half),
                times[rounds] / rounds / 8,
            )
        )
    per_batch = statistics.median(samples)
    diag = {
        "per_batch_ms_samples": [round(s * 1e3, 4) for s in samples],
        "rounds": rounds,
        "full_scan_s_median": round(
            statistics.median(t[rounds] for t in raw), 4
        ),
    }
    return batch / per_batch, diag

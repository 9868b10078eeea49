"""int8 coarse-kernel experiment: why is the fused int8 path ~10x off
its HBM floor at 10M (17 ms/batch vs 1.6 ms read floor, LADDER_r05_10M)
when the bf16 kernel runs at ~75% of light?

Hypotheses measured here, each as a standalone Pallas variant timed
with the cache-proof scan (benchmarks/roofline.timed_scan_qps):

- ``shipped``      — current ``int8_fused_coarse``: int8 x int8 MXU dot
                     to int32, f32 de-scale by BOTH per-row and
                     per-query scales, full-tile n_valid mask, packed
                     bucket reduction.
- ``bf16dot``      — the int8 tile CONVERTS to bf16 in-kernel and the
                     dot runs on the bf16 MXU path.  Bit-exact with the
                     int32 dot: every |v| <= 127 is exactly
                     representable in bf16 and the f32 accumulation of
                     128 products <= 2^24 is exact — so containment is
                     IDENTICAL by construction, only the MXU lowering
                     changes.  The per-query scale moves POST-kernel
                     (a positive per-query constant cannot change that
                     query's ranking), dropping one broadcast multiply.
- ``bf16dot_tail`` — bf16dot + the n_valid mask applied only in tiles
                     that contain junk rows (``pl.when`` containment
                     test; interior tiles skip the select pass).
- ``i32pack``      — per-BUCKET symmetric scales (shared by each
                     64-row reduction window, so the in-bucket max
                     commutes with de-scaling): the reduction runs in
                     the int32 dot domain with the in-bucket index
                     shift-packed into the low 6 bits
                     (``dots << 6 | idx`` — dots <= 127*127*128 < 2^21,
                     so the shift cannot overflow), and the f32
                     de-scale + mantissa re-pack touch only the
                     [buckets, B] winner matrix (1/64th of a pass).
                     Trades per-row scale resolution for VPU passes;
                     containment measured, not assumed.
- ``dot_i8`` / ``dot_bf16`` — floor probes: the dot plus a plain
                     unpacked bucket max, no mask, no de-scale.  The
                     spread between them isolates the Mosaic int8-vs-
                     bf16 matmul lowering; their distance from the
                     full variants isolates the VPU epilogue.

Usage: python benchmarks/i8_sweep.py [--n 1000000] [--k-cand 80]
       [--variants shipped,bf16dot,...] [--interpret]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


INT32_MIN = -(2 ** 31)


def quantize_rows_bucketed(rows: np.ndarray, bucket: int):
    """Symmetric int8 with one scale per ``bucket`` consecutive rows
    (the i32pack variant's quantization; zero buckets get scale 1)."""
    n, d = rows.shape
    assert n % bucket == 0
    g = rows.reshape(n // bucket, bucket, d)
    peak = np.abs(g).max(axis=(1, 2))
    scales = np.where(peak > 0, peak / 127.0, 1.0).astype(np.float32)
    values = np.clip(
        np.rint(g / scales[:, None, None]), -127, 127
    ).astype(np.int8).reshape(n, d)
    return values, scales


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k-cand", type=int, default=80)
    ap.add_argument("--rounds", type=int, default=64)
    ap.add_argument(
        "--variants",
        default="shipped,bf16dot,bf16dot_tail,i32pack,dot_i8,dot_bf16",
    )
    ap.add_argument(
        "--tile", type=int, default=0,
        help="force tile_rows (default: the shipped _i8_tile_rows choice)",
    )
    ap.add_argument(
        "--interpret", action="store_true",
        help="Pallas interpret mode (CPU correctness smoke)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if args.interpret:
        _orig_call = pl.pallas_call
        pl.pallas_call = (
            lambda *a, **kw: _orig_call(*a, **{**kw, "interpret": True})
        )

    from benchmarks.ladder import _corpus, _oracle
    from benchmarks.roofline import roofline_batch_seconds, timed_scan_qps
    import helix_tpu.ops.fused_topk as ft
    import helix_tpu.ops.quant as qt
    from helix_tpu.ops.distance import PackedMatrix

    n, d, batch, k_cand = args.n, args.d, args.batch, args.k_cand
    log = lambda m: print(m, file=sys.stderr, flush=True)  # noqa: E731
    log(f"# i8 sweep: N={n} d={d} batch={batch} k_cand={k_cand} "
        f"backend={jax.default_backend()}")

    data, queries = _corpus(n, d, batch, 1)
    matrix = PackedMatrix(d, "cosine")
    matrix.extend(data)
    dim_pad = matrix.dim_pad
    oracle = _oracle(data, queries[:batch], args.k)
    qs_pad = jnp.asarray(matrix.prepare_queries(queries[:batch]))
    n_valid = jnp.int32(matrix.n)

    # --- operands -------------------------------------------------
    n_pad = ft.pad_rows_for_fused(matrix.n)
    rows = np.zeros((n_pad, dim_pad), np.float32)
    rows[: matrix.n] = matrix.data[: matrix.n]
    v_row, s_row = qt.quantize_rows(rows)
    xs_i8 = PackedMatrix._upload(v_row)
    xscales = jnp.asarray(s_row.reshape(-1, 1))
    v_bkt, s_bkt = quantize_rows_bucketed(rows, ft.BUCKET)
    xs_i8b = PackedMatrix._upload(v_bkt)
    bscales = jnp.asarray(s_bkt.reshape(-1, 1))
    # compact row-scale layout: [n_pad // 128, 128] f32 — lane-dense,
    # vs the shipped [n_pad, 1] column that Mosaic pads to 128 lanes
    # (4 MB of VMEM per 8192-row tile buffer; the measured epilogue
    # catastrophe — see ep_astype vs dot_i8)
    xscales2d = jnp.asarray(s_row.reshape(-1, 128))
    # global-scale quantization (cosine rows are unit-norm, |v| <= 1):
    # one scale for the whole matrix -> no scale operand in the kernel
    # and ranking needs no de-scale at all (monotone).  Containment is
    # measured, not assumed.
    v_g = np.clip(np.rint(rows * 127.0), -127, 127).astype(np.int8)
    xs_i8g = PackedMatrix._upload(v_g)
    jax.block_until_ready((xs_i8, xs_i8b, xs_i8g))
    del rows, v_row, v_bkt, v_g

    tile_rows = args.tile or qt._i8_tile_rows(dim_pad, 256)
    if args.tile:
        qt._i8_tile_rows = lambda _d, _b=None, _t=args.tile: _t
        qt._i8_bucket_scores.clear_cache()
        qt.int8_fused_coarse.clear_cache()
    bpt = tile_rows // ft.BUCKET
    num_tiles = n_pad // tile_rows
    total_buckets = num_tiles * bpt
    log(f"# tile_rows={tile_rows} grid={num_tiles} buckets={total_buckets}")

    floor_i8 = roofline_batch_seconds(
        bytes_read=n_pad * dim_pad,
        mxu_ops=2.0 * batch * n_pad * dim_pad, dtype="int8",
    )
    floor_bf16 = roofline_batch_seconds(
        bytes_read=n_pad * dim_pad,  # still a 1-byte/dim matrix read
        mxu_ops=2.0 * batch * n_pad * dim_pad, dtype="bf16",
    )
    if floor_i8:
        log(f"# roofline: int8-MXU {batch / floor_i8:,.0f} QPS, "
            f"bf16-MXU {batch / floor_bf16:,.0f} QPS")

    # --- kernels ----------------------------------------------------
    def iota_rows():
        return jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)

    def k_bf16dot(tail_only: bool):
        def _kernel(n_valid_ref, q_ref, x_ref, xscale_ref, vals_ref):
            tile_id = pl.program_id(0)
            dots = jax.lax.dot_general(
                x_ref[:].astype(jnp.bfloat16), q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sims = dots * xscale_ref[:]
            if not tail_only:
                rows_g = tile_id * tile_rows + iota_rows()
                masked = jnp.where(
                    rows_g < n_valid_ref[0, 0], sims, ft.NEG_SENTINEL
                )
                vals_ref[:] = ft.bucket_reduce_packed(masked, tile_rows)
                return
            has_junk = (tile_id + 1) * tile_rows > n_valid_ref[0, 0]

            @pl.when(jnp.logical_not(has_junk))
            def _interior():
                vals_ref[:] = ft.bucket_reduce_packed(sims, tile_rows)

            @pl.when(has_junk)
            def _tail():
                rows_g = tile_id * tile_rows + iota_rows()
                masked = jnp.where(
                    rows_g < n_valid_ref[0, 0], sims, ft.NEG_SENTINEL
                )
                vals_ref[:] = ft.bucket_reduce_packed(masked, tile_rows)

        return _kernel

    def k_i32pack():
        def _kernel(n_valid_ref, q_ref, x_ref, bscale_ref, vals_ref):
            tile_id = pl.program_id(0)
            dots = jax.lax.dot_general(
                x_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            in_b = iota_rows() & jnp.int32(ft.BUCKET - 1)
            packed = (dots << 6) | in_b

            def reduce(p):
                grouped = p.reshape(bpt, ft.BUCKET, p.shape[1])
                m = jnp.max(grouped, axis=1)            # [bpt, B] int32
                idx = m & jnp.int32(ft.BUCKET - 1)
                sims = (m >> 6).astype(jnp.float32) * bscale_ref[:]
                bits = jax.lax.bitcast_convert_type(sims, jnp.int32)
                return jax.lax.bitcast_convert_type(
                    (bits & jnp.int32(~(ft.BUCKET - 1))) | idx,
                    jnp.float32,
                )

            has_junk = (tile_id + 1) * tile_rows > n_valid_ref[0, 0]

            @pl.when(jnp.logical_not(has_junk))
            def _interior():
                vals_ref[:] = reduce(packed)

            @pl.when(has_junk)
            def _tail():
                rows_g = tile_id * tile_rows + iota_rows()
                masked = jnp.where(
                    rows_g < n_valid_ref[0, 0], packed, jnp.int32(INT32_MIN)
                )
                vals_ref[:] = reduce(masked)

        return _kernel

    def k_scale2d():
        """Shipped epilogue with the row scales fed lane-dense
        ([tile_rows // 128, 128] block) and reshaped to a column
        in-kernel — numerics identical to shipped."""
        def _kernel(n_valid_ref, q_ref, x_ref, xscale_ref, vals_ref):
            tile_id = pl.program_id(0)
            dots = jax.lax.dot_general(
                x_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sc = xscale_ref[:].reshape(tile_rows, 1)
            sims = dots.astype(jnp.float32) * sc
            rows_g = tile_id * tile_rows + iota_rows()
            sims = jnp.where(rows_g < n_valid_ref[0, 0], sims,
                             ft.NEG_SENTINEL)
            vals_ref[:] = ft.bucket_reduce_packed(sims, tile_rows)

        return _kernel

    def k_gscale():
        """No scale operand at all: global-scale int8 rows, ranking in
        the raw-dot domain (monotone under one positive scale)."""
        def _kernel(n_valid_ref, q_ref, x_ref, vals_ref):
            tile_id = pl.program_id(0)
            dots = jax.lax.dot_general(
                x_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sims = dots.astype(jnp.float32)
            rows_g = tile_id * tile_rows + iota_rows()
            sims = jnp.where(rows_g < n_valid_ref[0, 0], sims,
                             ft.NEG_SENTINEL)
            vals_ref[:] = ft.bucket_reduce_packed(sims, tile_rows)

        return _kernel

    def k_dot(as_bf16: bool):
        def _kernel(n_valid_ref, q_ref, x_ref, vals_ref):
            x = x_ref[:]
            if as_bf16:
                dots = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), q_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                dots = jax.lax.dot_general(
                    x, q_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            grouped = dots.reshape(bpt, ft.BUCKET, dots.shape[1])
            vals_ref[:] = jnp.max(grouped, axis=1)

        return _kernel

    def k_epilogue(do_astype: bool, do_scale: bool, do_mask: bool,
                   do_pack: bool):
        """Decomposition probes: int8 dot + a chosen epilogue subset.
        Timing-only (results are wrong without the full epilogue)."""
        def _kernel(n_valid_ref, q_ref, x_ref, xscale_ref, vals_ref):
            tile_id = pl.program_id(0)
            dots = jax.lax.dot_general(
                x_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sims = dots.astype(jnp.float32) if do_astype else dots
            if do_scale:
                sims = sims * xscale_ref[:]
            if do_mask:
                rows_g = tile_id * tile_rows + iota_rows()
                sims = jnp.where(
                    rows_g < n_valid_ref[0, 0], sims, ft.NEG_SENTINEL
                )
            if do_pack:
                vals_ref[:] = ft.bucket_reduce_packed(sims, tile_rows)
            else:
                grouped = sims.reshape(bpt, ft.BUCKET, sims.shape[1])
                vals_ref[:] = jnp.max(grouped, axis=1).astype(jnp.float32)

        return _kernel

    # --- pallas_call wrappers -----------------------------------------
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    def q_spec(b, qdtype):
        del qdtype
        return pl.BlockSpec((b, dim_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec(
        (tile_rows, dim_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rowscale_spec = pl.BlockSpec(
        (tile_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rowscale2d_spec = pl.BlockSpec(
        (tile_rows // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    bktscale_spec = pl.BlockSpec(
        (bpt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (bpt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def call(kernel, b, scale_spec, *ops):
        specs = [smem, q_spec(b, None), x_spec]
        if scale_spec is not None:
            specs.append(scale_spec)
        (vals,) = pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(num_tiles,),
                in_specs=specs,
                out_specs=[pl.BlockSpec(
                    (bpt, b), lambda i: (i, 0), memory_space=pltpu.VMEM
                )],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((total_buckets, b), jnp.float32)
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_pad * dim_pad,
                bytes_accessed=n_pad * dim_pad + b * dim_pad
                + b * total_buckets * 4,
                transcendentals=0,
            ),
        )(*ops)
        return vals

    def extract(vals_t, kc):
        best_s, pos = jax.lax.approx_max_k(vals_t, kc, recall_target=0.95)
        arg = jax.lax.bitcast_convert_type(
            best_s, jnp.int32
        ) & jnp.int32(ft.BUCKET - 1)
        return pos * ft.BUCKET + arg

    kc = min(k_cand, total_buckets)

    # --- variant fns (qb, *ops) -> ids [B, kc] -----------------------
    def fn_shipped(qb, a_i8g):
        # shipped is the scale-free global-scale kernel as of round 5
        # (the per-row-scale original is preserved as variant fns below
        # for the decomposition history)
        _, ids = qt.int8_fused_coarse(
            a_i8g, qb, n_valid, k=kc,
            interpret=args.interpret,
        )
        return ids

    @jax.jit
    def fn_bf16dot(qb, a_i8, a_sc):
        q_i8, _ = qt._quantize_queries(qb)
        vals = call(
            k_bf16dot(False), qb.shape[0], rowscale_spec,
            n_valid.reshape(1, 1), q_i8.astype(jnp.bfloat16), a_i8, a_sc,
        )
        return extract(vals.T, kc)

    @jax.jit
    def fn_bf16dot_tail(qb, a_i8, a_sc):
        q_i8, _ = qt._quantize_queries(qb)
        vals = call(
            k_bf16dot(True), qb.shape[0], rowscale_spec,
            n_valid.reshape(1, 1), q_i8.astype(jnp.bfloat16), a_i8, a_sc,
        )
        return extract(vals.T, kc)

    @jax.jit
    def fn_i32pack(qb, a_i8b, a_bsc):
        q_i8, _ = qt._quantize_queries(qb)
        vals = call(
            k_i32pack(), qb.shape[0], bktscale_spec,
            n_valid.reshape(1, 1), q_i8, a_i8b, a_bsc,
        )
        return extract(vals.T, kc)

    @jax.jit
    def fn_scale2d(qb, a_i8, a_sc2d):
        q_i8, _ = qt._quantize_queries(qb)
        vals = call(
            k_scale2d(), qb.shape[0], rowscale2d_spec,
            n_valid.reshape(1, 1), q_i8, a_i8, a_sc2d,
        )
        return extract(vals.T, kc)

    @jax.jit
    def fn_gscale(qb, a_i8g):
        q_i8, _ = qt._quantize_queries(qb)
        vals = call(
            k_gscale(), qb.shape[0], None,
            n_valid.reshape(1, 1), q_i8, a_i8g,
        )
        return extract(vals.T, kc)

    @jax.jit
    def fn_dot_i8(qb, a_i8):
        q_i8, _ = qt._quantize_queries(qb)
        return call(
            k_dot(False), qb.shape[0], None,
            n_valid.reshape(1, 1), q_i8, a_i8,
        )

    @jax.jit
    def fn_dot_bf16(qb, a_i8):
        q_i8, _ = qt._quantize_queries(qb)
        return call(
            k_dot(True), qb.shape[0], None,
            n_valid.reshape(1, 1), q_i8.astype(jnp.bfloat16), a_i8,
        )

    def call_t(kernel, b, scale_spec, *ops):
        """pallas_call emitting [B, total_buckets] (kernel writes the
        per-tile winner block pre-transposed: column-blocked output)."""
        specs = [smem, q_spec(b, None), x_spec]
        if scale_spec is not None:
            specs.append(scale_spec)
        (vals,) = pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(num_tiles,),
                in_specs=specs,
                out_specs=[pl.BlockSpec(
                    (b, bpt), lambda i: (0, i), memory_space=pltpu.VMEM
                )],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, total_buckets), jnp.float32)
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_pad * dim_pad,
                bytes_accessed=n_pad * dim_pad + b * dim_pad
                + b * total_buckets * 4,
                transcendentals=0,
            ),
        )(*ops)
        return vals

    def k_full_t():
        """Full shipped epilogue, winner block transposed in-VMEM (a
        [bpt, B] -> [B, bpt] relayout per tile) so the XLA-side 16 MB
        transpose disappears."""
        def _kernel(n_valid_ref, q_ref, x_ref, xscale_ref, vals_ref):
            tile_id = pl.program_id(0)
            dots = jax.lax.dot_general(
                x_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sims = dots.astype(jnp.float32) * xscale_ref[:]
            rows_g = tile_id * tile_rows + iota_rows()
            sims = jnp.where(rows_g < n_valid_ref[0, 0], sims,
                             ft.NEG_SENTINEL)
            vals_ref[:] = ft.bucket_reduce_packed(sims, tile_rows).T

        return _kernel

    def k_dotf32():
        """int8 inputs, f32 preferred accumulation (does Mosaic's MXU
        path emit f32 from s8 operands without a full-tile convert?),
        full epilogue."""
        def _kernel(n_valid_ref, q_ref, x_ref, xscale_ref, vals_ref):
            tile_id = pl.program_id(0)
            sims = jax.lax.dot_general(
                x_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * xscale_ref[:]
            rows_g = tile_id * tile_rows + iota_rows()
            sims = jnp.where(rows_g < n_valid_ref[0, 0], sims,
                             ft.NEG_SENTINEL)
            vals_ref[:] = ft.bucket_reduce_packed(sims, tile_rows)

        return _kernel

    def make_ep(do_astype, do_scale, do_mask, do_pack, with_amk):
        kern = k_epilogue(do_astype, do_scale, do_mask, do_pack)

        @jax.jit
        def fn(qb, a_i8, a_sc):
            q_i8, _ = qt._quantize_queries(qb)
            vals = call(
                kern, qb.shape[0], rowscale_spec,
                n_valid.reshape(1, 1), q_i8, a_i8, a_sc,
            )
            if not with_amk:
                return vals
            return extract(vals.T, kc)

        return fn

    @jax.jit
    def fn_xT(qb, a_i8):
        q_i8, _ = qt._quantize_queries(qb)
        return call(
            k_dot(False), qb.shape[0], None,
            n_valid.reshape(1, 1), q_i8, a_i8,
        ).T

    @jax.jit
    def fn_full_noT(qb, a_i8, a_sc):
        q_i8, _ = qt._quantize_queries(qb)
        vals = call_t(
            k_full_t(), qb.shape[0], rowscale_spec,
            n_valid.reshape(1, 1), q_i8, a_i8, a_sc,
        )
        return extract(vals, kc)

    @jax.jit
    def fn_dotf32(qb, a_i8, a_sc):
        q_i8, _ = qt._quantize_queries(qb)
        vals = call(
            k_dotf32(), qb.shape[0], rowscale_spec,
            n_valid.reshape(1, 1), q_i8, a_i8, a_sc,
        )
        return extract(vals.T, kc)

    variants = {
        "shipped": (fn_shipped, (xs_i8g,), True),
        # full epilogue, transposed output blocks (no XLA transpose)
        "full_noT": (fn_full_noT, (xs_i8, xscales), True),
        # s8 x s8 -> f32 MXU accumulation (no full-tile astype)
        "dotf32": (fn_dotf32, (xs_i8, xscales), True),
        # decomposition probes (timing-only; no containment):
        # dot -> astype -> plain max
        "ep_astype": (
            make_ep(True, False, False, False, False),
            (xs_i8, xscales), False,
        ),
        # dot -> astype -> descale -> plain max
        "ep_scale": (
            make_ep(True, True, False, False, False),
            (xs_i8, xscales), False,
        ),
        # dot -> astype -> packed reduce (no scale/mask)
        "ep_pack": (
            make_ep(True, False, False, True, False),
            (xs_i8, xscales), False,
        ),
        # dot -> astype -> mask -> plain max
        "ep_mask": (
            make_ep(True, False, True, False, False),
            (xs_i8, xscales), False,
        ),
        # full in-kernel epilogue + XLA transpose + approx_max_k
        "ep_full_amk": (
            make_ep(True, True, True, True, True),
            (xs_i8, xscales), False,
        ),
        # bare dot + XLA transpose (isolates the [buckets, B] -> [B,
        # buckets] relayout)
        "xT": (fn_xT, (xs_i8,), False),
        # bare dot + plain max + transpose + approx_max_k (isolates the
        # XLA-side selection vs the in-kernel epilogue)
        "amk": (
            make_ep(False, False, False, False, True),
            (xs_i8, xscales), False,
        ),
        # shipped numerics, lane-dense scale operand
        "scale2d": (fn_scale2d, (xs_i8, xscales2d), True),
        # global-scale rows, no scale operand (containment measured)
        "gscale": (fn_gscale, (xs_i8g,), True),
        "bf16dot": (fn_bf16dot, (xs_i8, xscales), True),
        "bf16dot_tail": (fn_bf16dot_tail, (xs_i8, xscales), True),
        "i32pack": (fn_i32pack, (xs_i8b, bscales), True),
        "dot_i8": (fn_dot_i8, (xs_i8,), False),
        "dot_bf16": (fn_dot_bf16, (xs_i8,), False),
    }

    results = []
    for name in (v for v in args.variants.split(",") if v):
        fn, ops, has_ids = variants[name]
        try:
            if has_ids:
                ids = np.asarray(fn(qs_pad, *ops))
                hit = np.mean([
                    len(set(ids[i]) & set(oracle[i])) / oracle.shape[1]
                    for i in range(oracle.shape[0])
                ])
            else:
                jax.block_until_ready(fn(qs_pad, *ops))
                hit = None
            qps, diag = timed_scan_qps(
                fn, batch=batch, d=d, dim_pad=dim_pad,
                rounds=args.rounds, operands=ops,
            )
        except Exception as exc:  # noqa: BLE001
            log(f"# {name}: FAILED {exc!r}")
            results.append({"variant": name, "error": repr(exc)})
            continue
        row = {
            "variant": name, "qps": round(qps, 1),
            "per_batch_ms": diag["per_batch_ms_samples"],
        }
        if hit is not None:
            row["containment_at_kcand"] = round(float(hit), 4)
        results.append(row)
        log(f"# {name}: {qps:,.0f} QPS"
            + (f" containment {hit:.4f}" if hit is not None else ""))

    print(json.dumps({
        "metric": f"int8 coarse kernel sweep (N={n}, d={d}, batch={batch}, "
                  f"k_cand={kc})",
        "roofline_qps_int8_mxu": round(batch / floor_i8, 1)
        if floor_i8 else None,
        "roofline_qps_bf16_mxu": round(batch / floor_bf16, 1)
        if floor_bf16 else None,
        "tile_rows": tile_rows,
        "variants": results,
    }))


if __name__ == "__main__":
    main()

"""int8 quantized residency tier: 6x more vectors per chip.

The exact serving tier keeps bf16+f32 copies resident (6 bytes/dim);
past the HBM budget the only option used to be the host-IVF streamed
tier — a ~90x QPS cliff (BENCH_NOTES round 2).  This tier sits between
them (reference capacity envelope: ``db_max_size_gb=20``,
``helix-cli/src/config.rs:203-205``):

- Rows quantize to **int8 with a per-row symmetric scale** (1 byte/dim
  + 4 bytes/row resident — 6x the exact tier's capacity).
- The coarse phase is an **int8 x int8 MXU matmul** (``dot_general``
  with ``preferred_element_type=int32`` — the MXU runs int8 at 2x bf16
  throughput), de-scaled to f32 scores, then ``approx_max_k``.
- Candidates re-rank **exactly in f32 against the host-resident
  matrix** (the same native C++ re-rank the sharded tier uses), so
  quantization noise only has to keep the true top-k inside the
  candidate set, not rank it.

Per-row scales matter: cosine rows are unit-norm but their max |x|
varies ~3x across rows; a global scale costs ~2 bits of effective
precision on the flattest rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def quantize_rows(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8: ``(values int8 [N, D], scales f32 [N])``.
    Zero rows get scale 1 (values all zero)."""
    peak = np.abs(rows).max(axis=1)
    scales = np.where(peak > 0, peak / 127.0, 1.0).astype(np.float32)
    values = np.clip(
        np.rint(rows / scales[:, None]), -127, 127
    ).astype(np.int8)
    return values, scales


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def int8_coarse_topk(
    xs_i8: jax.Array,       # [N, D] int8 resident matrix
    x_scales: jax.Array,    # [N] f32 per-row scales
    qs: jax.Array,          # [B, D] f32 query batch (rows padded like xs)
    n_valid: jax.Array,     # scalar int32
    sq_norms: jax.Array,    # [N] f32 squared norms (l2 only)
    *,
    k: int,
    metric: str = "cosine",
) -> tuple[jax.Array, jax.Array]:
    """Quantized coarse phase: (approx similarities [B, k], indices).

    Queries quantize on device with per-query symmetric scales; the
    integer dot de-scales to f32 similarity ``~ q . x`` (l2 uses the
    standard ``2 q.x - |x|^2`` ordering surrogate).
    """
    n = xs_i8.shape[0]
    q_peak = jnp.max(jnp.abs(qs), axis=1)
    q_scales = jnp.where(q_peak > 0, q_peak / 127.0, 1.0)
    q_i8 = jnp.clip(
        jnp.round(qs / q_scales[:, None]), -127, 127
    ).astype(jnp.int8)
    dots = jax.lax.dot_general(
        q_i8, xs_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                   # [B, N]
    sims = (
        dots.astype(jnp.float32)
        * q_scales[:, None]
        * x_scales[None, :]
    )
    if metric == "l2":
        sims = 2.0 * sims - sq_norms[None, :]
    cols = jnp.arange(n, dtype=jnp.int32)
    sims = jnp.where((cols < n_valid)[None, :], sims, -jnp.inf)
    return jax.lax.approx_max_k(sims, k, recall_target=0.99)


class QuantizedResident:
    """Device-resident int8 copy of a packed matrix, refreshed by
    version (same scheme as PackedMatrix's bf16 cache)."""

    def __init__(self):
        self._cached: tuple | None = None  # (version, xs_i8, scales)

    def arrays(self, matrix) -> tuple[jax.Array, jax.Array]:
        from .distance import _round_up

        cached = self._cached
        if cached is not None and cached[0] == matrix.version:
            return cached[1], cached[2]
        n_rows = _round_up(max(matrix.n, 1), matrix.ROW_PAD)
        rows = matrix.data[:n_rows]
        values, scales = quantize_rows(rows)
        xs_i8 = jnp.asarray(values)
        sc = jnp.asarray(scales)
        xs_i8.block_until_ready()
        self._cached = (matrix.version, xs_i8, sc)
        return xs_i8, sc

    def search(
        self, matrix, queries: np.ndarray, k: int, live_mask: np.ndarray,
        metric: str,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Coarse int8 top-k + exact f32 host re-rank.

        Returns (distances [B, k], positions) ascending, tombstones
        dropped via the re-rank's sentinel path.
        """
        from ..native import rerank as native_rerank

        n = matrix.n
        xs_i8, scales = self.arrays(matrix)
        qs = matrix.prepare_queries(queries)
        k_cand = min(max(8 * k, 64), n)
        _, cand = int8_coarse_topk(
            xs_i8, scales, jnp.asarray(qs), jnp.int32(n),
            jnp.asarray(matrix.sq_norms[: xs_i8.shape[0]]),
            k=k_cand, metric=metric,
        )
        cand = np.asarray(cand, np.int64)
        cand = np.where(
            (cand < n) & live_mask[np.clip(cand, 0, n - 1)], cand, -1
        )
        return native_rerank(
            matrix.data[:n], matrix.sq_norms[:n], qs, cand, k, metric
        )


class ShardedInt8Search:
    """Multi-chip int8 coarse phase: rows shard across the mesh, each
    device runs the int8 MXU matmul over its slice, and an ICI
    all-gather merges per-shard candidates — the quantized rung of the
    residency ladder at mesh scale (6x the per-chip capacity of the
    sharded exact tier)."""

    def __init__(self, mesh, k: int, metric: str = "cosine"):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.k = k
        self.metric = metric
        self.n_shard = int(mesh.shape["shard"])
        self._P = P
        self._NamedSharding = NamedSharding
        self._fn = self._build()

    def _build(self):
        import jax

        P = self._P
        k = self.k
        metric = self.metric
        n_shard = self.n_shard

        def shard_fn(xs_i8, scales, sq, qs, n_valid):
            rows = xs_i8.shape[0]
            shard_id = jax.lax.axis_index("shard")
            local_valid = jnp.clip(n_valid - shard_id * rows, 0, rows)
            sims, idx = int8_coarse_topk(
                xs_i8, scales, qs, local_valid, sq,
                k=min(k, rows), metric=metric,
            )
            global_i = idx + shard_id * rows
            all_s = jax.lax.all_gather(sims, "shard", axis=0)
            all_i = jax.lax.all_gather(global_i, "shard", axis=0)
            b = qs.shape[0]
            kk = all_s.shape[-1]
            flat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(b, n_shard * kk)
            flat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, n_shard * kk)
            top_s, pos = jax.lax.top_k(flat_s, min(k, n_shard * kk))
            top_i = jnp.take_along_axis(flat_i, pos, axis=1)
            return top_s, top_i

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(
                P("shard", None), P("shard"), P("shard"), P(None, None), P(),
            ),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        return jax.jit(mapped)

    def shard_arrays(self, values: np.ndarray, scales: np.ndarray,
                     sq_norms: np.ndarray):
        """Pad + device_put with row sharding; returns
        ``(xs_i8, scales, sq, n_valid)``."""
        import jax

        P, NS = self._P, self._NamedSharding
        n = len(values)
        rows = -(-n // self.n_shard)
        rows = ((rows + 127) // 128) * 128
        total = rows * self.n_shard
        if total != n:
            pv = np.zeros((total, values.shape[1]), np.int8)
            pv[:n] = values
            ps = np.ones(total, np.float32)
            ps[:n] = scales
            pq = np.zeros(total, np.float32)
            pq[:n] = sq_norms
        else:
            pv, ps, pq = values, scales, sq_norms
        xs = jax.device_put(pv, NS(self.mesh, P("shard", None)))
        sc = jax.device_put(ps, NS(self.mesh, P("shard")))
        sq = jax.device_put(pq, NS(self.mesh, P("shard")))
        return xs, sc, sq, n

    def __call__(self, xs_i8, scales, sq, qs: np.ndarray, n_valid: int):
        import jax

        qd = jax.device_put(
            np.asarray(qs, np.float32),
            self._NamedSharding(self.mesh, self._P(None, None)),
        )
        return self._fn(xs_i8, scales, sq, qd, jnp.int32(n_valid))

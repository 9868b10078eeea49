"""Sharded vector search over a JAX device mesh.

The multi-chip design from SURVEY.md §2.3/§7.7 (the structural analog of
the reference's reader scale-out, ``README.md:248``): the packed vector
matrix is sharded row-wise across the ``shard`` mesh axis, each device
runs the exact search over its rows, and an ICI ``all_gather``
merges per-shard top-k candidates into the global top-k.  Queries can
additionally be data-parallel over a ``data`` axis.

Collective cost per query batch: one all-gather of ``[n_shard, B, k]``
floats + indices over ICI — tiny next to the per-shard distance scan, so
scaling is near-linear in shard count.

Everything is ``shard_map`` over a ``Mesh`` with static shapes; the same
code runs on a real TPU slice or on the CPU virtual-device mesh used in
tests and the driver's multi-chip dry run.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int = 1
) -> Mesh:
    """Build a (data, shard) mesh over the available devices."""
    devices = np.array(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % data != 0:
        raise ValueError(f"cannot split {n} devices into data={data}")
    return Mesh(devices.reshape(data, n // data), ("data", "shard"))


def _local_topk(xs, qs, n_valid, sq_norms, k, chunk, metric):
    """Per-shard chunked scan + running top-k (same scheme as ops.distance)."""
    from ..ops.distance import pick_chunk

    n, _ = xs.shape
    b = qs.shape[0]
    chunk = pick_chunk(n, min(chunk, n))
    # top_k/approx_max_k reject k wider than the scanned chunk; the
    # caller pads the merged result back out to the requested k
    k = min(k, chunk)
    num_chunks = n // chunk
    col_base = jnp.arange(chunk, dtype=jnp.int32)

    approx = xs.dtype == jnp.bfloat16

    def body(carry, start):
        best_s, best_i = carry
        block = jax.lax.dynamic_slice_in_dim(xs, start, chunk, axis=0)
        sims = jnp.dot(qs, block.T, preferred_element_type=jnp.float32)
        cols = start + col_base
        if metric == "l2":
            sq = jax.lax.dynamic_slice_in_dim(sq_norms, start, chunk, axis=0)
            sims = 2.0 * sims - sq[None, :]
        sims = jnp.where((cols < n_valid)[None, :], sims, -jnp.inf)
        if approx:
            s_chunk, i_local = jax.lax.approx_max_k(sims, k, recall_target=0.99)
        else:
            s_chunk, i_local = jax.lax.top_k(sims, k)
        i_chunk = cols[i_local]
        cat_s = jnp.concatenate([best_s, s_chunk], axis=1)
        cat_i = jnp.concatenate([best_i, i_chunk], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((b, k), -jnp.inf, jnp.float32),
        jnp.zeros((b, k), jnp.int32),
    )
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (best_s, best_i), _ = jax.lax.scan(body, init, starts)
    return best_s, best_i


def _fused_tile() -> int:
    from ..ops.fused_topk import TILE

    return TILE


def _local_fused(xs16, xs32, qs16, qs32, local_valid, k):
    """Per-shard fused packed-bucket candidates + exact f32 re-rank
    (ops/fused_topk.py), returning (similarities, local indices)."""
    from ..ops.fused_topk import BUCKET, NEG_SENTINEL, _bucket_scores

    b = qs16.shape[0]
    b_pad = max(128, ((b + 127) // 128) * 128)
    q_in = qs16
    if b_pad != b:
        q_in = jnp.pad(qs16, ((0, b_pad - b), (0, 0)))
    vals = _bucket_scores(xs16, q_in, local_valid).T      # [b_pad, buckets]
    total_buckets = vals.shape[1]
    k_cand = min(max(k, min(8 * k, 512), 64), total_buckets)
    best_packed, pos = jax.lax.approx_max_k(vals, k_cand, recall_target=0.95)
    arg = jax.lax.bitcast_convert_type(best_packed, jnp.int32) & jnp.int32(
        BUCKET - 1
    )
    cand_i = pos * BUCKET + arg
    cand = jnp.take(xs32, cand_i, axis=0, mode="clip")
    exact = jnp.einsum(
        "bkd,bd->bk", cand[:b], qs32.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    valid = best_packed[:b] > jnp.float32(NEG_SENTINEL / 2)
    exact = jnp.where(valid, exact, -jnp.inf)
    # at most k_cand candidates exist (one winner per bucket): clamp,
    # and let the caller pad the merged result back out to k
    best_s, top_pos = jax.lax.top_k(exact, min(k, k_cand))
    best_i = jnp.take_along_axis(cand_i[:b], top_pos, axis=1)
    return best_s, best_i


class ShardedVectorSearch:
    """Compiled sharded search over a fixed mesh + matrix shape.

    ``xs`` is laid out ``[n_shard * rows_per_shard, D]`` and sharded along
    rows; queries are replicated across ``shard`` and sharded across
    ``data``.  Returns global row indices.
    """

    def __init__(
        self,
        mesh: Mesh,
        k: int,
        metric: str = "cosine",
        chunk: int = 65536,
        bf16: bool | None = None,
        use_fused: bool | None = None,
    ):
        self.mesh = mesh
        self.k = k
        self.metric = metric
        self.chunk = chunk
        self.bf16 = bf16 if bf16 is not None else jax.default_backend() == "tpu"
        # Per-shard fused Pallas kernel (ops/fused_topk.py): TPU + cosine
        # only; shard_arrays pads each shard's rows to the fused tile.
        if use_fused is None:
            use_fused = (
                jax.default_backend() == "tpu"
                and metric == "cosine"
                and self.bf16
            )
        self.use_fused = use_fused
        self.n_shard = mesh.shape["shard"]
        self._fn = self._build()

    def _build(self):
        mesh = self.mesh
        k = self.k
        metric = self.metric
        chunk = self.chunk
        bf16 = self.bf16
        n_shard = self.n_shard

        use_fused = self.use_fused

        def shard_fn(xs, qs, n_valid, sq_norms):
            # xs: [rows_per_shard, D] local block; qs: [B_local, D]
            shard_id = jax.lax.axis_index("shard")
            rows = xs.shape[0]
            if bf16:
                xs_c, qs_c = xs.astype(jnp.bfloat16), qs.astype(jnp.bfloat16)
            else:
                xs_c, qs_c = xs, qs
            local_valid = jnp.clip(n_valid - shard_id * rows, 0, rows)
            if use_fused and rows % _fused_tile() == 0:
                best_s, best_i = _local_fused(
                    xs_c, xs, qs_c, qs, local_valid, k
                )
            else:
                best_s, best_i = _local_topk(
                    xs_c, qs_c, local_valid, sq_norms, k, chunk, metric
                )
            global_i = best_i + shard_id * rows
            # ICI merge: gather every shard's candidates, re-select
            # top-k.  Per-shard paths clamp k to their candidate width
            # (chunk / bucket count), so k_local can be < k; the merged
            # result pads overflow slots (dist +inf, id -1) rather than
            # asking top_k for more columns than exist.
            k_local = best_s.shape[1]
            all_s = jax.lax.all_gather(best_s, "shard", axis=0)   # [S, B, kl]
            all_i = jax.lax.all_gather(global_i, "shard", axis=0)
            b = qs.shape[0]
            flat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(
                b, n_shard * k_local
            )
            flat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(
                b, n_shard * k_local
            )
            k_final = min(k, n_shard * k_local)
            top_s, pos = jax.lax.top_k(flat_s, k_final)
            top_i = jnp.take_along_axis(flat_i, pos, axis=1)
            if k_final < k:
                pad = k - k_final
                top_s = jnp.pad(top_s, ((0, 0), (0, pad)),
                                constant_values=-jnp.inf)
                top_i = jnp.pad(top_i, ((0, 0), (0, pad)),
                                constant_values=-1)
            if metric == "cosine":
                dists = 1.0 - top_s
            else:
                q_sq = jnp.sum(qs.astype(jnp.float32) ** 2, axis=1, keepdims=True)
                dists = -top_s + q_sq
            return dists, top_i

        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("shard", None),    # xs rows sharded
                P("data", None),     # queries data-parallel, replicated on shard
                P(),                 # n_valid replicated
                P("shard"),          # sq_norms sharded with rows
            ),
            out_specs=(P("data", None), P("data", None)),
            check_vma=False,
        )
        return jax.jit(mapped)

    def shard_arrays(
        self, data: np.ndarray, sq_norms: np.ndarray
    ) -> tuple[jax.Array, jax.Array, int]:
        """Pad + device_put the packed matrix with row sharding.

        Returns (xs, sq, n_valid).
        """
        n, d = data.shape
        rows_per_shard = -(-n // self.n_shard)
        if self.use_fused:
            # Fused kernel wants whole row tiles per shard.
            tile = _fused_tile()
            rows_per_shard = ((rows_per_shard + tile - 1) // tile) * tile
        else:
            # Keep each shard MXU-aligned.
            rows_per_shard = ((rows_per_shard + 127) // 128) * 128
        total = rows_per_shard * self.n_shard
        if total != n:
            padded = np.zeros((total, d), data.dtype)
            padded[:n] = data
            sq = np.zeros(total, sq_norms.dtype)
            sq[:n] = sq_norms
        else:
            padded, sq = data, sq_norms
        xs = jax.device_put(
            padded, NamedSharding(self.mesh, P("shard", None))
        )
        sqd = jax.device_put(sq, NamedSharding(self.mesh, P("shard")))
        return xs, sqd, n

    def __call__(self, xs, qs, n_valid, sq_norms):
        qs_sharded = jax.device_put(
            qs, NamedSharding(self.mesh, P("data", None))
        )
        return self._fn(xs, qs_sharded, jnp.int32(n_valid), sq_norms)

"""On-device graph traversal kernels.

Compiles the graph-navigation steps (``Out``/``In`` expansions with label
and property filters — reference step catalog ``dsl.rs:2891-2942``) to
dense vectorized ops over a padded adjacency layout:

- ``PaddedGraph``: per direction, a ``[N, P]`` neighbor-slot matrix (P =
  max degree, rows padded with ``N``) plus a parallel edge-label-code
  matrix.  Built from the engine's CSR snapshot.
- frontier = boolean membership mask over node slots (set semantics, the
  natural TPU representation — no dynamic shapes)
- one hop = masked neighbor scatter: every live node writes its (label-
  filtered) neighbor slots into the next mask via a drop-out-of-range
  scatter.  k hops = ``lax.fori_loop``.

This is the structural analog of the reference's per-traverser adjacency
walks, restated as fixed-shape data parallelism (SURVEY.md §7.4).
Memory: N x P x 8 bytes; the engine falls back to the host CSR gather
path when P would be pathological.

Measured on v5e at 1M nodes / 16M edges (round 3): the dense hop costs
~141 ms regardless of frontier size — all of it in XLA's 16M-element
scatter (~8.8 ns/slot).  The hop is therefore **frontier-size-adaptive**
(``lax.cond`` on the live count, all inside one jit): small frontiers
compact to a fixed-size index list (top_k over masked iota — measured
free), gather only the live rows' neighbor slots, and scatter F*P
elements instead of N*P.  Compact-tier cost is bounded by XLA's
sequential row-gather lowering (~2 us/row), so a 16k-row tier runs in
~33 ms and a labeled+filtered 2-hop in ~36 ms — 6.4x over the dense
formulation.  The remaining gap to the native C++ sweep (~8 ms) is the
row-gather floor; the multi-chip sharded path (parallel/graph.py)
divides the dense cost by the shard count and is the scale-out story.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


class PaddedGraph:
    """Device-ready padded adjacency for one direction."""

    def __init__(
        self,
        neighbors: np.ndarray,    # [N, P] int32 dst slots, N = pad
        edge_labels: np.ndarray,  # [N, P] int32 edge label codes, -1 = pad
    ):
        self.n = neighbors.shape[0]
        self.p = neighbors.shape[1]
        self.neighbors = jnp.asarray(neighbors)
        self.edge_labels = jnp.asarray(edge_labels)

    @staticmethod
    def host_arrays(
        indptr: np.ndarray,
        edge_endpoint_slots: np.ndarray,  # dst slot per edge index, CSR order
        edge_label_codes: np.ndarray,     # label code per edge index, CSR order
        n_nodes: int,
        max_degree_cap: int = 256,
        edge_order: np.ndarray | None = None,  # global edge slot per CSR pos
    ) -> "tuple[np.ndarray, ...] | None":
        """Padded (neighbors, labels[, edge_slots]) host layout from CSR;
        None when max degree exceeds the cap (callers fall back to the
        host gather path).  The sharded multi-chip path
        (parallel/graph.py) consumes this directly so it can upload
        per-shard slices.  ``edge_order`` (the CSR-order global edge
        slot of each position) adds a third plane — required by the
        mesh-scale edge steps (OutE/InE), pad = -1."""
        assert indptr[0] == 0, "CSR views must be rebased to offset 0"
        degrees = np.diff(indptr)
        p = int(degrees.max()) if len(degrees) and degrees.max() > 0 else 1
        if p > max_degree_cap:
            return None
        neighbors = np.full((n_nodes, p), n_nodes, np.int32)
        labels = np.full((n_nodes, p), -1, np.int32)
        eslots = (
            np.full((n_nodes, p), -1, np.int32)
            if edge_order is not None else None
        )
        total = int(degrees.sum())
        if total:
            rows = np.repeat(np.arange(n_nodes), degrees)
            ranks = np.arange(total) - np.repeat(indptr[:-1], degrees)
            neighbors[rows, ranks] = edge_endpoint_slots[:total]
            labels[rows, ranks] = edge_label_codes[:total]
            if eslots is not None:
                eslots[rows, ranks] = edge_order[:total]
        if eslots is not None:
            return neighbors, labels, eslots
        return neighbors, labels

    @staticmethod
    def from_csr(
        indptr: np.ndarray,
        edge_endpoint_slots: np.ndarray,
        edge_label_codes: np.ndarray,
        n_nodes: int,
        max_degree_cap: int = 256,
    ) -> "PaddedGraph | None":
        host = PaddedGraph.host_arrays(
            indptr, edge_endpoint_slots, edge_label_codes, n_nodes,
            max_degree_cap,
        )
        if host is None:
            return None
        return PaddedGraph(*host)


# Compact-tier sizes for the adaptive hop.  Each tier's cost is
# ~2 us/row (XLA row-gather) + the F*P scatter; the dense tier reads
# every row but scatters N*P.  Tiers are compiled once per kernel (all
# branches of the lax.cond), selected per hop by the live count.
_COMPACT_TIERS = (4096, 65536)


def _adaptive_hop(neighbors, edge_labels, mask, label_code):
    n, p = neighbors.shape

    def compact(f: int):
        def run(mask):
            iota = jnp.arange(n, dtype=jnp.int32)
            score = jnp.where(mask, iota, -1)
            v, _ = jax.lax.top_k(score, f)          # live indices, -1 pads
            idx = jnp.where(v >= 0, v, n)
            valid = idx < n
            rows = jnp.take(neighbors, idx, axis=0, mode="clip")
            labs = jnp.take(edge_labels, idx, axis=0, mode="clip")
            ok = (
                jnp.logical_or(label_code < 0, labs == label_code)
                & valid[:, None]
            )
            targets = jnp.where(ok, rows, n)
            return jnp.zeros(n + 1, bool).at[targets.reshape(-1)].set(True)[:n]

        return run

    def dense(mask):
        live = mask[:, None]
        label_ok = jnp.logical_or(label_code < 0, edge_labels == label_code)
        targets = jnp.where(live & label_ok, neighbors, n)
        return jnp.zeros(n + 1, bool).at[targets.reshape(-1)].set(True)[:n]

    cnt = jnp.sum(mask)
    tiers = [f for f in _COMPACT_TIERS if f < n]
    out = dense
    for f in reversed(tiers):
        out = (
            lambda mask, f=f, nxt=out: jax.lax.cond(
                cnt <= f, compact(f), nxt, mask
            )
        )
    return out(mask)


@functools.partial(jax.jit, static_argnames=("hops",))
def khop_mask(
    neighbors: jax.Array,     # [N, P] int32, pad = N
    edge_labels: jax.Array,   # [N, P] int32, pad = -1
    start_mask: jax.Array,    # [N] bool
    label_code: jax.Array,    # scalar int32; -1 = any label
    hops: int,
) -> jax.Array:
    """Frontier mask after exactly ``hops`` expansions (BFS frontier, not
    closure): each hop replaces the mask with the neighbor set.  Each
    hop is frontier-size-adaptive (see module docstring)."""

    def hop(_, mask):
        return _adaptive_hop(neighbors, edge_labels, mask, label_code)

    return jax.lax.fori_loop(0, hops, hop, start_mask)


@functools.partial(jax.jit, static_argnames=("hops",))
def khop_count(
    neighbors: jax.Array,
    edge_labels: jax.Array,
    start_mask: jax.Array,
    label_code: jax.Array,
    hops: int,
    keep_mask: jax.Array,     # [N] bool post-filter (where_ predicate mask)
) -> jax.Array:
    """Count of distinct nodes in the k-hop frontier passing a filter —
    the BASELINE config[2] shape (n_with_label + 2-hop + where_)."""
    mask = khop_mask(neighbors, edge_labels, start_mask, label_code, hops)
    return jnp.sum(mask & keep_mask)


@functools.partial(jax.jit, static_argnames=("hops",))
def hybrid_expand(
    neighbors: jax.Array,
    edge_labels: jax.Array,
    seed_slots: jax.Array,    # [k] int32 vector-hit slots (pad = N)
    label_code: jax.Array,
    hops: int,
    keep_mask: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Hybrid RAG step (BASELINE config[3]): seed slots from a vector
    top-k, expand the graph neighborhood on device, return the filtered
    membership mask and its size."""
    n = neighbors.shape[0]
    start = jnp.zeros(n + 1, bool).at[seed_slots].set(True)[:n]
    mask = khop_mask(neighbors, edge_labels, start, label_code, hops)
    mask = mask & keep_mask
    return mask, jnp.sum(mask)

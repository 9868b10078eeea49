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

Measured on v5e at 1M nodes / 16M edges: 231 ms per labeled+filtered
2-hop (~139M edge-ops/s).  A gather formulation (next-mask via
reverse-adjacency gather + any-reduce) measured 2.6x slower — the wider
reverse padding and random scalar loads cost more than the scatter.
Round-2 candidates: blocked edge-tile scan with in-VMEM mask tiles, or
frontier-size-adaptive kernels (dense masks waste work on small
frontiers, which the engine planner already routes host-side).
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
    ) -> "tuple[np.ndarray, np.ndarray] | None":
        """Padded (neighbors, labels) host layout from CSR; None when max
        degree exceeds the cap (callers fall back to the host gather
        path).  The sharded multi-chip path (parallel/graph.py) consumes
        this directly so it can upload per-shard slices."""
        degrees = np.diff(indptr)
        p = int(degrees.max()) if len(degrees) and degrees.max() > 0 else 1
        if p > max_degree_cap:
            return None
        p = max(1, p)
        neighbors = np.full((n_nodes, p), n_nodes, np.int32)
        labels = np.full((n_nodes, p), -1, np.int32)
        total = int(degrees.sum())
        if total:
            rows = np.repeat(np.arange(n_nodes), degrees)
            ranks = np.arange(total) - np.repeat(indptr[:-1], degrees)
            neighbors[rows, ranks] = edge_endpoint_slots[:total]
            labels[rows, ranks] = edge_label_codes[:total]
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


@functools.partial(jax.jit, static_argnames=("hops",))
def khop_mask(
    neighbors: jax.Array,     # [N, P] int32, pad = N
    edge_labels: jax.Array,   # [N, P] int32, pad = -1
    start_mask: jax.Array,    # [N] bool
    label_code: jax.Array,    # scalar int32; -1 = any label
    hops: int,
) -> jax.Array:
    """Frontier mask after exactly ``hops`` expansions (BFS frontier, not
    closure): each hop replaces the mask with the neighbor set."""
    n = neighbors.shape[0]

    def hop(_, mask):
        live = mask[:, None]
        label_ok = jnp.logical_or(label_code < 0, edge_labels == label_code)
        targets = jnp.where(live & label_ok, neighbors, n)
        next_mask = jnp.zeros(n + 1, bool).at[targets.reshape(-1)].set(True)
        return next_mask[:n]

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


@functools.partial(jax.jit, static_argnames=("hops", "k"))
def hybrid_expand(
    neighbors: jax.Array,
    edge_labels: jax.Array,
    seed_slots: jax.Array,    # [k] int32 vector-hit slots (pad = N)
    label_code: jax.Array,
    hops: int,
    keep_mask: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Hybrid RAG step (BASELINE config[3]): seed slots from a vector
    top-k, expand the graph neighborhood on device, return the filtered
    membership mask and its size."""
    n = neighbors.shape[0]
    start = jnp.zeros(n + 1, bool).at[seed_slots].set(True)[:n]
    mask = khop_mask(neighbors, edge_labels, start, label_code, hops)
    mask = mask & keep_mask
    return mask, jnp.sum(mask)

"""Multi-chip graph traversal: edge-partitioned adjacency + frontier
all-reduce over ICI.

The scale-out design SURVEY.md §2.3 names for the graph side ("edge-
partitioned CSR with all-to-all frontier exchange"; reference scaling
contract ``README.md:248``), restated as the natural TPU formulation:

- The padded adjacency (``ops/csr.py`` layout: ``[N, P]`` neighbor-slot
  matrix per direction) is **partitioned by source row** across the
  ``shard`` mesh axis — each device owns its rows' outgoing (and
  incoming) edges.  This is edge partitioning: every edge lives on
  exactly one device, determined by its source slot.
- The frontier is a boolean membership mask over node slots.  Each hop,
  every shard expands its *local* rows' edges into a full-width
  contribution mask, and one ``psum`` over the shard axis merges the
  contributions — the frontier exchange.  At ``N`` nodes the exchanged
  mask is ``4·N`` bytes (4 MB at 1M nodes), tiny next to the adjacency
  bytes each shard reads, so the collective rides ICI at noise cost and
  scaling is near-linear in shard count.
- A whole traversal plan (alternating hops and vectorized predicate
  masks, the shape ``engine/exec.py:_try_device_traversal`` produces)
  executes inside ONE ``shard_map``-ped jit: per-hop label codes are
  traced operands (no recompile per label), the plan structure is the
  compile key.

Everything is static-shaped: node count pads up to
``rows_per_shard * n_shard``; padded rows have no edges, start dead, and
are masked out of every filter, so they can never activate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from typing import Any
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Plan ops (static compile key):
#   ("hop", ("out",))            expand outgoing edges
#   ("hop", ("in",))             expand incoming edges
#   ("hop", ("out", "in"))       Both: union of the two expansions
#   ("mask", slot_index)         AND with filter mask number `slot_index`
PlanOp = tuple


class ShardedGraph:
    """Device-resident sharded adjacency for one graph snapshot.

    ``directions`` maps ``"out"``/``"in"`` to host ``(neighbors,
    edge_labels)`` pairs in the ``ops/csr.py`` padded layout (``[N, P]``
    int32, neighbor pad = ``N``, label pad = -1).  Only the directions a
    workload needs must be present.
    """

    def __init__(
        self,
        mesh: Mesh,
        n_nodes: int,
        directions: dict[str, tuple[np.ndarray, np.ndarray]],
    ):
        self.mesh = mesh
        self.n_shard = int(mesh.shape["shard"])
        self.n_nodes = n_nodes
        rows = -(-n_nodes // self.n_shard)
        # Keep shard slices lane-aligned so masks tile cleanly.
        rows = ((rows + 127) // 128) * 128
        self.rows_per_shard = rows
        self.n_pad = rows * self.n_shard
        self.arrays: dict[str, tuple[jax.Array, jax.Array]] = {}
        self.edge_planes: dict[str, jax.Array] = {}
        spec = NamedSharding(mesh, P("shard", None))
        for direction, planes in directions.items():
            neighbors, labels = planes[0], planes[1]
            nb = np.full((self.n_pad, neighbors.shape[1]), self.n_pad, np.int32)
            lb = np.full((self.n_pad, neighbors.shape[1]), -1, np.int32)
            # real neighbor slots keep their global ids; the original pad
            # sentinel (n_nodes) moves to the padded drop slot (n_pad)
            nb[:n_nodes] = np.where(
                neighbors[:n_nodes] >= n_nodes, self.n_pad, neighbors[:n_nodes]
            )
            lb[:n_nodes] = labels[:n_nodes]
            self.arrays[direction] = (
                jax.device_put(nb, spec),
                jax.device_put(lb, spec),
            )
            if len(planes) > 2 and planes[2] is not None:
                # global edge slots per adjacency position (pad = -1) —
                # the plane the ordered edge steps (OutE/InE) ride
                es = np.full((self.n_pad, neighbors.shape[1]), -1, np.int32)
                es[:n_nodes] = planes[2][:n_nodes]
                self.edge_planes[direction] = jax.device_put(es, spec)
        self._compiled: dict[tuple, Any] = {}

    # -- plan execution ----------------------------------------------------

    def _build(self, plan: tuple[PlanOp, ...]):
        """Compile one plan shape.  Codes arrive as a traced ``[n_hops]``
        int32 vector; filter masks as a ``[n_masks, n_pad]`` bool matrix
        sharded by columns."""
        mesh = self.mesh
        n_pad = self.n_pad
        rows = self.rows_per_shard
        dir_names = sorted(self.arrays)
        n_dirs = len(dir_names)

        def shard_fn(adj_flat, start_local, codes, masks_local):
            # adj_flat: tuple of [rows, P] blocks, 2 per direction
            adj = {
                name: (adj_flat[2 * i], adj_flat[2 * i + 1])
                for i, name in enumerate(dir_names)
            }
            shard_id = jax.lax.axis_index("shard")
            lo = shard_id * rows
            mask = start_local
            hop_i = 0
            for op in plan:
                if op[0] == "hop":
                    code = codes[hop_i]
                    hop_i += 1
                    contrib = jnp.zeros(n_pad + 1, bool)
                    for direction in op[1]:
                        nb, lb = adj[direction]
                        live = mask[:, None]
                        ok = jnp.logical_or(code < 0, lb == code)
                        targets = jnp.where(live & ok, nb, n_pad)
                        contrib = contrib.at[targets.reshape(-1)].set(True)
                    # frontier exchange: one all-reduce of the int mask
                    full = jax.lax.psum(
                        contrib[:n_pad].astype(jnp.int32), "shard"
                    )
                    mask = (
                        jax.lax.dynamic_slice(full, (lo,), (rows,)) > 0
                    )
                else:
                    mask = mask & masks_local[op[1]]
            return mask

        in_specs = (
            tuple(P("shard", None) for _ in range(2 * n_dirs)),
            P("shard"),
            P(),
            P(None, "shard"),
        )
        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P("shard"),
            check_vma=False,
        )
        return jax.jit(mapped)

    def run(
        self,
        plan: list,
        start_mask: np.ndarray,
        codes: list[int],
        masks: list[np.ndarray],
    ) -> np.ndarray:
        """Execute a traversal plan; returns the final membership mask
        (host bool ``[n_nodes]``).

        ``plan`` entries: ``("hop", directions_tuple)`` consuming the
        next entry of ``codes`` (edge-label code, -1 = any), or
        ``("mask", i)`` ANDing with ``masks[i]``.
        """
        key = (tuple(
            (op[0], tuple(op[1]) if op[0] == "hop" else op[1]) for op in plan
        ), len(masks))
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build(key[0])
            self._compiled[key] = fn
        start = np.zeros(self.n_pad, bool)
        start[: self.n_nodes] = start_mask[: self.n_nodes]
        if masks:
            mm = np.zeros((len(masks), self.n_pad), bool)
            for i, m in enumerate(masks):
                mm[i, : self.n_nodes] = m[: self.n_nodes]
        else:
            if any(op[0] == "mask" for op in plan):
                raise ValueError(
                    "plan contains a mask op but no masks were provided"
                )
            mm = np.zeros((1, self.n_pad), bool)  # placeholder operand
        adj_flat = tuple(
            arr for name in sorted(self.arrays) for arr in self.arrays[name]
        )
        start_d = jax.device_put(
            start, NamedSharding(self.mesh, P("shard"))
        )
        masks_d = jax.device_put(
            mm, NamedSharding(self.mesh, P(None, "shard"))
        )
        n_hops = sum(1 for op in plan if op[0] == "hop")
        if len(codes) < n_hops:
            # a missing code would otherwise read the placeholder's 0 —
            # a REAL label code — and silently label-filter the hop
            raise ValueError(
                f"plan contains {n_hops} hop ops but only "
                f"{len(codes)} label codes were provided"
            )
        codes_arr = jnp.asarray(
            np.asarray(codes, np.int32) if codes else np.zeros(1, np.int32)
        )
        out = fn(adj_flat, start_d, codes_arr, masks_d)
        return np.asarray(out)[: self.n_nodes]

    # -- ordered frame expansion (full interpreter semantics) --------------

    def _build_expand(self, direction: str, t_pad: int):
        """Compile one ordered-hop shape: frontier ids [t_pad]
        (replicated) -> merged [t_pad, P] global target slots
        (sentinel ``n_pad`` for missing/label-filtered edges).

        Each source row's edges live on exactly ONE shard (row
        partitioning), so the merge is a single ``psum`` of
        (target+1 | 0) blocks — the owning shard contributes targets,
        everyone else zero."""
        mesh = self.mesh
        rows = self.rows_per_shard
        n_pad = self.n_pad

        def shard_fn(nb, lb, ids, code):
            shard_id = jax.lax.axis_index("shard")
            lo = shard_id * rows
            local = ids - lo
            owned = (local >= 0) & (local < rows)
            safe = jnp.clip(local, 0, rows - 1)
            nbr = nb[safe]          # [t_pad, P] target slots (pad = n_pad)
            lbr = lb[safe]          # [t_pad, P] label codes (pad = -1)
            ok = owned[:, None] & jnp.logical_or(code < 0, lbr == code)
            # encode target+1 so a psum distinguishes "not owned" (0)
            # from target slot 0; label-filtered/pad slots decode to
            # the sentinel
            contrib = jnp.where(ok, nbr + 1, 0)
            merged = jax.lax.psum(contrib, "shard")
            return jnp.where(merged > 0, merged - 1, n_pad)

        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("shard", None), P("shard", None), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(mapped)

    def expand_frame(
        self, direction: str, label_code: int, frame_slots: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """One ordered hop over the mesh with full interpreter
        semantics: returns ``(parent_rows, target_slots)`` where entry
        order is frame order x adjacency slot order — exactly the
        single-device ``_expand_edges`` expansion order, with
        multiplicity (a frame row appearing twice expands twice).

        ``frame_slots`` are global node slots (invalid rows must be
        dropped by the caller).  ``label_code`` -1 = any label.
        """
        t = len(frame_slots)
        if t == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int32))
        t_pad = max(128, 1 << (t - 1).bit_length())
        key = ("expand", direction, t_pad)
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build_expand(direction, t_pad)
            self._compiled[key] = fn
        ids = np.full(t_pad, self.n_pad, np.int32)
        ids[:t] = frame_slots
        nb, lb = self.arrays[direction]
        merged = np.asarray(
            fn(nb, lb, jnp.asarray(ids), jnp.int32(label_code))
        )[:t]
        parent, slot_rank = np.nonzero(merged != self.n_pad)
        return parent.astype(np.int64), merged[parent, slot_rank]

    def _build_expand_edges(self, direction: str, t_pad: int):
        """Compile one ordered EDGE-hop shape: frontier ids [t_pad]
        (replicated) -> merged ([t_pad, P] edge slots, [t_pad, P]
        target node slots), sentinels -1 / ``n_pad``.  Same
        row-ownership psum merge as ``_build_expand``, with the edge
        plane stacked into the exchange (2x the mask bytes — still
        noise next to the adjacency reads)."""
        mesh = self.mesh
        rows = self.rows_per_shard
        n_pad = self.n_pad

        def shard_fn(nb, lb, es, ids, code):
            shard_id = jax.lax.axis_index("shard")
            lo = shard_id * rows
            local = ids - lo
            owned = (local >= 0) & (local < rows)
            safe = jnp.clip(local, 0, rows - 1)
            nbr = nb[safe]
            lbr = lb[safe]
            esr = es[safe]
            ok = (
                owned[:, None]
                & (esr >= 0)
                & jnp.logical_or(code < 0, lbr == code)
            )
            contrib = jnp.stack(
                [jnp.where(ok, esr + 1, 0), jnp.where(ok, nbr + 1, 0)],
                axis=-1,
            )
            merged = jax.lax.psum(contrib, "shard")
            edges = jnp.where(merged[..., 0] > 0, merged[..., 0] - 1, -1)
            targets = jnp.where(
                merged[..., 1] > 0, merged[..., 1] - 1, n_pad
            )
            return edges, targets

        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("shard", None), P("shard", None), P("shard", None),
                P(), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(mapped)

    def expand_frame_edges(
        self, direction: str, label_code: int, frame_slots: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One ordered EDGE hop over the mesh: returns ``(parent_rows,
        edge_slots, target_slots)`` in frame order x adjacency slot
        order — the single-device ``_expand_edges`` expansion order.
        Requires the direction's edge plane (built with
        ``edge_order``); raises KeyError otherwise."""
        es_plane = self.edge_planes[direction]
        t = len(frame_slots)
        if t == 0:
            return (
                np.empty(0, np.int64), np.empty(0, np.int32),
                np.empty(0, np.int32),
            )
        t_pad = max(128, 1 << (t - 1).bit_length())
        key = ("expand_e", direction, t_pad)
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build_expand_edges(direction, t_pad)
            self._compiled[key] = fn
        ids = np.full(t_pad, self.n_pad, np.int32)
        ids[:t] = frame_slots
        nb, lb = self.arrays[direction]
        edges, targets = fn(
            nb, lb, es_plane, jnp.asarray(ids), jnp.int32(label_code)
        )
        edges = np.asarray(edges)[:t]
        targets = np.asarray(targets)[:t]
        parent, slot_rank = np.nonzero(edges >= 0)
        return (
            parent.astype(np.int64),
            edges[parent, slot_rank],
            targets[parent, slot_rank],
        )

    def khop_count(
        self,
        direction: str,
        start_mask: np.ndarray,
        label_code: int,
        hops: int,
        keep_mask: np.ndarray | None = None,
    ) -> int:
        """Distinct nodes in the ``hops``-step frontier passing ``keep``
        (the BASELINE config[2] shape) — convenience over :meth:`run`."""
        plan = [("hop", (direction,)) for _ in range(hops)]
        masks: list[np.ndarray] = []
        if keep_mask is not None:
            masks.append(keep_mask)
            plan.append(("mask", 0))
        final = self.run(plan, start_mask, [label_code] * hops, masks)
        return int(final.sum())

"""Native-gateway serving front door.

Pairs the C++ epoll HTTP server (``native/gateway.cpp``) with the
engine:

- **general workers** pull raw requests (one GIL crossing each) and run
  them through the shared :mod:`routes` dispatcher;
- the **vector fast path** pulls *batches* of stored vector-search
  requests whose bodies were already parsed to float32 in C++, runs ONE
  device dispatch per batch, and hands the id/distance matrix back to
  C++ for response formatting — the per-request Python cost is O(1/B).

Fast-route eligibility is decided here by inspecting the installed
bundle: a read route qualifies when it is exactly
``VectorSearchNodes(label, prop, Param(vec), k[, tenant_value:
Param(str)]) -> ValueMap(["$id", "$distance"])`` on an index with a
live matrix; multitenant routes carry the tenant string through the C++
parse and dispatch groups by (route, tenant) against the tenant's
partition (unknown tenant => empty result, per the reference contract
dsl.rs:326-330).  Anything else — traced requests, literal tenants,
extra steps, parse oddities, k beyond the buffer cap — flows through
the interpreter, so fast- and slow-path responses are interchangeable
(verified in tests/test_native_gateway.py).

Reference analog: the engine's compiled Rust gateway behind
``POST /v1/query/<name>`` (``sdks/rust/src/lib.rs:377-423``).
"""

from __future__ import annotations

import ctypes
import threading
import time
from dataclasses import dataclass
from typing import Any

import numpy as np

from .. import fastjson
from ..engine import Engine
from .routes import BytesResult, EventStream, FileResult, JsonResult, dispatch


@dataclass
class _FastSpec:
    route_id: int
    name: str
    kind: str            # "nodes" | "edges"
    label: str
    prop: str
    dim: int
    k_fixed: int | None  # Literal k
    k_max: int
    tenant_key: str | None = None  # param name carrying the tenant value
    # Dynamic routes (name "<dyn>") have no stored query to fall back
    # to, so the learned plan + its parameter keys ride the spec and
    # the interpreter fallback executes them as a plain read request.
    query: dict | None = None
    vec_key: str | None = None
    k_key: str | None = None


class _BlobEpochHook:
    """Store write hook: any mutation marks the C++ blob cache dirty.

    The flag is folded into an epoch push (cheap ctypes call) at the
    next Python-side touch — before any write response is sent, and on
    every general-loop tick for writes that bypass the HTTP path
    (replication apply on a follower), bounding staleness there to the
    poll interval on top of replication lag."""

    def __init__(self, gateway: "NativeGateway"):
        self._gateway = gateway

    def _dirty(self, *args) -> None:
        self._gateway._blobs_dirty = True

    on_node_added = on_node_dropped = _dirty
    on_edge_added = on_edge_dropped = _dirty
    on_property_set = _dirty
    on_index_created = on_index_dropped = _dirty


class NativeGateway:
    VBATCH_CAP = 1024
    K_MAX = 1024
    TENANT_CAP = 128  # bytes per tenant slot (matches gateway.cpp)
    DYN_BODY_CAP = 65536   # matches SKELETON_CAP in gateway.cpp
    LOOKUP_IDS_CAP = 1024  # matches LOOKUP_IDS_CAP in gateway.cpp

    def __init__(
        self,
        engine: Engine | None = None,
        host: str = "0.0.0.0",
        port: int = 6969,
        api_key: str | None = None,
        data_dir: str | None = None,
        telemetry_path: str | None = None,
        metric: str = "cosine",
        batch_window_ms: float | None = 2.0,
        hbm_budget_bytes: int | None = None,
        bm25: bool = True,
        secondary_indices: list[str] | None = None,
        replica_of: str | None = None,
        snapshot_store: str | None = None,
        mcp: bool = True,
        general_workers: int = 4,
        shard_threshold: int | None = None,
        graph_shard_threshold: int | None = None,
        quant_candidates: int | None = None,
        max_size_bytes: int | None = None,
    ):
        from ..native import load

        self._lib = load()
        self.replica_of = replica_of
        self.follower = None
        if replica_of and data_dir and engine is None:
            data_dir = None  # replicas are stateless followers
        self.engine = engine or Engine(
            metric=metric, data_dir=data_dir, batch_window_ms=batch_window_ms,
            hbm_budget_bytes=hbm_budget_bytes,
            bm25=bm25,
            secondary_indices=secondary_indices, snapshot_store=snapshot_store,
            shard_threshold=shard_threshold,
            graph_shard_threshold=graph_shard_threshold,
            quant_candidates=quant_candidates,
            max_size_bytes=max_size_bytes,
        )
        if replica_of:
            from ..engine.replication import Follower

            self.follower = Follower(self.engine, replica_of, api_key=api_key)
            self.follower.start()
        if telemetry_path:
            from ..telemetry import Telemetry

            self.engine.telemetry = Telemetry(telemetry_path)
            self.engine.telemetry.log_event("instance_start")
        self.mcp_enabled = mcp
        self.host = host
        self.port = port
        self.api_key = api_key
        self.general_workers = general_workers
        self._handle: int | None = None
        self._threads: list[threading.Thread] = []
        self._streamers: list[threading.Thread] = []
        self._finishers: list[threading.Thread] = []
        self._stop = threading.Event()
        self._fast_specs: dict[int, _FastSpec] = {}
        self._retired_specs: dict[int, _FastSpec] = {}
        self._retired_at: dict[int, float] = {}
        self._fast_signature: dict | None = None
        self._fast_lock = threading.Lock()
        self._requests_handled = 0
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        # Dynamic fast routes (round 4): learned /v1/query plan
        # skeletons.  Vector plans join the vbatch fast path; point
        # lookups are served from the C++ blob cache without touching
        # Python at all.  The blob cache is valid for exactly one store
        # epoch: any write bumps it (store hook below) and the next
        # Python-side touch pushes the new epoch to C++, which clears.
        self._dyn_lookup_specs: dict[bytes, tuple[str, str]] = {}
        self._dyn_ineligible: set[bytes] = set()
        self._blob_epoch_pushed: int | None = None
        self._blob_epoch_lock = threading.Lock()
        self._blobs_dirty = False
        self.engine.store.add_write_hook(_BlobEpochHook(self))

    def _track(self, delta: int) -> None:
        with self._inflight_lock:
            self._inflight += delta
            if delta > 0:
                self._requests_handled += delta

    # -- fast-route analysis -------------------------------------------

    def _analyze_fast_routes(self) -> None:
        """(Re)register C++ fast routes from the installed bundle.

        Skips the C++ re-registration when eligibility hasn't changed —
        re-registering issues fresh route ids, which would orphan
        requests already parsed under the old ids (they'd fall back to
        the interpreter via the retired-spec map, correct but slow).
        """
        lib, h = self._lib, self._handle
        specs = {}
        for name, route in self.engine.routes.items():
            spec = self._fast_eligible(name, route)
            if spec is not None:
                specs[name] = spec
        with self._fast_lock:
            if specs == self._fast_signature:
                return
            self._fast_signature = specs
            lib.hxgw_clear_fast_routes(h)
            # eligibility changed: learned dynamic plans must re-learn
            # against the new index/bundle state (vec templates retire
            # in C++ so in-flight requests still format)
            lib.hxgw_clear_dyn_routes(h)
            self._dyn_lookup_specs.clear()
            self._dyn_ineligible.clear()
            # keep retired ids resolvable for in-flight requests
            import time as _time

            now = _time.monotonic()
            self._retired_specs.update(self._fast_specs)
            self._retired_at.update(
                {rid: now for rid in self._fast_specs}
            )
            self._fast_specs = {}
            for name, spec in specs.items():
                rid = lib.hxgw_fast_route(
                    h, f"/v1/query/{name}".encode(),
                    spec["vec_key"].encode(),
                    spec["k_key"].encode() if spec["k_key"] else None,
                    spec["tenant_key"].encode() if spec["tenant_key"] else None,
                    spec["k_default"], self.K_MAX, spec["dim"],
                    spec["prefix"].encode(), spec["suffix"].encode(),
                    b"$id", b"$distance",
                )
                self._fast_specs[rid] = _FastSpec(
                    route_id=rid, name=name, kind=spec["kind"],
                    label=spec["label"], prop=spec["prop"], dim=spec["dim"],
                    k_fixed=spec["k_fixed"], k_max=self.K_MAX,
                    tenant_key=spec["tenant_key"],
                )
            if len(self._retired_specs) > 4096:
                # prune only entries old enough that no request parsed
                # under them can still be in flight — a wholesale clear
                # would turn those requests' interpreter fallback into
                # a 500
                cutoff = now - 60.0
                for rid in [
                    r for r, ts in self._retired_at.items() if ts < cutoff
                ]:
                    self._retired_specs.pop(rid, None)
                    self._retired_at.pop(rid, None)

    def _fast_eligible(self, name: str, route: dict) -> dict | None:
        if route.get("kind") != "read":
            return None
        query = route.get("query") or {}
        entries = query.get("queries") or []
        if len(entries) != 1 or "Query" not in entries[0]:
            return None
        body = entries[0]["Query"]
        if body.get("condition") is not None:
            return None
        var = body.get("name")
        if query.get("returns") != [var]:
            return None
        steps = body.get("steps") or []
        if len(steps) != 2:
            return None
        src, term = steps
        kind = None
        if "VectorSearchNodes" in src:
            kind, search = "nodes", src["VectorSearchNodes"]
        elif "VectorSearchEdges" in src:
            kind, search = "edges", src["VectorSearchEdges"]
        else:
            return None
        if term.get("ValueMap") != ["$id", "$distance"]:
            return None
        def param_name(node: Any) -> str | None:
            # accept {"Param": p} and the Expr wrapper {"Expr": {"Param": p}}
            if isinstance(node, dict) and set(node) == {"Expr"}:
                node = node["Expr"]
            if isinstance(node, dict) and set(node) == {"Param"} and isinstance(
                node["Param"], str
            ):
                return node["Param"]
            return None

        vec_key = param_name(search.get("query_vector"))
        if vec_key is None:
            return None
        k = search.get("k")
        k_key, k_fixed = param_name(k), None
        if k_key is None:
            if isinstance(k, dict) and set(k) == {"Literal"} and isinstance(
                k["Literal"], int
            ) and 0 < k["Literal"] <= self.K_MAX:
                # k beyond the fast-path buffer cap must NOT be clamped
                # (the interpreter would honor it — silent divergence);
                # such routes stay on the interpreter path
                k_fixed = k["Literal"]
            else:
                return None
        # Tenanted routes ride the fast path when the tenant arrives as
        # a string Param: the C++ parse carries the value through and
        # dispatch resolves the per-tenant partition.  Literal tenants
        # or tenant/index mismatches stay on the interpreter.
        tenant_key = None
        tenant_value = search.get("tenant_value")
        if tenant_value is not None:
            tenant_key = param_name(tenant_value)
            if tenant_key is None:
                return None
        spec_tag = "NodeVector" if kind == "nodes" else "EdgeVector"
        index = self.engine.vectors.indexes.get(
            (spec_tag, search["label"], search["property"])
        )
        if index is None:
            return None
        if index.defn.tenant_property is not None:
            if tenant_key is None:
                return None  # interpreter raises the missing-tenant error
            # dim from any live partition; per-tenant dim mismatches
            # fall back at dispatch time
            part = next(
                (p for p in index.partitions.values() if p.matrix is not None),
                None,
            )
        else:
            if tenant_key is not None:
                return None  # tenant on an untenanted index: interpreter
            part = index.partition_for_search(None)
        if part is None or part.matrix is None:
            return None
        if int(part.matrix.dim) > self.MAX_FAST_DIM:
            # the C++ vbatch buffer is max_dim-wide; a wider route would
            # silently truncate every query vector
            return None
        return {
            "kind": kind,
            "label": search["label"],
            "prop": search["property"],
            "vec_key": vec_key,
            "k_key": k_key,
            "tenant_key": tenant_key,
            # -1 = k is a required Param with no fixed value: the C++
            # parse declines bodies that omit it, so the interpreter
            # raises the same missing-parameter 400 either path serves
            "k_default": k_fixed if k_fixed is not None else -1,
            "k_fixed": k_fixed,
            "dim": int(part.matrix.dim),
            "prefix": f'{{"{var}": [',
            "suffix": "]}",
        }

    def on_bundle_loaded(self) -> None:
        self._analyze_fast_routes()

    # -- dynamic fast routes (learned /v1/query plans) -------------------

    def _push_blob_epoch(self) -> None:
        # Atomic read+push: without the lock a preempted worker could
        # push an OLDER epoch after a newer one and re-validate stale
        # blobs (read-your-writes violation).  Under the lock the store
        # epoch is re-read, so the last push always carries the newest
        # value any entering thread observed.
        with self._blob_epoch_lock:
            # Clear the dirty flag BEFORE reading the epoch: a writer
            # that bumps the store after our read also re-sets the flag,
            # so its own dirty-gated post-ack push still fires.  The
            # other order ate that writer's dirty-set and its ack went
            # out with the stale epoch still validated in C++.
            self._blobs_dirty = False
            epoch = self.engine.store.epoch
            if epoch != self._blob_epoch_pushed:
                self._blob_epoch_pushed = epoch
                self._lib.hxgw_blob_epoch(self._handle, epoch)

    def wait_dyn_learned(
        self, vector_routes: int = 0, lookup_plans: int = 0,
        timeout: float = 5.0,
    ) -> bool:
        """Deterministic barrier for dynamic-route learning.

        Learning runs AFTER a response is sent (an optimization must
        never delay the reply), so "request served" does not imply
        "route registered" — a fast follow-up can beat registration and
        be served slow.  Tests and operational probes that need the
        fast path armed block here: returns True once at least
        ``vector_routes`` dynamic vector specs and ``lookup_plans``
        lookup skeletons are registered, False on timeout."""
        deadline = time.time() + timeout
        while True:
            with self._fast_lock:
                n_vec = sum(
                    1 for s in self._fast_specs.values() if s.name == "<dyn>"
                )
                n_lk = len(self._dyn_lookup_specs)
            if n_vec >= vector_routes and n_lk >= lookup_plans:
                return True
            if time.time() >= deadline:
                return False
            time.sleep(0.01)

    def _maybe_learn_dynamic(self, body: bytes, result, epoch0: int) -> None:
        """Inspect a just-served /v1/query read; register its plan
        skeleton as a native route when eligible, and (re)populate the
        blob cache for known lookup plans."""
        lib, h = self._lib, self._handle
        buf = ctypes.create_string_buffer(len(body) + 8)
        sk_len = lib.hxgw_skeleton(body, len(body), buf, len(body) + 8)
        if sk_len < 0:
            return
        sk = buf.raw[:sk_len]
        spec = self._dyn_lookup_specs.get(sk)
        if spec is not None:
            # registered lookup served slow (cache miss): re-warm blobs
            self._push_lookup_blobs(spec, result, epoch0)
            return
        if sk in self._dyn_ineligible:
            return
        try:
            req = fastjson.loads(bytes(body))
        except Exception:
            return
        registered = False
        if isinstance(req, dict) and req.get("request_type") == "read":
            try:
                registered = self._register_dynamic(sk, req, result, epoch0)
            except Exception:
                registered = False
        if not registered and len(self._dyn_ineligible) < 8192:
            self._dyn_ineligible.add(sk)

    def _register_dynamic(self, sk: bytes, req: dict, result,
                          epoch0: int) -> bool:
        lib, h = self._lib, self._handle
        query = req.get("query") or {}
        params = req.get("parameters")
        if not isinstance(params, dict):
            return False
        lookup = self._lookup_eligible(query, params)
        if lookup is not None:
            var, ids_key = lookup
            ok = lib.hxgw_dyn_lookup_route(
                h, sk, len(sk), ids_key.encode(),
                f'{{"{var}": ['.encode(), b"]}",
            )
            if ok:
                self._dyn_lookup_specs[sk] = (var, ids_key)
                self._push_lookup_blobs((var, ids_key), result, epoch0)
            return bool(ok)
        spec = self._fast_eligible("<dyn>", {"kind": "read", "query": query})
        if spec is None:
            return False
        used = {spec["vec_key"]}
        if spec["k_key"]:
            used.add(spec["k_key"])
        if spec["tenant_key"]:
            used.add(spec["tenant_key"])
        if set(params.keys()) != used:
            # extra parameters the C++ parse would reject per-request
            # anyway; missing ones would diverge — stay slow
            return False
        rid = lib.hxgw_dyn_vec_route(
            h, sk, len(sk), spec["vec_key"].encode(),
            spec["k_key"].encode() if spec["k_key"] else None,
            spec["tenant_key"].encode() if spec["tenant_key"] else None,
            spec["k_default"], self.K_MAX, spec["dim"],
            spec["prefix"].encode(), spec["suffix"].encode(),
        )
        if rid > 0:
            with self._fast_lock:
                self._fast_specs[int(rid)] = _FastSpec(
                    route_id=int(rid), name="<dyn>", kind=spec["kind"],
                    label=spec["label"], prop=spec["prop"],
                    dim=spec["dim"], k_fixed=spec["k_fixed"],
                    k_max=self.K_MAX, tenant_key=spec["tenant_key"],
                    query=query, vec_key=spec["vec_key"],
                    k_key=spec["k_key"] or None,
                )
        return rid > 0

    def _lookup_eligible(self, query: dict, params: dict):
        """Point-lookup plan: one Query ``N(Param) -> ValueMap(None)``
        returning its own var; parameters carry exactly the id array."""
        entries = query.get("queries") or []
        if len(entries) != 1 or "Query" not in entries[0]:
            return None
        body = entries[0]["Query"]
        if body.get("condition") is not None:
            return None
        var = body.get("name")
        if not isinstance(var, str) or query.get("returns") != [var]:
            return None
        steps = body.get("steps") or []
        if len(steps) != 2:
            return None
        src, term = steps
        if not (isinstance(src, dict) and set(src) == {"N"}):
            return None
        ref = src["N"]
        if not (
            isinstance(ref, dict) and set(ref) == {"Param"}
            and isinstance(ref["Param"], str)
        ):
            return None
        if not (
            isinstance(term, dict) and set(term) == {"ValueMap"}
            and term["ValueMap"] is None
        ):
            return None
        ids_key = ref["Param"]
        if set(params.keys()) != {ids_key}:
            return None
        ids = params[ids_key]
        if not isinstance(ids, list) or len(ids) > self.LOOKUP_IDS_CAP:
            return None
        if not all(isinstance(i, int) and i >= 0 for i in ids):
            return None
        return var, ids_key

    def _push_lookup_blobs(self, spec, result, epoch0: int) -> None:
        """Cache each returned element's value_map bytes, tagged with
        the store epoch observed BEFORE the read executed — C++ rejects
        the put if a write completed in between."""
        var, _ids_key = spec
        if not isinstance(result, JsonResult) or result.status != 200:
            return
        payload = result.payload
        elems = payload.get(var) if isinstance(payload, dict) else None
        if not isinstance(elems, list):
            return
        lib, h = self._lib, self._handle
        for elem in elems:
            if not isinstance(elem, dict):
                return
            node_id = elem.get("$id")
            if not isinstance(node_id, int) or node_id < 0:
                return
            blob = fastjson.dumpb(elem, nan_null=True)
            if not lib.hxgw_blob_put(h, epoch0, node_id, blob, len(blob)):
                return  # stale epoch / budget: stop pushing

    # -- worker loops ----------------------------------------------------

    # Cap on dispatched-but-unfinalized batches.  Each in-flight batch
    # overlaps its (tunnel-expensive) D2H with the next dispatch; more
    # than a few buys nothing and grows tail latency.
    VBATCH_INFLIGHT = 8
    # Concurrent finalizers draining the in-flight queue (see start of
    # _vbatch_loop); responses sequence per-connection in C++, so
    # out-of-order completion is safe.
    VBATCH_FINALIZERS = 3
    # Widest query vector the fast path carries (the C++ vbatch buffer
    # is allocated this wide); wider routes stay on the interpreter.
    MAX_FAST_DIM = 4096

    def _vbatch_loop(self) -> None:
        """Dispatch stage of the fast path: pull parsed request batches
        from C++, issue the device search, hand the un-forced result to
        the finalize stage.  Keeping dispatch and D2H in separate threads
        pipelines the device: dispatch N+1 runs while batch N's results
        are still in flight."""
        import queue as _queue
        import time

        lib, h = self._lib, self._handle
        cap = self.VBATCH_CAP
        max_dim = self.MAX_FAST_DIM
        reqids = np.empty(cap, np.uint64)
        queries = np.empty((cap, max_dim), np.float32)
        ks = np.empty(cap, np.int32)
        route_ids = np.empty(cap, np.int32)
        tenants = np.zeros(cap * self.TENANT_CAP, np.uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)

        pending: _queue.Queue = _queue.Queue(maxsize=self.VBATCH_INFLIGHT)
        # A small pool: each finalize blocks on its batch's D2H; on a
        # remote chip that wait is an RPC round trip, and overlapping a
        # few of them (transfers were already started async at dispatch)
        # keeps the device, the wire, and the host formatter all busy.
        finishers = [
            threading.Thread(
                target=self._vbatch_finalize_loop, args=(pending,), daemon=True
            )
            for _ in range(self.VBATCH_FINALIZERS)
        ]
        # registered so stop() never frees the C++ gateway while a
        # finalizer outliving the 5s join below still holds the handle
        self._finishers = finishers
        for finisher in finishers:
            finisher.start()
        last_refresh = time.monotonic()
        try:
            while not self._stop.is_set():
                n = lib.hxgw_next_vbatch(
                    h, cap, max_dim, 200,
                    reqids.ctypes.data_as(u64p),
                    queries.ctypes.data_as(f32p),
                    ks.ctypes.data_as(i32p),
                    route_ids.ctypes.data_as(i32p),
                    tenants.ctypes.data_as(ctypes.c_char_p),
                )
                if n < 0:
                    return
                now = time.monotonic()
                if now - last_refresh > 5.0:
                    # indexes gain matrices (first write) after bundle
                    # load; re-analysis keeps eligibility current
                    last_refresh = now
                    try:
                        self._analyze_fast_routes()
                    except Exception:
                        pass
                if n == 0:
                    continue
                # Inflight ledger: the whole batch counts while this
                # thread dispatches it (blanket +n/-n), and each group
                # handed to a finalizer RE-tracks at yield time so the
                # async finalize window stays covered.  The blanket
                # finally settles the books even when dispatch raises —
                # before this, an exception leaked _inflight permanently
                # and the idle-gated GC sweep never ran again.
                self._track(n)
                try:
                    for item in self._dispatch_vbatch(
                        reqids[:n].copy(), queries[:n], ks[:n].copy(),
                        route_ids[:n].copy(),
                        tenants[: n * self.TENANT_CAP].reshape(
                            n, self.TENANT_CAP
                        ),
                    ):
                        pending.put(item)
                except Exception:
                    # the fast path must never die: fail THIS batch's
                    # requests loudly (already-answered reqids no-op)
                    # and keep serving
                    err = (b'{"error": {"kind": "Internal", '
                           b'"message": "vector fast path failed"}}')
                    for rq in reqids[:n]:
                        try:
                            lib.hxgw_respond(
                                h, int(rq), 500, b"application/json",
                                err, len(err),
                            )
                        except Exception:
                            pass
                finally:
                    self._track(-n)
        finally:
            for _ in finishers:
                pending.put(None)
            for finisher in finishers:
                finisher.join(timeout=5.0)

    def _dispatch_vbatch(self, reqids, queries, ks, route_ids, tenant_rows):
        """Group one pulled batch by (route, tenant) and dispatch each
        group's search.  Yields (reqids, rid, ks, finalize) work items."""
        engine = self.engine
        with self._fast_lock:
            # Currently-registered routes ride the fast path; retired
            # rids (requests parsed before a bundle reload) go through
            # the interpreter fallback, which responds by reqid with no
            # template.  (C++ also keeps retired templates now, so a
            # reload BETWEEN dispatch and finalize cannot drop the
            # response either.)
            specs = dict(self._fast_specs)
            retired = dict(self._retired_specs)
        if any(s.tenant_key for s in specs.values()) or any(
            s.tenant_key for s in retired.values()
        ):
            # tenant values are ASCII by the C++ parse contract (non-
            # ASCII/control bytes fall back to the interpreter)
            tenant_strs = [
                bytes(row).split(b"\0", 1)[0].decode("ascii")
                for row in tenant_rows
            ]
            groups: dict[tuple, list[int]] = {}
            for i in range(len(reqids)):
                groups.setdefault(
                    (int(route_ids[i]), tenant_strs[i]), []
                ).append(i)
            grouped = [
                (rid, tenant, np.asarray(idx_list))
                for (rid, tenant), idx_list in groups.items()
            ]
        else:
            # untenanted workload: stay vectorized — no per-row Python
            grouped = [
                (int(rid), "", np.nonzero(route_ids == rid)[0])
                for rid in np.unique(route_ids)
            ]
        for rid, tenant, rows in grouped:
            spec = specs.get(rid)
            part = None
            unknown_tenant = False
            if spec is not None:
                spec_tag = (
                    "NodeVector" if spec.kind == "nodes" else "EdgeVector"
                )
                index = engine.vectors.indexes.get(
                    (spec_tag, spec.label, spec.prop)
                )
                if index is not None:
                    try:
                        part = index.partition_for_search(
                            {"String": tenant} if spec.tenant_key else None
                        )
                    except Exception:
                        part = None
                    unknown_tenant = (
                        part is None
                        and bool(spec.tenant_key)
                        and index.defn.tenant_property is not None
                    )
                if part is not None and (
                    part.matrix is None or part.matrix.dim != spec.dim
                ):
                    # dim mismatch / not-yet-materialized matrix: the
                    # interpreter decides (it may raise — an empty 200
                    # here would silently diverge from the slow path)
                    part = None
            if part is None:
                if unknown_tenant:
                    # known route, UNKNOWN tenant: the contract is an
                    # empty result set (dsl.rs:326-330), not an error —
                    # answer directly without the interpreter
                    self._respond_empty_fast(
                        np.ascontiguousarray(reqids[rows]), rid
                    )
                    continue
                for i in rows:
                    self._respond_slow_fallback(
                        int(reqids[i]), rid, queries[i], int(ks[i]),
                        tenant=tenant or None,
                    )
                continue
            kq = int(ks[rows].max())
            batch_q = np.ascontiguousarray(queries[rows, : spec.dim])
            try:
                with engine._rwlock.read():
                    finalize = part.search_many_async(batch_q, kq)
            except Exception:
                for i in rows:
                    self._respond_slow_fallback(
                        int(reqids[i]), rid, queries[i], int(ks[i]),
                        tenant=tenant or None,
                    )
                continue
            # tracked until the finalizer answers (the caller's blanket
            # -n lands when this generator is exhausted, so the async
            # finalize window needs its own +1 per row)
            self._track(len(rows))
            yield (
                np.ascontiguousarray(reqids[rows]), rid,
                np.ascontiguousarray(ks[rows]), batch_q, finalize,
                tenant or None,
            )

    def _respond_empty_fast(self, batch_reqids: np.ndarray, rid: int) -> None:
        """Zero-hit fast responses (unknown tenant)."""
        lib, h = self._lib, self._handle
        n = len(batch_reqids)
        lib.hxgw_respond_vbatch(
            h,
            batch_reqids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            np.full(n, rid, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)
            ),
            n, 1,
            np.zeros((n, 1), np.uint64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint64)
            ),
            np.zeros((n, 1), np.float64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)
            ),
            np.zeros(n, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)
            ),
        )

    def _vbatch_finalize_loop(self, pending) -> None:
        """Finalize stage: force each dispatched batch's D2H, format and
        enqueue the responses via C++."""
        lib, h = self._lib, self._handle
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        while True:
            item = pending.get()
            if item is None:
                return
            batch_reqids, rid, batch_ks, batch_q, finalize, tenant = item
            try:
                ids, dists = finalize()
            except Exception:
                for i in range(len(batch_reqids)):
                    self._respond_slow_fallback(
                        int(batch_reqids[i]), rid, batch_q[i],
                        int(batch_ks[i]), tenant=tenant,
                    )
                self._track(-len(batch_reqids))
                continue
            got = ids.shape[1]
            counts = np.minimum(
                np.isfinite(dists).sum(axis=1), batch_ks
            ).astype(np.int32)
            out_ids = np.zeros((len(batch_reqids), max(got, 1)), np.uint64)
            out_dists = np.zeros((len(batch_reqids), max(got, 1)), np.float64)
            if got:
                out_ids[:, :got] = ids
                out_dists[:, :got] = dists
            batch_rids = np.full(len(batch_reqids), rid, np.int32)
            lib.hxgw_respond_vbatch(
                h,
                batch_reqids.ctypes.data_as(u64p),
                batch_rids.ctypes.data_as(i32p),
                len(batch_reqids), out_ids.shape[1],
                out_ids.ctypes.data_as(u64p),
                out_dists.ctypes.data_as(f64p),
                counts.ctypes.data_as(i32p),
            )
            self._track(-len(batch_reqids))

    def _respond_slow_fallback(
        self, reqid: int, route_id: int, query_row: np.ndarray, k: int,
        tenant: str | None = None,
    ) -> None:
        """Serve a fast-queued request through the interpreter (used when
        the fast spec vanished mid-flight, e.g. index dropped)."""
        lib, h = self._lib, self._handle
        with self._fast_lock:
            spec = self._fast_specs.get(route_id) or self._retired_specs.get(route_id)
        try:
            if spec is None:
                raise KeyError("fast route no longer installed")
            if spec.query is not None:
                # dynamic learned plan: no stored route exists — replay
                # the captured plan as a plain read request (byte-equal
                # to what the slow path would have served)
                params: dict[str, Any] = {
                    spec.vec_key: [float(x) for x in query_row[: spec.dim]]
                }
                if spec.k_key:
                    params[spec.k_key] = k
                if spec.tenant_key and tenant is not None:
                    params[spec.tenant_key] = tenant
                payload = self.engine.execute({
                    "request_type": "read", "query_name": None,
                    "query": spec.query, "parameters": params,
                })
                status = 200
            else:
                params = {
                    # vec_key/k_key recovery needs the route definition
                }
                route = self.engine.routes.get(spec.name)
                if route is None:
                    raise KeyError(f"unknown stored query: {spec.name}")
                search = route["query"]["queries"][0]["Query"]["steps"][0]
                body = next(iter(search.values()))

                def unwrap(node):
                    if isinstance(node, dict) and set(node) == {"Expr"}:
                        node = node["Expr"]
                    return node.get("Param") if isinstance(node, dict) else None

                params[unwrap(body["query_vector"])] = [
                    float(x) for x in query_row[: spec.dim]
                ]
                kp = unwrap(body["k"])
                if kp is not None:
                    params[kp] = k
                if tenant is not None:
                    tp = unwrap(body.get("tenant_value"))
                    if tp is not None:
                        params[tp] = tenant
                payload = self.engine.execute_stored(spec.name, params)
                status = 200
        except Exception as exc:
            from ..engine import EngineError

            if isinstance(exc, EngineError):
                payload, status = {"error": exc.to_json()}, 400
            else:
                payload, status = (
                    {"error": {"kind": "Internal", "message": str(exc)}},
                    500,
                )
        data = fastjson.dumpb(payload, nan_null=True)
        lib.hxgw_respond(h, reqid, status, b"application/json", data, len(data))

    def _general_loop(self) -> None:
        lib, h = self._lib, self._handle
        method = ctypes.create_string_buffer(16)
        path = ctypes.create_string_buffer(4096)
        body_ptr = ctypes.c_void_p()
        body_len = ctypes.c_longlong()
        flags = ctypes.c_int()
        while not self._stop.is_set():
            reqid = lib.hxgw_next_general_zc(
                h, 200, method, 16, path, 4096,
                ctypes.byref(body_ptr), ctypes.byref(body_len),
                ctypes.byref(flags),
            )
            if reqid < 0:
                return
            if self._blobs_dirty:
                # writes that bypassed HTTP (replication apply) must
                # invalidate the native blob cache promptly
                try:
                    self._push_blob_epoch()
                except Exception:
                    pass
            if reqid == 0:
                continue
            # zero-copy body view into the C++-parked buffer; released
            # in _handle_general's finally once parsing is done
            n = int(body_len.value)
            if n and body_ptr.value:
                raw = memoryview(
                    (ctypes.c_char * n).from_address(body_ptr.value)
                ).cast("B")
            else:
                raw = b""
            try:
                self._handle_general(
                    int(reqid),
                    method.value.decode("latin-1"),
                    path.value.decode("latin-1"),
                    raw,
                    flags.value,
                )
            except Exception as exc:
                # response-encoding failures (dispatch() catches its
                # own) must not kill the worker thread; answer 500 so
                # the client is not left hanging
                try:
                    data = fastjson.dumpb({"error": {
                        "kind": "Internal", "message": str(exc)}}, nan_null=True)
                    lib.hxgw_respond(
                        h, int(reqid), 500, b"application/json",
                        data, len(data),
                    )
                except Exception:
                    pass

    # Bodies above this size are handled one at a time: several workers
    # decoding multi-MB JSON concurrently just thrash the GIL (measured
    # 4x slower than sequential on 27 MB ingest bodies), while small
    # requests still fan out across the pool.
    BIG_BODY_BYTES = 4 << 20
    _big_body_lock = threading.Lock()

    def _handle_general(
        self, reqid: int, method: str, path: str, raw: bytes, flags: int
    ) -> None:
        lib, h = self._lib, self._handle
        warm = bool(flags & 1)
        await_durable = not bool(flags & 4)
        trace = bool(flags & 8)
        self._track(1)
        try:
            self._handle_general_inner(
                lib, h, reqid, method, path, raw, warm, await_durable, trace
            )
        finally:
            # long-lived streams (SSE) hand off to their own thread and
            # count as done here; their churn is negligible
            self._track(-1)

    def _handle_general_inner(
        self, lib, h, reqid, method, path, raw, warm, await_durable, trace
    ) -> None:
        # Candidate for dynamic-route learning: copy the body (the view
        # dies with the C++ buffer) and capture the pre-execution store
        # epoch so blob puts lose any race with a concurrent write.
        learn_body = None
        epoch0 = 0
        if (
            method == "POST" and path == "/v1/query" and not trace
            and 0 < len(raw) <= self.DYN_BODY_CAP
        ):
            learn_body = bytes(raw)
            epoch0 = self.engine.store.epoch
        try:
            if len(raw) >= self.BIG_BODY_BYTES:
                with self._big_body_lock:
                    result = dispatch(
                        self, method, path, raw,
                        warm=warm, await_durable=await_durable, trace=trace,
                    )
            else:
                result = dispatch(
                    self, method, path, raw,
                    warm=warm, await_durable=await_durable, trace=trace,
                )
        finally:
            if not isinstance(raw, bytes):
                raw.release()  # invalidate the view before C++ frees it
            # ALWAYS release: the C++ side parks an entry per request
            # even when the body is empty (every GET / follower poll
            # would otherwise leak an unordered_map node forever)
            lib.hxgw_release_body(h, reqid)
        # Any write this request performed must invalidate the native
        # blob cache BEFORE its ack is sent (read-your-writes: a client
        # that saw the ack must never be served a pre-write blob).  The
        # dirty flag alone is NOT a sufficient gate: store write hooks
        # set it BEFORE store.bump() increments the epoch, so a
        # concurrent _push_blob_epoch (general-loop poll) can clear the
        # flag while reading the pre-bump epoch — a dirty-gated push
        # here would then skip and ack with C++ still validating stale
        # blobs.  Comparing the epoch to the last pushed value closes
        # that window: our own bump ran synchronously before this line,
        # so either the concurrent pusher carried it (pushed == epoch,
        # skip is safe) or we push it now.
        if (
            self._blobs_dirty
            or self.engine.store.epoch != self._blob_epoch_pushed
        ):
            self._push_blob_epoch()
        if isinstance(result, JsonResult):
            data = fastjson.dumpb(result.payload, nan_null=True)
            lib.hxgw_respond(
                h, reqid, result.status, b"application/json", data, len(data)
            )
            if learn_body is not None and result.status == 200:
                try:
                    self._maybe_learn_dynamic(learn_body, result, epoch0)
                except Exception:
                    pass  # learning is an optimization, never an error
        elif isinstance(result, BytesResult):
            lib.hxgw_respond(
                h, reqid, result.status, result.content_type.encode(),
                result.body, len(result.body),
            )
        elif isinstance(result, FileResult):
            # close-delimited stream in 1 MB chunks: replica seeds can
            # be GBs and must not buffer in either process
            import os as _os

            lib.hxgw_respond_stream_start(
                h, reqid, result.status, result.content_type.encode()
            )
            try:
                with open(result.path, "rb") as fh:
                    while True:
                        chunk = fh.read(1 << 20)
                        if not chunk:
                            break
                        if lib.hxgw_stream_write(h, reqid, chunk, len(chunk)) != 0:
                            break
            finally:
                lib.hxgw_stream_end(h, reqid)
                _os.unlink(result.path)
        elif isinstance(result, EventStream):
            # dedicated streamer so the worker pool is not pinned by a
            # long-lived SSE subscriber; tracked so stop() never frees the
            # C++ gateway under a live streamer
            t = threading.Thread(
                target=self._stream_events, args=(reqid, result.after),
                daemon=True,
            )
            # prune finished streamers on append: reconnecting SSE
            # subscribers would otherwise grow this list forever
            self._streamers = [
                s for s in self._streamers if s.is_alive()
            ] + [t]
            t.start()

    def _stream_events(self, reqid: int, after: int) -> None:
        lib, h = self._lib, self._handle
        lib.hxgw_respond_stream_start(h, reqid, 200, b"text/event-stream")
        telemetry = self.engine.telemetry
        while not self._stop.is_set():
            if not lib.hxgw_request_alive(h, reqid):
                return
            # short wait so stop() can reclaim the gateway promptly
            events = telemetry.events_since(after, timeout=1.0)
            if self._stop.is_set():
                return
            if not events:
                chunk = b": keepalive\n\n"
            else:
                parts = []
                for event in events:
                    after = max(after, event.get("seq", after))
                    payload = fastjson.dumps(event, nan_null=True)
                    parts.append(f"id: {event.get('seq')}\ndata: {payload}\n\n")
                chunk = "".join(parts).encode()
            if lib.hxgw_stream_write(h, reqid, chunk, len(chunk)) != 0:
                return

    # -- lifecycle --------------------------------------------------------

    def _gc_maintenance(self) -> None:
        """Serving GC policy: automatic cyclic GC is off (a gen2 sweep
        over a multi-GB store graph stalls every request for seconds;
        measured 4-8x ingest slowdowns).  Refcounting frees everything
        acyclic; this thread sweeps the YOUNG generations so cyclic
        garbage (exception tracebacks, frames) cannot accumulate, without
        ever scanning the long-lived store.

        The sweep runs only when NO request is in flight: with automatic
        GC off, gen0 holds everything allocated since the last sweep, so
        a sweep that lands mid-bulk-ingest scans the whole parse + store
        churn under the GIL — measured 5x ingest slowdowns from exactly
        that (the old requests-started heuristic read a >2 s request as
        "quiet").  Idle-only sweeps promote a big ingest's survivors
        once, between requests, where the pause is invisible."""
        import gc

        gc.disable()
        last_seen = -1
        while not self._stop.wait(2.0):
            with self._inflight_lock:
                idle = self._inflight == 0
                current = self._requests_handled
            if idle and current != last_seen:
                try:
                    gc.collect(1)
                except Exception:
                    pass
                last_seen = current
        gc.enable()

    def start(self) -> None:
        lib = self._lib
        handle = lib.hxgw_create(
            self.host.encode(), self.port,
            self.api_key.encode() if self.api_key else None,
        )
        if not handle:
            raise OSError(f"cannot bind native gateway to {self.host}:{self.port}")
        self._handle = handle
        self.port = lib.hxgw_port(handle)
        lib.hxgw_start(handle)
        self._analyze_fast_routes()
        self._push_blob_epoch()  # sync C++ to the (possibly recovered) store
        self._stop.clear()
        self._threads = [
            threading.Thread(target=self._vbatch_loop, daemon=True),
            threading.Thread(target=self._gc_maintenance, daemon=True),
        ] + [
            threading.Thread(target=self._general_loop, daemon=True)
            for _ in range(self.general_workers)
        ]
        for t in self._threads:
            t.start()

    def serve_forever(self) -> None:
        self.start()
        try:
            while not self._stop.wait(3600.0):
                pass
        finally:
            self.stop()

    def stop(self, close_engine: bool = True) -> None:
        self._stop.set()
        if self.follower is not None:
            self.follower.stop()
        if self._handle is not None:
            self._lib.hxgw_stop(self._handle)
            alive = False
            for t in self._threads + self._streamers + self._finishers:
                t.join(timeout=10.0)
                alive = alive or t.is_alive()
            if not alive:
                # never free the C++ gateway under a live worker
                self._lib.hxgw_destroy(self._handle)
            self._handle = None
        if close_engine:
            self.engine.close()

    def stats(self) -> dict:
        if self._handle is None:  # stopped: hxgw_stats would deref NULL
            return {"fast_requests": 0, "general_requests": 0,
                    "connections": 0, "lookup_requests": 0,
                    "blobs_cached": 0, "dyn_routes": 0}
        n_fast = ctypes.c_uint64()
        n_general = ctypes.c_uint64()
        n_conns = ctypes.c_uint64()
        self._lib.hxgw_stats(
            self._handle, ctypes.byref(n_fast), ctypes.byref(n_general),
            ctypes.byref(n_conns),
        )
        n_lookup = ctypes.c_uint64()
        n_blobs = ctypes.c_uint64()
        n_dyn = ctypes.c_uint64()
        self._lib.hxgw_dyn_stats(
            self._handle, ctypes.byref(n_lookup), ctypes.byref(n_blobs),
            ctypes.byref(n_dyn),
        )
        return {
            "fast_requests": n_fast.value,
            "general_requests": n_general.value,
            "connections": n_conns.value,
            "lookup_requests": n_lookup.value,
            "blobs_cached": n_blobs.value,
            "dyn_routes": n_dyn.value,
        }

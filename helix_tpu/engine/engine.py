"""Engine facade: one database instance.

Wires the store, snapshot cache, vector/text index managers, and the
executor together, and exposes the two entry points the serving layer
needs: :meth:`execute` (dynamic requests, ``POST /v1/query``) and
:meth:`execute_stored` (deployed routes, ``POST /v1/query/<name>``).
"""

from __future__ import annotations

import threading
from typing import Any

from .. import wire
from ..dsl import load_query_bundle
from .errors import QueryError
from .exec import Executor
from .snapshot import SnapshotCache
from .store import GraphStore
from .text import TextManager
from .vector import VectorManager


class Engine:
    def __init__(self, metric: str = "cosine"):
        self.store = GraphStore()
        self.snapshots = SnapshotCache(self.store)
        self.vectors = VectorManager(metric=metric)
        self.texts = TextManager()
        self.store.add_write_hook(self.vectors)
        self.store.add_write_hook(self.texts)
        # Single-writer semantics: one writer at a time, readers see the
        # snapshot of a consistent epoch (reference topology README.md:248).
        self._write_lock = threading.Lock()
        self.routes: dict[str, dict] = {}  # name -> {kind, query, parameters}

    # -- dynamic requests ------------------------------------------------

    def execute(self, request: dict) -> dict:
        executor = Executor(self)
        try:
            if isinstance(request, dict) and request.get("request_type") == "write":
                with self._write_lock:
                    return executor.execute(request)
            return executor.execute(request)
        except wire.WireError as exc:
            raise QueryError(str(exc)) from exc

    # -- stored routes ----------------------------------------------------

    def load_bundle(self, bundle: Any) -> None:
        """Install a queries.json bundle (wire v5; legacy v4 accepted)."""
        if not isinstance(bundle, dict) or "version" not in bundle:
            bundle = load_query_bundle(bundle)
        version = bundle.get("version", -1)
        if version != wire.QUERY_BUNDLE_VERSION and version not in wire.QUERY_BUNDLE_LEGACY_VERSIONS:
            raise QueryError(f"unsupported query bundle version {version}")
        self.routes = {}
        for kind, routes_key, params_key in (
            ("read", "read_routes", "read_parameters"),
            ("write", "write_routes", "write_parameters"),
        ):
            params_table = bundle.get(params_key, {})
            for name, query in bundle.get(routes_key, {}).items():
                self.routes[name] = {
                    "kind": kind,
                    "query": query,
                    "parameters": params_table.get(name, []),
                }

    def execute_stored(self, name: str, parameters: dict | None) -> dict:
        route = self.routes.get(name)
        if route is None:
            raise QueryError(f"unknown stored query: {name}")
        request = {
            "request_type": route["kind"],
            "query_name": name,
            "query": route["query"],
            "parameters": parameters or {},
            "parameter_types": {
                p["name"]: p["ty"] for p in route["parameters"]
            },
        }
        return self.execute(request)

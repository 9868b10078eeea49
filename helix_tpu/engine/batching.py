"""Dynamic micro-batching for vector search.

TPU serving economics are dominated by per-dispatch cost (and, under a
tunneled dev chip, per-RPC cost): a single query and a 256-query batch
take nearly the same wall time on the MXU.  The batcher coalesces
concurrent searches against the same index partition into one device
dispatch — the serving-layer analog of the reference's reader-node
concurrency (``README.md:248``), restated for accelerator hardware.

Requests enqueue under a lock; a daemon drain thread wakes on the first
request, waits ``window_s`` for stragglers, groups the queue by
partition, and runs one stacked search per group.  Callers block on an
event and receive their slice.  Window latency is bounded (default 2 ms)
and single-caller workloads pay at most one window.
"""

from __future__ import annotations

import threading
from typing import Any

import numpy as np


class _Pending:
    __slots__ = ("partition", "query", "k", "event", "result", "error")

    def __init__(self, partition: Any, query: np.ndarray, k: int):
        self.partition = partition
        self.query = query
        self.k = k
        self.event = threading.Event()
        self.result: tuple[np.ndarray, np.ndarray] | None = None
        self.error: Exception | None = None


class DynamicBatcher:
    """Coalesces concurrent partition searches into stacked dispatches."""

    # A dispatch within this horizon means traffic is bursty: wait the
    # full window for stragglers.  Otherwise (sporadic traffic) dispatch
    # immediately so lone requests do not pay the window as latency.
    BURST_HORIZON_S = 0.025

    def __init__(self, window_s: float = 0.002):
        self.window_s = window_s
        self._lock = threading.Lock()
        self._queue: list[_Pending] = []
        self._wake = threading.Event()
        self._thread: threading.Thread | None = None
        self._last_dispatch = 0.0
        self.dispatches = 0       # observability: device calls issued
        self.coalesced = 0        # requests served by shared dispatches

    def _ensure_thread(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def submit(
        self, partition: Any, query: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        entry = _Pending(partition, query, k)
        with self._lock:
            self._queue.append(entry)
            self._ensure_thread()
            self._wake.set()
        entry.event.wait()
        if entry.error is not None:
            raise entry.error
        assert entry.result is not None
        return entry.result

    def _run(self) -> None:
        import time

        while True:
            self._wake.wait()
            # Bursty traffic: collect stragglers for one window.  Sporadic
            # traffic: drain immediately (adaptive latency).
            if time.monotonic() - self._last_dispatch < self.BURST_HORIZON_S:
                threading.Event().wait(self.window_s)
            with self._lock:
                batch, self._queue = self._queue, []
                self._wake.clear()
            if not batch:
                continue
            groups: dict[int, list[_Pending]] = {}
            for entry in batch:
                groups.setdefault(id(entry.partition), []).append(entry)
            # Dispatch EVERY group before forcing any result: the exact
            # tier's async path puts each group's device work (and D2H)
            # on the wire at dispatch time, so concurrent partitions
            # overlap instead of serializing one round trip per group
            # (the pattern the native gateway's batch loop uses).
            started = [
                (entries, self._start(entries))
                for entries in groups.values()
            ]
            for entries, fin in started:
                if fin is not None:
                    self._finish(entries, fin)
            self._last_dispatch = time.monotonic()

    def _start(self, entries: list[_Pending]):
        """Dispatch one group; returns its finalize closure (or None
        after failing every waiter)."""
        partition = entries[0].partition
        try:
            queries = np.stack([e.query for e in entries])
            k_max = max(e.k for e in entries)
            async_fn = getattr(partition, "search_many_async", None)
            if async_fn is not None:
                fin = async_fn(queries, k_max)
            else:
                result = partition.search_many(queries, k_max)
                fin = lambda r=result: r  # noqa: E731
            self.dispatches += 1
            self.coalesced += len(entries) - 1
            return fin
        except Exception as exc:  # propagate to every waiter
            for entry in entries:
                entry.error = exc
                entry.event.set()
            return None

    def _finish(self, entries: list[_Pending], fin) -> None:
        try:
            ids, dists = fin()
            for row, entry in enumerate(entries):
                # Rows are compacted valid-left; ragged short rows pad
                # with +inf sentinels that must not surface as hits.
                row_d = dists[row]
                mask = np.isfinite(row_d)
                width = min(entry.k, int(mask.sum()))
                entry.result = (
                    ids[row][mask][:width], row_d[mask][:width]
                )
                entry.event.set()
        except Exception as exc:  # propagate to every waiter
            for entry in entries:
                entry.error = exc
                entry.event.set()

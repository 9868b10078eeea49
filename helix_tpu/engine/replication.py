"""Read-replica replication: logical write-record shipping.

The reference topology is a single writer with autoscaled read replicas
(``README.md:248``; the client's ``x-helix-require-writer`` header exists
to route writes, ``lib.rs:274-281``).  helix-tpu replicates the same way
it persists: every committed write batch is a deterministic logical
record (request + evaluation clock), so a replica is just an engine that
re-executes the primary's record stream in order.

- The primary keeps a sequence-numbered ring of committed write records
  (``RING_CAP``) and serves it at ``GET /v1/replication?after=<seq>``.
  A replica further behind than the ring (or joining fresh after a
  trim) bootstraps from ``GET /v1/snapshot`` — a consistent seed
  snapshot tagged with the replication watermark it was taken at —
  then resumes tailing the ring from that watermark.
- A replica runs a follower thread polling the primary and applying
  records under the engine's writer lock; its gateway rejects client
  writes with a pointer to the primary.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from typing import Any

RING_CAP = 65536
# Byte cap on retained records: bulk-ingest records are multi-MB each
# (a 27 MB ForEach body is ONE record), so a record-count cap alone
# retains gigabytes — measured ~900 MB after 184 bulk writes in a 3-min
# soak.  Replicas that fall behind the byte window reseed from
# /v1/snapshot, the already-supported catch-up path.
RING_BYTES_CAP = 256 << 20
POLL_INTERVAL_S = 0.25


class ReplicationLog:
    """Primary-side ring of committed write records.

    Records carry ``bytes`` (the wire-size estimate used for the ring's
    byte cap) through the replication feed on purpose: followers reuse
    it so THEIR ring accounts bulk records truthfully too.  Absent
    (older primary), the follower falls back to the small-record
    default."""

    def __init__(self, cap: int = RING_CAP, bytes_cap: int = RING_BYTES_CAP):
        self.cap = cap
        self.bytes_cap = bytes_cap
        self._records: list[dict] = []
        self._bytes = 0
        self._start_seq = 0
        self._lock = threading.Lock()

    def append(
        self, request: dict, now_ms: int, approx_bytes: int | None = None
    ) -> int:
        if approx_bytes is None:
            # callers off the HTTP path (tests, embedded use) don't know
            # the wire size; assume a small record
            approx_bytes = 4096
        with self._lock:
            seq = self._start_seq + len(self._records)
            self._records.append(
                {"seq": seq, "now_ms": now_ms, "request": request,
                 "bytes": approx_bytes}
            )
            self._bytes += approx_bytes
            while len(self._records) > 1 and (
                len(self._records) > self.cap or self._bytes > self.bytes_cap
            ):
                dropped = self._records.pop(0)
                self._bytes -= dropped.get("bytes", 0)
                self._start_seq += 1
            return seq

    def since(self, after_seq: int, limit: int = 512) -> tuple[list[dict], bool]:
        """(records with seq > after_seq, caller_is_too_far_behind)."""
        with self._lock:
            if after_seq + 1 < self._start_seq:
                return [], True
            start = max(after_seq + 1 - self._start_seq, 0)
            return list(self._records[start:start + limit]), False

    def head_seq(self) -> int:
        with self._lock:
            return self._start_seq + len(self._records) - 1

    def reset_to(self, next_seq: int) -> None:
        """Drop all records and continue numbering at ``next_seq``
        (replica seeded from a snapshot watermark)."""
        with self._lock:
            self._records = []
            self._bytes = 0
            self._start_seq = next_seq


class _SeedUnpickler:
    """Restricted unpickler for seed snapshots fetched over the wire.

    The seed payload only ever contains plain containers, scalars, and
    numpy arrays — a malicious or corrupted primary response cannot
    smuggle arbitrary callables through pickle.  Shares the allowlist
    with disk-snapshot loading (:mod:`helix_tpu.engine.persist`)."""

    @classmethod
    def loads(cls, data: bytes):
        from .persist import restricted_loads

        return restricted_loads(data)

    @classmethod
    def load(cls, fileobj):
        from .persist import restricted_load

        return restricted_load(fileobj)


class Follower:
    """Replica-side thread applying the primary's record stream."""

    def __init__(self, engine: Any, primary_url: str, api_key: str | None = None):
        self.engine = engine
        self.primary_url = primary_url.rstrip("/")
        self.api_key = api_key
        self.applied_seq = -1
        self.last_error: str | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()

    def _fetch(self) -> dict:
        url = f"{self.primary_url}/v1/replication?after={self.applied_seq}"
        req = urllib.request.Request(url, method="GET")
        if self.api_key:
            req.add_header("Authorization", f"Bearer {self.api_key}")
        with urllib.request.urlopen(req, timeout=30) as resp:
            # native codec with the numeric-array fast path: bulk
            # ingest records are multi-MB vector bodies, and the
            # follower re-parses every one the primary accepted
            from .. import fastjson

            return fastjson.loads(resp.read(), fast_arrays=True)

    def _reseed(self) -> None:
        """Bootstrap from the primary's seed snapshot when this replica
        is behind the record ring (fresh replica, or ring trimmed past
        our position).  ``GET /v1/snapshot`` returns a consistent
        snapshot plus the replication watermark it was taken at; we
        replace local state wholesale and resume tailing from there."""
        url = f"{self.primary_url}/v1/snapshot"
        req = urllib.request.Request(url, method="GET")
        if self.api_key:
            req.add_header("Authorization", f"Bearer {self.api_key}")
        with urllib.request.urlopen(req, timeout=600) as resp:
            # stream-unpickle off the socket: no full-seed byte buffer
            seed = _SeedUnpickler.load(resp)
        self.engine.load_replica_seed(seed)
        self.applied_seq = seed["seed_seq"]
        self.last_error = None

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                payload = self._fetch()
            except (urllib.error.URLError, OSError, json.JSONDecodeError) as exc:
                self.last_error = str(exc)
                self._stop.wait(POLL_INTERVAL_S * 4)
                continue
            if payload.get("reseed_required"):
                try:
                    self._reseed()
                except Exception as exc:
                    self.last_error = f"reseed failed: {exc}"
                    self._stop.wait(POLL_INTERVAL_S * 4)
                continue
            records = payload.get("records", [])
            for record in records:
                try:
                    self.engine.apply_replicated(
                        record["request"], record["now_ms"],
                        request_bytes=record.get("bytes"),
                    )
                    self.applied_seq = record["seq"]
                except Exception as exc:  # keep following despite one bad record
                    self.last_error = f"apply failed at seq {record['seq']}: {exc}"
                    self.applied_seq = record["seq"]
            if not records:
                self._stop.wait(POLL_INTERVAL_S)

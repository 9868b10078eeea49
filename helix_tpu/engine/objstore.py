"""Object-storage snapshot backends.

The reference keeps authoritative engine storage behind S3
(``local_runtime.rs:20-26``, ``:773-786``): instances checkpoint to the
bucket and a replacement node bootstraps by pulling the newest snapshot
back down.  helix-tpu mirrors that with a pluggable object store the
persistence layer mirrors checkpoints into:

- ``file://<dir>`` (and bare paths) — a directory acting as the bucket;
  useful for NFS-style shared volumes and for tests.
- ``s3://bucket[/prefix]`` — the S3 REST API spoken directly (stdlib
  urllib + SigV4 signing), honoring the reference's disk-mode env
  contract (``AWS_ENDPOINT``/``AWS_ACCESS_KEY_ID``/
  ``AWS_SECRET_ACCESS_KEY``/``S3_REGION``); works against real S3 and
  MinIO-compatible endpoints, exercised in tests against an in-process
  signature-verifying stub (``tests/s3_stub.py``).
- ``memory://<name>`` — process-local store (tests, ephemera).

The WAL stays on local disk: per-record fsync semantics do not map to
object PUTs.  Durability model: object storage holds the latest
checkpoint; a node that loses its disk loses only writes since the last
checkpoint (same window as the reference's S3 sync cadence).
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

SNAPSHOT_KEY = "snapshot.bin"

_MEMORY_STORES: dict[str, dict[str, bytes]] = {}
_MEMORY_LOCK = threading.Lock()


class ObjectStore:
    """Minimal blob interface: whole-object put/get."""

    def put(self, key: str, data: bytes) -> None:
        raise NotImplementedError

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError


class FileObjectStore(ObjectStore):
    """Directory-as-bucket; atomic replace per object."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def put(self, key: str, data: bytes) -> None:
        path = self.root / key
        path.parent.mkdir(parents=True, exist_ok=True)
        # per-writer tmp name: two instances mirroring to one shared
        # bucket (the documented NFS use) must not truncate each
        # other's in-flight upload — os.replace stays atomic either way
        tmp = path.with_suffix(path.suffix + f".tmp{os.getpid()}")
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def get(self, key: str) -> bytes | None:
        try:
            return (self.root / key).read_bytes()
        except FileNotFoundError:
            return None
        # any OTHER OSError (EACCES, NFS faults) propagates: reading it
        # as "no snapshot" would let a replacement node silently
        # bootstrap empty and start a new history


class MemoryObjectStore(ObjectStore):
    """Named in-process store (shared across instances in one process)."""

    def __init__(self, name: str):
        with _MEMORY_LOCK:
            self._blobs = _MEMORY_STORES.setdefault(name, {})

    def put(self, key: str, data: bytes) -> None:
        with _MEMORY_LOCK:
            self._blobs[key] = bytes(data)

    def get(self, key: str) -> bytes | None:
        with _MEMORY_LOCK:
            return self._blobs.get(key)


class S3ObjectStore(ObjectStore):
    """S3 bucket backend speaking the S3 REST API directly (stdlib only).

    Implements AWS Signature Version 4 (the public algorithm from the
    AWS documentation) over path-style requests, so it works against
    real S3 and S3-compatible stores (MinIO) alike.  Configuration
    follows the reference's env contract for disk mode
    (``local_runtime.rs:773-786``): ``AWS_ENDPOINT`` (path-style base
    URL; defaults to the regional AWS endpoint), ``AWS_ACCESS_KEY_ID``,
    ``AWS_SECRET_ACCESS_KEY``, and ``S3_REGION``/``AWS_REGION``
    (default ``us-east-1``).
    """

    def __init__(self, bucket: str, prefix: str = ""):
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.region = (
            os.environ.get("S3_REGION")
            or os.environ.get("AWS_REGION")
            or "us-east-1"
        )
        self.endpoint = os.environ.get(
            "AWS_ENDPOINT", f"https://s3.{self.region}.amazonaws.com"
        ).rstrip("/")
        self.access_key = os.environ.get("AWS_ACCESS_KEY_ID", "")
        self.secret_key = os.environ.get("AWS_SECRET_ACCESS_KEY", "")
        if not self.access_key or not self.secret_key:
            raise RuntimeError(
                "s3:// snapshot stores need AWS_ACCESS_KEY_ID and "
                "AWS_SECRET_ACCESS_KEY in the environment (reference "
                "disk-mode contract, local_runtime.rs:773-786)"
            )

    def _key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    # -- SigV4 ---------------------------------------------------------

    def _sign(self, method: str, path: str, payload: bytes) -> dict:
        """Build the signed headers for one request (AWS SigV4)."""
        import datetime
        import hashlib
        import hmac
        from urllib.parse import urlsplit

        host = urlsplit(self.endpoint).netloc
        now = datetime.datetime.now(datetime.timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        datestamp = now.strftime("%Y%m%d")
        payload_hash = hashlib.sha256(payload).hexdigest()
        canonical_headers = (
            f"host:{host}\n"
            f"x-amz-content-sha256:{payload_hash}\n"
            f"x-amz-date:{amz_date}\n"
        )
        signed_headers = "host;x-amz-content-sha256;x-amz-date"
        canonical_request = "\n".join(
            [method, path, "", canonical_headers, signed_headers,
             payload_hash]
        )
        scope = f"{datestamp}/{self.region}/s3/aws4_request"
        string_to_sign = "\n".join([
            "AWS4-HMAC-SHA256", amz_date, scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ])

        def hmac_sha256(key: bytes, msg: str) -> bytes:
            return hmac.new(key, msg.encode(), hashlib.sha256).digest()

        k_date = hmac_sha256(("AWS4" + self.secret_key).encode(), datestamp)
        k_region = hmac_sha256(k_date, self.region)
        k_service = hmac_sha256(k_region, "s3")
        k_signing = hmac_sha256(k_service, "aws4_request")
        signature = hmac.new(
            k_signing, string_to_sign.encode(), hashlib.sha256
        ).hexdigest()
        return {
            "Host": host,
            "x-amz-content-sha256": payload_hash,
            "x-amz-date": amz_date,
            "Authorization": (
                f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
                f"SignedHeaders={signed_headers}, Signature={signature}"
            ),
        }

    def _request(self, method: str, key: str, payload: bytes = b"") -> tuple:
        """One signed path-style request; returns (status, body)."""
        import urllib.error
        import urllib.request
        from urllib.parse import quote

        path = "/" + quote(f"{self.bucket}/{self._key(key)}", safe="/-_.~")
        headers = self._sign(method, path, payload)
        req = urllib.request.Request(
            self.endpoint + path,
            data=payload if method == "PUT" else None,
            headers=headers, method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as exc:
            return exc.code, exc.read()

    def put(self, key: str, data: bytes) -> None:
        status, body = self._request("PUT", key, data)
        if status != 200:
            raise RuntimeError(
                f"s3 put {self.bucket}/{self._key(key)} failed: "
                f"HTTP {status} {body[:200]!r}"
            )

    def get(self, key: str) -> bytes | None:
        status, body = self._request("GET", key)
        if status == 200:
            return body
        if status == 404 or b"NoSuchKey" in body:
            return None
        # auth failures / 5xx propagate: reading them as "no snapshot"
        # would let a replacement node silently bootstrap empty
        raise RuntimeError(
            f"s3 get {self.bucket}/{self._key(key)} failed: "
            f"HTTP {status} {body[:200]!r}"
        )


def open_store(url: str) -> ObjectStore:
    """Resolve a store URL (``s3://``, ``file://``, ``memory://``, or a
    bare directory path) to a backend."""
    if url.startswith("s3://"):
        rest = url[len("s3://"):]
        bucket, _, prefix = rest.partition("/")
        if not bucket:
            raise ValueError(f"invalid s3 store url: {url!r}")
        return S3ObjectStore(bucket, prefix)
    if url.startswith("memory://"):
        return MemoryObjectStore(url[len("memory://"):])
    if url.startswith("file://"):
        return FileObjectStore(url[len("file://"):])
    return FileObjectStore(url)

"""Object-storage snapshot backends.

The reference keeps authoritative engine storage behind S3
(``local_runtime.rs:20-26``, ``:773-786``): instances checkpoint to the
bucket and a replacement node bootstraps by pulling the newest snapshot
back down.  helix-tpu mirrors that with a pluggable object store the
persistence layer mirrors checkpoints into:

- ``file://<dir>`` (and bare paths) — a directory acting as the bucket;
  useful for NFS-style shared volumes and for tests.
- ``s3://bucket[/prefix]`` — real S3 via boto3.  boto3 is not baked
  into this image, so construction raises a clear error when it is
  missing; the URL scheme and key layout are wired end-to-end so the
  backend lights up wherever boto3 exists.
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
    """S3 bucket backend (requires boto3 at runtime)."""

    def __init__(self, bucket: str, prefix: str = ""):
        try:
            import boto3  # noqa: F401  (not baked into this image)
        except ImportError as exc:
            raise RuntimeError(
                "s3:// snapshot stores require boto3, which is not "
                "installed in this environment; use file:// or memory://"
            ) from exc
        import boto3

        self._client = boto3.client("s3")
        self.bucket = bucket
        self.prefix = prefix.strip("/")

    def _key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def put(self, key: str, data: bytes) -> None:
        self._client.put_object(
            Bucket=self.bucket, Key=self._key(key), Body=data
        )

    def get(self, key: str) -> bytes | None:
        try:
            resp = self._client.get_object(
                Bucket=self.bucket, Key=self._key(key)
            )
            return resp["Body"].read()
        except self._client.exceptions.NoSuchKey:
            return None


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

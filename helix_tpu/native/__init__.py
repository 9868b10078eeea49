"""Native runtime components (C++), loaded via ctypes.

Currently: the write-ahead log (``wal.cpp``).  The shared library is
compiled on first use with g++ (cached next to the source, keyed on
source mtime) so no build step is required for pure-Python use.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None


class NativeBuildError(RuntimeError):
    pass


def _build_library() -> Path:
    src = _HERE / "wal.cpp"
    out = _HERE / "libhxnative.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", str(out), str(src),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeBuildError(
            f"native build failed: {' '.join(cmd)}\n{proc.stderr}"
        )
    return out


def load() -> ctypes.CDLL:
    """Build (if stale) and load the native library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        lib = ctypes.CDLL(str(_build_library()))
        lib.hxwal_open.restype = ctypes.c_void_p
        lib.hxwal_open.argtypes = [ctypes.c_char_p]
        lib.hxwal_append.restype = ctypes.c_int
        lib.hxwal_append.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int,
        ]
        lib.hxwal_flush.restype = ctypes.c_int
        lib.hxwal_flush.argtypes = [ctypes.c_void_p]
        lib.hxwal_reset.restype = ctypes.c_int
        lib.hxwal_reset.argtypes = [ctypes.c_void_p]
        lib.hxwal_close.restype = None
        lib.hxwal_close.argtypes = [ctypes.c_void_p]
        lib.hxwal_reader_open.restype = ctypes.c_void_p
        lib.hxwal_reader_open.argtypes = [ctypes.c_char_p]
        lib.hxwal_reader_next.restype = ctypes.c_long
        lib.hxwal_reader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.hxwal_reader_close.restype = None
        lib.hxwal_reader_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class Wal:
    """Append handle over the native WAL."""

    def __init__(self, path: str | Path):
        self._lib = load()
        self._handle = self._lib.hxwal_open(str(path).encode())
        if not self._handle:
            raise OSError(f"cannot open WAL at {path}")

    def append(self, payload: bytes, sync: bool = True) -> None:
        rc = self._lib.hxwal_append(
            self._handle, payload, len(payload), 1 if sync else 0
        )
        if rc != 0:
            raise OSError("WAL append failed")

    def flush(self) -> None:
        if self._lib.hxwal_flush(self._handle) != 0:
            raise OSError("WAL flush failed")

    def reset(self) -> None:
        if self._lib.hxwal_reset(self._handle) != 0:
            raise OSError("WAL reset failed")

    def close(self) -> None:
        if self._handle:
            self._lib.hxwal_close(self._handle)
            self._handle = None


def replay(path: str | Path):
    """Yield every intact record payload from a WAL file."""
    lib = load()
    handle = lib.hxwal_reader_open(str(path).encode())
    if not handle:
        return
    try:
        out = ctypes.c_void_p()
        while True:
            n = lib.hxwal_reader_next(handle, ctypes.byref(out))
            if n < 0:
                break
            yield ctypes.string_at(out, n) if n else b""
    finally:
        lib.hxwal_reader_close(handle)

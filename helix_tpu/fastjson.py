"""Fast JSON codec facade.

Loads the ``hxjson`` C extension (built on first use, like the rest of
``helix_tpu.native``), exposing ``loads``/``dumps``/``dumpb`` with
stdlib-compatible semantics.  Falls back to stdlib ``json`` when the
toolchain is unavailable, so pure-Python deployments keep working.

The serving layer and bulk-ingest path are JSON-bound under stdlib
``json`` (measured round 1: ~80 MB/s decode); the native codec removes
that ceiling (reference analog: sonic-rs in the Rust client,
``sdks/rust/src/lib.rs:407-409``).
"""

from __future__ import annotations

import json as _json
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Any

_HERE = Path(__file__).resolve().parent / "native"
_LOCK = threading.Lock()
_IMPL: Any = None


def _build_extension() -> Path:
    src = _HERE / "hxjson.cpp"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = _HERE / f"hxjson{suffix}"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", "-o", str(out), str(src),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"hxjson build failed:\n{proc.stderr}")
    return out


def _load():
    global _IMPL
    if _IMPL is not None:
        return _IMPL
    with _LOCK:
        if _IMPL is not None:
            return _IMPL
        try:
            path = _build_extension()
            import importlib.util

            spec = importlib.util.spec_from_file_location("hxjson", path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)  # type: ignore[union-attr]
            _IMPL = mod
        except Exception:
            _IMPL = False
        return _IMPL


def native_available() -> bool:
    return bool(_load())


def loads(data: str | bytes | bytearray) -> Any:
    impl = _load()
    if impl:
        return impl.loads(data)
    return _json.loads(data)


def dumps(value: Any, compact: bool = False) -> str:
    impl = _load()
    if impl:
        try:
            return impl.dumps(value, compact=compact)
        except TypeError:
            pass  # non-plain types: stdlib error text for consistency
    if compact:
        return _json.dumps(value, ensure_ascii=False, separators=(",", ":"))
    return _json.dumps(value, ensure_ascii=False)


def dumpb(value: Any, compact: bool = False) -> bytes:
    impl = _load()
    if impl:
        try:
            return impl.dumpb(value, compact=compact)
        except TypeError:
            pass
    return dumps(value, compact=compact).encode("utf-8")

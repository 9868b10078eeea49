"""ctypes wrapper for the CPU HNSW baseline (``hnsw_baseline.cpp``).

Measurement tool backing ``bench.py``'s ``vs_baseline``: a
reference-class HNSW (m=16, ef_construction=128 —
``/root/reference/helix-cli/src/config.rs:191-201``) built and searched
on this box's CPU, replacing the round<=3 hard-coded 10k-QPS
assumption with a measured number.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LIB: ctypes.CDLL | None = None


def _build() -> Path:
    from helix_tpu.native import _cached, source_key

    src = _HERE / "hnsw_baseline.cpp"
    out = _HERE / "libhxhnsw.so"
    # Compile with -ffast-math (vectorized dot reductions) but link
    # WITHOUT it: linking with fast-math pulls in crtfastmath.o, whose
    # load-time constructor sets FTZ/DAZ in MXCSR *process-wide* —
    # flushing subnormals for every other component (caught by the
    # fastjson float-parse differential test).
    compile_cmd = [
        "g++", "-c", "-O3", "-march=native", "-ffast-math", "-fPIC",
        "-std=c++17", "-o", "", str(src),
    ]
    key = source_key([src], " ".join(compile_cmd) + " | link:plain")
    if _cached(out, key):
        return out
    obj = out.with_suffix(f".tmp{os.getpid()}.o")
    tmp = out.with_suffix(f".tmp{os.getpid()}.so")
    compile_cmd[compile_cmd.index("")] = str(obj)
    try:
        proc = subprocess.run(compile_cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(f"hnsw baseline compile failed:\n{proc.stderr}")
        proc = subprocess.run(
            ["g++", "-shared", "-o", str(tmp), str(obj)],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(f"hnsw baseline link failed:\n{proc.stderr}")
    finally:
        obj.unlink(missing_ok=True)
    os.replace(tmp, out)
    out.with_suffix(out.suffix + ".key").write_text(key)
    return out


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(str(_build()))
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.hxhnsw_create.restype = ctypes.c_void_p
    lib.hxhnsw_create.argtypes = [
        ctypes.c_int, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint,
    ]
    lib.hxhnsw_free.restype = None
    lib.hxhnsw_free.argtypes = [ctypes.c_void_p]
    lib.hxhnsw_size.restype = ctypes.c_int64
    lib.hxhnsw_size.argtypes = [ctypes.c_void_p]
    lib.hxhnsw_add.restype = ctypes.c_int64
    lib.hxhnsw_add.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.hxhnsw_search.restype = None
    lib.hxhnsw_search.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        i64p, f32p,
    ]
    lib.hxhnsw_save.restype = ctypes.c_int
    lib.hxhnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.hxhnsw_load.restype = ctypes.c_void_p
    lib.hxhnsw_load.argtypes = [ctypes.c_char_p]
    _LIB = lib
    return lib


class CpuHnsw:
    """Cosine-metric HNSW over pre-normalized vectors."""

    def __init__(self, handle: int, d: int):
        self._lib = _load()
        self._h = handle
        self.d = d

    @classmethod
    def build(cls, data: np.ndarray, m: int = 16, ef_construction: int = 128,
              seed: int = 12345, progress=None,
              chunk: int = 50_000) -> "CpuHnsw":
        lib = _load()
        data = np.ascontiguousarray(data, np.float32)
        n, d = data.shape
        h = lib.hxhnsw_create(d, n, m, ef_construction, seed)
        f32p = ctypes.POINTER(ctypes.c_float)
        for start in range(0, n, chunk):
            block = data[start:start + chunk]
            lib.hxhnsw_add(
                h, block.ctypes.data_as(f32p), len(block)
            )
            if progress is not None:
                progress(min(start + chunk, n), n)
        return cls(h, d)

    @classmethod
    def load(cls, path: str | Path) -> "CpuHnsw | None":
        lib = _load()
        h = lib.hxhnsw_load(str(path).encode())
        if not h:
            return None
        # dimension is in the file header; re-read it cheaply
        with open(path, "rb") as fh:
            header = np.frombuffer(fh.read(64), np.int64)
        return cls(h, int(header[1]))

    def save(self, path: str | Path) -> None:
        rc = self._lib.hxhnsw_save(self._h, str(path).encode())
        if rc != 0:
            raise RuntimeError(f"hnsw save failed: {path}")

    def __len__(self) -> int:
        return int(self._lib.hxhnsw_size(self._h))

    def search(self, queries: np.ndarray, k: int,
               ef: int) -> tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, np.float32)
        nq = len(queries)
        out_ids = np.empty((nq, k), np.int64)
        out_d = np.empty((nq, k), np.float32)
        self._lib.hxhnsw_search(
            self._h,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nq, k, ef,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out_d, out_ids

    def __del__(self):
        try:
            self._lib.hxhnsw_free(self._h)
        except Exception:
            pass


def measure_baseline(
    data: np.ndarray,
    queries: np.ndarray,
    oracle: np.ndarray,
    cache_dir: str | Path,
    k: int = 10,
    target_recall: float = 0.95,
    allow_build: bool = True,
    log=None,
    cache_tag: str = "",
) -> dict | None:
    """Measure reference-class CPU HNSW QPS at recall@k >= target.

    Builds (or loads from ``cache_dir``) an m=16/efc=128 index over
    ``data``, walks an ef_search ladder to find the cheapest ef meeting
    the recall target against ``oracle`` (brute-force ids for
    ``queries``), and times the search at that ef.  Returns a dict of
    measurements, or None when no cache exists and builds are
    disallowed.
    """
    import time

    def say(msg):
        if log is not None:
            log(msg)

    n, d = data.shape
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    # cache_tag disambiguates corpora sharing a shape (bench.py's and
    # ladder.py's RNG draw orders differ, so their 1M corpora differ)
    tag = f"_{cache_tag}" if cache_tag else ""
    cache = cache_dir / f"hnsw_m16_efc128_{n}x{d}{tag}.bin"
    build_s = None
    index = CpuHnsw.load(cache) if cache.exists() else None
    if index is not None and len(index) != n:
        index = None
    if index is None:
        if not allow_build:
            return None
        say(f"building CPU HNSW baseline over {n}x{d} "
            "(m=16, efc=128; one-time, cached)...")
        t0 = time.perf_counter()
        last = [0.0]

        def progress(done, total):
            now = time.perf_counter()
            if now - last[0] > 30:
                last[0] = now
                say(f"  hnsw build {done}/{total} "
                    f"({now - t0:.0f}s elapsed)")

        index = CpuHnsw.build(data, progress=progress)
        build_s = time.perf_counter() - t0
        index.save(cache)
        say(f"  built in {build_s:.0f}s -> {cache}")

    queries = np.ascontiguousarray(queries, np.float32)
    sample = min(len(queries), len(oracle))
    chosen = None
    for ef in (48, 64, 96, 128, 192, 256, 384, 512, 768):
        _, ids = index.search(queries[:sample], k, ef)
        recall = float(np.mean([
            len(set(ids[i]) & set(oracle[i])) / k for i in range(sample)
        ]))
        say(f"  hnsw ef={ef}: recall@{k}={recall:.4f}")
        chosen = (ef, recall)
        if recall >= target_recall:
            break
    ef, recall = chosen
    # timed run: enough queries for a stable figure on this box
    reps = max(1, 2000 // max(len(queries), 1))
    timed = np.concatenate([queries] * reps, axis=0)
    t0 = time.perf_counter()
    index.search(timed, k, ef)
    dt = time.perf_counter() - t0
    qps = len(timed) / dt
    return {
        "qps": round(qps, 1),
        "recall_at_k": round(recall, 4),
        "ef_search": ef,
        "k": k,
        "n": int(n),
        "d": int(d),
        "m": 16,
        "ef_construction": 128,
        "build_s": round(build_s, 1) if build_s is not None else None,
        "index_cache": str(cache),
        "threads": 1,
    }

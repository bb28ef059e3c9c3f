"""ctypes bindings for the native (C++) host-side segmenter.

The shared library is built on demand from ``sylber_tpu/native/segment.cc``
with the system g++ (no pybind11/pip needed) and cached next to the source.
Used for CPU-only deployments, offline corpus preprocessing (generating the
stage-1 segment ``.npy`` files), and as an independent oracle in tests.
Falls back cleanly: callers should catch ``NativeUnavailable``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List

import numpy as np

_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build(src: Path, out: Path) -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(out), str(src)]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise NativeUnavailable(f"g++ build failed:\n{res.stderr}")


def load_library() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = Path(__file__).parent.parent / "native" / "segment.cc"
        if not src.exists():
            raise NativeUnavailable(f"source not found: {src}")
        cache_dir = Path(os.environ.get(
            "SYLBER_TPU_NATIVE_CACHE",
            Path.home() / ".cache" / "sylber_tpu"))
        cache_dir.mkdir(parents=True, exist_ok=True)
        lib_path = cache_dir / "libsylber_segment.so"
        if (not lib_path.exists()
                or lib_path.stat().st_mtime < src.stat().st_mtime):
            _build(src, lib_path)
        lib = ctypes.CDLL(str(lib_path))
        lib.sylber_segment.restype = ctypes.c_int
        lib.sylber_segment.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_int32)]
        lib.sylber_segment_batch.restype = None
        lib.sylber_segment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        return lib


def segment_native(states: np.ndarray, norm_threshold: float,
                   merge_threshold: float) -> np.ndarray:
    """(L, d) float32 -> (n, 2) int64 segments via the C++ implementation."""
    lib = load_library()
    states = np.ascontiguousarray(states, np.float32)
    L, d = states.shape
    out = np.zeros(((L + 1) * 2,), np.int32)
    n = lib.sylber_segment(
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), L, d,
        norm_threshold, merge_threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out[: 2 * n].reshape(n, 2).astype(np.int64)


def segment_native_batch(states: np.ndarray, norm_threshold: float,
                         merge_threshold: float
                         ) -> List[np.ndarray]:
    lib = load_library()
    states = np.ascontiguousarray(states, np.float32)
    B, L, d = states.shape
    out = np.zeros((B, (L + 1) * 2), np.int32)
    counts = np.zeros((B,), np.int32)
    lib.sylber_segment_batch(
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), B, L, d,
        norm_threshold, merge_threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return [out[b, : 2 * counts[b]].reshape(-1, 2).astype(np.int64)
            for b in range(B)]

"""ctypes bindings for the native (C++) host-side components.

Shared libraries are built on demand from ``sylber_tpu/native/*.cc`` with the
system g++ (no pybind11/pip needed) and cached under ``~/.cache/sylber_tpu``.
Components:

- segmenter (``segment.cc``): CPU-only deployments, offline corpus
  preprocessing (stage-1 segment ``.npy`` generation), independent test
  oracle;
- FLAC decoder (``flac.cc``): fast audio ingestion for the input pipeline
  (LibriSpeech ships as FLAC; no torchaudio/soundfile in this image).

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
_LIBS: dict = {}


class NativeUnavailable(RuntimeError):
    pass


def _build(src: Path, out: Path) -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(out), str(src)]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise NativeUnavailable(f"g++ build failed:\n{res.stderr}")


def _load(name: str) -> ctypes.CDLL:
    """Build (if stale) and dlopen ``native/<name>.cc``."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = Path(__file__).parent.parent / "native" / f"{name}.cc"
        if not src.exists():
            raise NativeUnavailable(f"source not found: {src}")
        cache_dir = Path(os.environ.get(
            "SYLBER_TPU_NATIVE_CACHE",
            Path.home() / ".cache" / "sylber_tpu"))
        cache_dir.mkdir(parents=True, exist_ok=True)
        lib_path = cache_dir / f"libsylber_{name}.so"
        if (not lib_path.exists()
                or lib_path.stat().st_mtime < src.stat().st_mtime):
            _build(src, lib_path)
        lib = ctypes.CDLL(str(lib_path))
        _LIBS[name] = lib
        return lib


def load_library() -> ctypes.CDLL:
    lib = _load("segment")
    if hasattr(lib, "_sylber_bound"):
        return lib
    lib._sylber_bound = True
    lib.sylber_segment.restype = ctypes.c_int
    lib.sylber_segment.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_int32)]
    lib.sylber_segment_batch.restype = None
    lib.sylber_segment_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    return lib


def load_flac_library() -> ctypes.CDLL:
    lib = _load("flac")
    if hasattr(lib, "_sylber_bound"):
        return lib
    lib._sylber_bound = True
    lib.sylber_flac_open.restype = ctypes.c_void_p
    lib.sylber_flac_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.sylber_flac_info.restype = None
    lib.sylber_flac_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64)]
    lib.sylber_flac_read.restype = None
    lib.sylber_flac_read.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int32)]
    lib.sylber_flac_free.restype = None
    lib.sylber_flac_free.argtypes = [ctypes.c_void_p]
    return lib


def decode_flac_native(data: bytes):
    """Decode an in-memory FLAC stream -> ((C, L) int32 PCM, sample_rate,
    bits_per_sample).

    Raises ``NativeUnavailable`` if no toolchain, ``ValueError`` on
    unsupported/corrupt input (callers may fall back to the pure-Python
    decoder, which reports a precise reason).
    """
    lib = load_flac_library()
    h = lib.sylber_flac_open(data, len(data))
    if not h:
        raise ValueError("native FLAC decode failed (unsupported or corrupt)")
    try:
        sr = ctypes.c_int32()
        ch = ctypes.c_int32()
        bps = ctypes.c_int32()
        frames = ctypes.c_int64()
        lib.sylber_flac_info(h, ctypes.byref(sr), ctypes.byref(ch),
                             ctypes.byref(bps), ctypes.byref(frames))
        out = np.zeros(frames.value * ch.value, np.int32)
        lib.sylber_flac_read(
            h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out.reshape(-1, ch.value).T, int(sr.value), int(bps.value)
    finally:
        lib.sylber_flac_free(h)


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

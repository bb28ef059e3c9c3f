"""Audio I/O utilities (no torchaudio dependency).

Replaces the reference's torchaudio load/resample/normalize path
(`/root/reference/sylber/model/sylber.py:83-86`,
`dataset/collective_audio_segment.py:64-66`). Format dispatch is by magic
bytes, not extension:

- RIFF WAV -> scipy.io.wavfile;
- FLAC (LibriSpeech's format) -> the framework's own decoders: the native
  C++ one (`native/flac.cc`) first, the pure-Python one (`utils/flac.py`)
  when no toolchain is present;
- OGG (and anything else) -> libsndfile when available (vendored copies are
  auto-discovered, see `utils/sndfile.py`), else a clear error.

Plus polyphase resampling to 16 kHz via scipy.signal and the reference's
zero-mean / unit-std (unbiased, matching torch.std) normalization.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

TARGET_SR = 16000


def _load_flac(path: str | Path) -> Tuple[np.ndarray, int]:
    # Decoder order is a throughput decision (scripts/ingest_probe.py):
    # libFLAC via libsndfile decodes ~2x faster than the framework's C++
    # decoder (7.1 vs 13.6 ms for a 15-s utterance) and FLAC decode is the
    # dominant per-item cost of host-streamed training ingestion. Output is
    # identical float32 (int16 pcm / 32768 both ways; pinned by
    # tests/unit/test_flac.py). The framework decoders remain the
    # no-dependency fallback and the bit-exactness parity surface.
    from . import sndfile

    if sndfile.available():
        return sndfile.read(path, dtype="float32")
    with open(path, "rb") as f:
        data = f.read()
    try:
        from .native import NativeUnavailable, decode_flac_native

        pcm, sr, bps = decode_flac_native(data)
    except (NativeUnavailable, ValueError):
        from .flac import FlacError, decode_flac

        try:
            pcm, sr, bps = decode_flac(data)
        except FlacError as e:
            raise FlacError(f"{path}: {e}") from e
    return pcm.astype(np.float32) / float(1 << (bps - 1)), sr


def load_wav(path: str | Path) -> Tuple[np.ndarray, int]:
    """Read an audio file -> (float32 (C, L) in [-1, 1], sample_rate).

    Despite the name (kept for API stability) this reads WAV, FLAC and — via
    libsndfile when present — OGG/Vorbis and other formats.
    """
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        return _load_flac(path)
    if magic != b"RIFF":
        # OGG ("OggS") and anything else: delegate to libsndfile if present
        from .sndfile import SndfileUnavailable
        from . import sndfile

        try:
            return sndfile.read(path, dtype="float32")
        except SndfileUnavailable as e:
            raise ValueError(
                f"{path}: unsupported audio container {magic!r} (built-in "
                f"decoders cover WAV and FLAC; libsndfile fallback "
                f"unavailable: {e})") from e
    from scipy.io import wavfile

    sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T  # (C, L)
    return data, int(sr)


def resample(wav: np.ndarray, orig_sr: int, new_sr: int = TARGET_SR) -> np.ndarray:
    if orig_sr == new_sr:
        return wav
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, new_sr)
    return resample_poly(wav, new_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def normalize(wav: np.ndarray) -> np.ndarray:
    """(x - mean) / std with unbiased std (torch default), as the reference's
    inference path does (`sylber.py:86`)."""
    std = wav.std(ddof=1) if wav.size > 1 else 1.0
    return ((wav - wav.mean()) / (std + 1e-12)).astype(np.float32)


def load_for_inference(path: str | Path) -> np.ndarray:
    """Load + resample to 16 kHz + normalize; returns mono (L,) float32."""
    wav, sr = load_wav(path)
    wav = resample(wav, sr)
    wav = normalize(wav)
    return wav[0] if wav.shape[0] >= 1 else wav.reshape(-1)

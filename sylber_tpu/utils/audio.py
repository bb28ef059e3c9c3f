"""Audio I/O utilities (no torchaudio dependency).

Replaces the reference's torchaudio load/resample/normalize path
(`/root/reference/sylber/model/sylber.py:83-86`): WAV reading via stdlib
``wave``/scipy, polyphase resampling to 16 kHz via scipy.signal, and the same
zero-mean / unit-std (unbiased, matching torch.std) normalization.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

TARGET_SR = 16000


def load_wav(path: str | Path) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono-or-multi channel (C, L), sample_rate)."""
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

"""Log-mel spectrogram in JAX (vocoder training loss).

Matches the conventional HiFi-GAN mel configuration (n_fft 1024, hop 256,
win 1024, 80 mels, fmin 0, fmax 8000 at 16 kHz here) with a Slaney-style
mel filterbank built in numpy at trace time (no librosa in this image).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    eps: float = 1e-5


def _hz_to_mel(f):
    # Slaney scale: linear below 1 kHz, log above
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    mel = np.where(log_region,
                   15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                   / (np.log(6.4) / 27.0),
                   mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((m - 15.0) * np.log(6.4) / 27.0),
                 f)
    return f


@lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float) -> np.ndarray:
    """(n_mels, n_fft//2+1) Slaney-normalized triangular filterbank."""
    mels = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz = _mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    fb = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
        fb[i] *= 2.0 / max(hi - lo, 1e-9)  # Slaney area normalization
    return fb.astype(np.float32)


def log_mel(wav: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """(B, L) waveform -> (B, frames, n_mels) log-mel spectrogram."""
    pad = (cfg.n_fft - cfg.hop_length) // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - cfg.n_fft) // cfg.hop_length
    idx = (jnp.arange(n_frames)[:, None] * cfg.hop_length
           + jnp.arange(cfg.n_fft)[None, :])
    frames = x[:, idx]                                   # (B, F, n_fft)
    # center-pad a win_length window to n_fft (torch.stft/librosa semantics)
    assert cfg.win_length <= cfg.n_fft, (cfg.win_length, cfg.n_fft)
    w = np.hanning(cfg.win_length + 1)[:-1].astype(np.float32)
    lpad = (cfg.n_fft - cfg.win_length) // 2
    w = np.pad(w, (lpad, cfg.n_fft - cfg.win_length - lpad))
    win = jnp.asarray(w)
    spec = jnp.abs(jnp.fft.rfft(frames * win, axis=-1))  # magnitude
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                    cfg.fmin, cfg.fmax))
    mel = jnp.einsum("bfk,mk->bfm", spec, fb)
    return jnp.log(jnp.maximum(mel, cfg.eps))

"""Synthetic speech with ground-truth syllable boundaries.

LibriSpeech is not bundled in this image, so end-to-end training proofs and
precision-agreement gates run on generated speech-like audio where the true
syllable segmentation is known analytically. Each utterance is a sequence of
"syllables": a voiced span with a random pitch contour whose harmonics are
shaped by a per-syllable pair of formant resonances drawn from a fixed
discrete bank (a stand-in for phoneme categories, so different syllables have
genuinely different spectral content for the model to separate), under a
raised-cosine amplitude envelope; syllables are separated by short optional
closures and occasional longer inter-word silences.

Average syllable rate is calibrated to ~4.3/s of voiced audio — the
reference's measured token rate (4.27 tok/s, `/root/reference/README.md:5`).

Returns ground truth as 50 Hz frame spans aligned to the model's 320-sample
stride, in the same ``[start, end)`` convention as ``get_segment``
(`/root/reference/sylber/utils/segment_utils.py:72-131`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

SR = 16000
FRAME = 320  # 50 Hz

# fixed "phoneme" bank: (F1, F2) formant pairs, deterministic across runs
_BANK_RNG = np.random.RandomState(20240901)
FORMANT_BANK = np.stack([
    _BANK_RNG.uniform(280, 900, 40),     # F1
    _BANK_RNG.uniform(900, 2800, 40),    # F2
], axis=1)


def _syllable(rng: np.random.RandomState, n: int, f0: float,
              formants: np.ndarray) -> np.ndarray:
    t = np.arange(n) / SR
    # mild pitch declination + jitter
    f0_t = f0 * (1.0 - 0.08 * t / max(t[-1], 1e-6)) \
        * (1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t))
    phase = np.cumsum(2 * np.pi * f0_t / SR)
    x = np.zeros(n)
    max_h = int(3500 / f0)
    for k in range(1, max_h + 1):
        fk = k * f0
        # formant-shaped harmonic amplitude (two resonances, bw ~120 Hz)
        a = sum(1.0 / (1.0 + ((fk - fc) / 120.0) ** 2) for fc in formants)
        a *= 1.0 / k ** 0.5
        x += a * np.sin(k * phase)
    x /= np.abs(x).max() + 1e-9
    # raised-cosine-ish envelope with faster attack than decay
    tau = np.linspace(0, 1, n)
    env = np.sin(np.pi * tau ** 0.8) ** 0.7
    return (x * env).astype(np.float32)


def synth_utterance(
    rng: np.random.RandomState,
    n_samples: int,
    f0_range: Tuple[float, float] = (100.0, 240.0),
    noise_level: float = 0.003,
    return_ids: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate ``n_samples`` of audio.

    Returns ``(wav float32 (n_samples,), segments int64 (K, 2))`` where
    segments are ground-truth ``[start, end)`` voiced spans in 50 Hz frames.
    With ``return_ids`` also returns the per-segment phoneme-bank index
    (K,) — the discrete "syllable identity" drawn from :data:`FORMANT_BANK`,
    used by token-purity evaluations.
    """
    wav = np.zeros(n_samples, np.float32)
    segments = []
    ids = []
    f0_base = rng.uniform(*f0_range)
    pos = rng.randint(0, 3) * FRAME  # small lead-in silence
    while pos < n_samples - 4 * FRAME:
        # syllable length 120-300 ms, snapped to whole frames
        dur_frames = int(rng.uniform(6, 15))
        dur = dur_frames * FRAME
        if pos + dur > n_samples:
            dur = (n_samples - pos) // FRAME * FRAME
            dur_frames = dur // FRAME
            if dur_frames < 4:
                break
        phoneme_id = rng.randint(len(FORMANT_BANK))
        phoneme = FORMANT_BANK[phoneme_id]
        ids.append(phoneme_id)
        f0 = f0_base * rng.uniform(0.85, 1.2)
        amp = rng.uniform(0.5, 1.0)
        wav[pos: pos + dur] = amp * _syllable(rng, dur, f0, phoneme)
        s = pos // FRAME
        segments.append([s, s + dur_frames])
        pos += dur
        # word boundary: 20% chance of a 60-200 ms silence; else a short
        # closure of 0-1 frames
        if rng.rand() < 0.2:
            pos += int(rng.uniform(3, 10)) * FRAME
        else:
            pos += rng.randint(0, 2) * FRAME
    wav += noise_level * rng.randn(n_samples).astype(np.float32)
    segs = (np.array(segments, np.int64) if segments
            else np.zeros((0, 2), np.int64))
    if return_ids:
        return wav, segs, np.asarray(ids, np.int64)
    return wav, segs


def boundary_set(segments: np.ndarray) -> np.ndarray:
    """Unique sorted boundary frames (starts and ends) of a segment list."""
    if len(segments) == 0:
        return np.zeros((0,), np.int64)
    return np.unique(np.concatenate([segments[:, 0], segments[:, 1]]))

"""Evaluation metrics: syllable boundary F1, token rate, RTFx.

The reference reports 4.27 tokens/s (`/root/reference/README.md:5`) but ships
no metric code; these are the framework-native equivalents used by the
benchmark and parity harnesses (BASELINE.json: boundary F1 within 0.5%,
>=200x real-time per chip).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def boundary_f1(pred: np.ndarray, ref: np.ndarray,
                tol_frames: int = 1) -> float:
    """F1 over segment boundaries (both edges), hit if within tol frames."""
    pred = np.unique(np.asarray(pred, np.int64).reshape(-1))
    ref = np.unique(np.asarray(ref, np.int64).reshape(-1))
    if len(pred) == 0 or len(ref) == 0:
        return float(len(pred) == len(ref))
    prec = np.mean([np.abs(ref - b).min() <= tol_frames for b in pred])
    rec = np.mean([np.abs(pred - b).min() <= tol_frames for b in ref])
    return float(2 * prec * rec / max(prec + rec, 1e-9))


def segment_f1(pred: np.ndarray, ref: np.ndarray,
               tol_frames: int = 1) -> float:
    """F1 over whole segments: a predicted [s, e) matches a reference
    segment if both edges are within tol frames."""
    pred = np.asarray(pred, np.int64).reshape(-1, 2)
    ref = np.asarray(ref, np.int64).reshape(-1, 2)
    if len(pred) == 0 or len(ref) == 0:
        return float(len(pred) == len(ref))
    hit = 0
    used = np.zeros(len(ref), bool)
    for s, e in pred:
        d = np.abs(ref - [s, e]).max(axis=1)
        d[used] = tol_frames + 1
        j = int(np.argmin(d))
        if d[j] <= tol_frames:
            hit += 1
            used[j] = True
    prec = hit / len(pred)
    rec = hit / len(ref)
    return float(2 * prec * rec / max(prec + rec, 1e-9))


def token_rate(segments_per_utt: Sequence[np.ndarray],
               seconds_per_utt: Sequence[float]) -> float:
    """Average syllabic tokens per second of audio (reference headline:
    4.27)."""
    total_tokens = sum(len(s) for s in segments_per_utt)
    total_seconds = float(sum(seconds_per_utt))
    return total_tokens / max(total_seconds, 1e-9)


def per_utterance_pitch_modulation(art: np.ndarray, truth: np.ndarray,
                                   min_voiced: int = 20) -> float:
    """Mean per-utterance MEAN-REMOVED Pearson corr of the log-pitch channel
    (12) over voiced frames (truth loudness ch 13 > 0.02) — within-utterance
    pitch-dynamics fidelity, insensitive to register (the pooled pitch corr
    rewards getting each speaker's register right even with flat contours).
    art/truth: (B, L, >=14)."""
    rs = []
    for a, t in zip(art, truth):
        v = t[..., 13] > 0.02
        if v.sum() < min_voiced:
            continue
        x = a[..., 12][v] - a[..., 12][v].mean()
        y = t[..., 12][v] - t[..., 12][v].mean()
        den = np.sqrt((x * x).sum() * (y * y).sum()) + 1e-12
        rs.append(float((x * y).sum() / den))
    return float(np.mean(rs)) if rs else 0.0

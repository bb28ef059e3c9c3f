"""In-graph pitch extraction + per-segment pitch conditioning.

Why this exists: the resynthesis chain conditions the CFM on
segment-averaged encoder features. Measured on the rich corpus
(`scripts/pitch_modulation_ceiling_probe.py`), segment-constant
conditioning could carry per-utterance pitch modulation up to r = 0.93,
but the encoder features only hold ~0.28 of it linearly — the trained CFM
tops out at 0.53. The reference's pitch sub-space
(`/root/reference/sylber/model/quantizer.py:182-257`) draws from the same
segment features, so it shares that information bound. The fix is to
condition on pitch measured FROM THE INPUT AUDIO: a per-segment mean
log-F0 channel appended to the conditioning features
(``SynthesisConfig.explicit_pitch_cond``), optionally quantized into a
discrete pitch token (`flow/quantizer.ScalarPitchQuantizer`) so the
discrete-token chain keeps an explicit pitch stream exactly where the
reference keeps its pitch codebook.

TPU-native design: the F0 tracker is a batched FFT autocorrelation — one
gather to frame the batch, one rFFT/irFFT pair for all frames at once,
and an argmax over the pitch-lag band. Everything here is jittable and
runs fused inside the resynthesis program (no host round-trip), unlike
the per-frame `np.correlate` host loop it mirrors
(`scripts/train_vocoder_proof.py::f0_track_autocorr`, validated against
analytic truth at corr 0.98+).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["frame_f0", "segment_mean_pitch", "fill_segment_values",
           "segment_pitch_cond"]


def frame_f0(wav: jnp.ndarray, sr: int = 16000, frame: int = 1024,
             hop: int = 320, fmin: float = 70.0, fmax: float = 400.0,
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched normalized-autocorrelation F0 tracker.

    wav (B, S) -> (f0 (B, F), strength (B, F)) with
    F = (S - frame) // hop + 1; f0 in Hz (0 where the frame has no
    energy), strength = normalized autocorrelation at the chosen lag
    (the voicing confidence; > 0.4 is the stack's voiced convention).

    Same estimator as the host-side numpy tracker: argmax of the
    zero-mean normalized autocorrelation over the pitch-lag band
    [sr/fmax, sr/fmin]. The autocorrelation is computed for all (B, F)
    frames at once via rFFT at 2*frame points (linear, not circular,
    correlation for lags < frame).
    """
    lmin, lmax = int(sr / fmax), int(sr / fmin)
    B, S = wav.shape
    F = max((S - frame) // hop + 1, 0)
    idx = jnp.arange(F)[:, None] * hop + jnp.arange(frame)[None, :]
    seg = wav[:, idx].astype(jnp.float32)            # (B, F, frame)
    seg = seg - seg.mean(-1, keepdims=True)
    n_fft = 2 * frame
    spec = jnp.fft.rfft(seg, n=n_fft)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft)[..., : lmax + 1]
    ac0 = ac[..., 0]
    norm = ac / jnp.maximum(ac0[..., None], 1e-9)
    lag = lmin + jnp.argmax(norm[..., lmin:], axis=-1)
    strength = jnp.take_along_axis(norm, lag[..., None], axis=-1)[..., 0]
    ok = ac0 > 1e-9
    f0 = jnp.where(ok, sr / lag.astype(jnp.float32), 0.0)
    return f0, jnp.where(ok, strength, 0.0)


def segment_mean_pitch(values: jnp.ndarray, voiced: jnp.ndarray,
                       segments: jnp.ndarray, num_segments: jnp.ndarray,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voiced-mean of a frame-level track over each segment span.

    values/voiced (B, F); segments (B, MS, 2) [start, end) frame spans;
    num_segments (B,). Returns (mean (B, MS), has (B, MS)) where ``has``
    marks segments with at least one voiced frame (mean is 0 otherwise —
    the blank convention of the conditioning stack).
    """
    B, F = values.shape
    t = jnp.arange(F, dtype=jnp.int32)
    s, e = segments[..., 0], segments[..., 1]
    valid = (jnp.arange(segments.shape[1], dtype=jnp.int32)[None]
             < num_segments[:, None])
    cov = ((t[None, None, :] >= s[:, :, None])
           & (t[None, None, :] < e[:, :, None]) & valid[:, :, None])
    w = (cov & voiced[:, None, :]).astype(values.dtype)   # (B, MS, F)
    cnt = w.sum(-1)
    mean = (w * values[:, None, :]).sum(-1) / jnp.maximum(cnt, 1.0)
    has = cnt > 0
    return jnp.where(has, mean, 0.0), has


def fill_segment_values(values: jnp.ndarray, has: jnp.ndarray,
                        segments: jnp.ndarray, num_segments: jnp.ndarray,
                        length: int) -> jnp.ndarray:
    """Scatter per-segment scalars back over their frame spans.

    values/has (B, MS) -> (B, length); zeros outside segments and for
    segments with has=False.
    """
    t = jnp.arange(length, dtype=jnp.int32)
    s, e = segments[..., 0], segments[..., 1]
    valid = (jnp.arange(segments.shape[1], dtype=jnp.int32)[None]
             < num_segments[:, None]) & has
    cov = ((t[None, None, :] >= s[:, :, None])
           & (t[None, None, :] < e[:, :, None]) & valid[:, :, None])
    seg_id = jnp.argmax(cov, axis=1)
    any_cov = cov.any(axis=1)
    filled = jnp.take_along_axis(values, seg_id, axis=1)
    return jnp.where(any_cov, filled, 0.0)


def segment_pitch_cond(wav: jnp.ndarray, segments: jnp.ndarray,
                       num_segments: jnp.ndarray, length: int,
                       pitch_mean: float = 120.0,
                       voiced_threshold: float = 0.4,
                       pitch_quantizer=None) -> jnp.ndarray:
    """wav -> frame-filled per-segment mean log(F0 / pitch_mean) (B, length).

    The fused conditioning helper: track F0 on the (buffered) wav, pool
    the voiced-mean log-pitch over each segment span, optionally pass it
    through a discrete pitch quantizer (``get_indices``/``decode`` on
    (values, has) pairs — see `flow/quantizer.ScalarPitchQuantizer`), and
    fill back over the frame grid. F0 frames (hop 320 = the 50 Hz grid)
    are computed from the same buffered waveform the encoder consumes;
    the ~0.6-frame center offset vs the feature grid is immaterial under
    segment-mean pooling.
    """
    f0, strength = frame_f0(wav)
    voiced = (strength > voiced_threshold) & (f0 > 0)
    logf0 = jnp.where(voiced, jnp.log(jnp.maximum(f0, 1.0) / pitch_mean), 0.0)
    mean, has = segment_mean_pitch(logf0, voiced, segments, num_segments)
    if pitch_quantizer is not None:
        mean, has = pitch_quantizer.decode(
            pitch_quantizer.get_indices(mean, has))
    return fill_segment_values(mean, has, segments, num_segments, length)

"""WavLM-style noise / utterance-mix augmentation as a pure JAX function.

Re-expresses the reference NoiseMixer
(`/root/reference/sylber/utils/noise_utils.py:4-37`) with explicit PRNG keys:
per-item Bernoulli(augment_prob) gate; with prob ``utterance_mix_ratio`` the
"noise" is a batch-shuffled *utterance* ramped by a random left/right linear
shift mask, otherwise the provided DNS noise clip; mix magnitude is uniform
in ``magnitude_range`` (capped at ``utterance_magnitude_max_scale`` for
utterance mixing). Config values: `sylber_configs/sylber_base.yaml:9-14`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseMixerConfig:
    augment_prob: float = 0.2
    utterance_mix_ratio: float = 0.25
    shift_range: tuple = (0.4, 0.7)
    magnitude_range: tuple = (0.05, 0.7)
    utterance_magnitude_max_scale: float = 0.2


def mix_noise(
    rng: jax.Array,
    wav: jnp.ndarray,
    noise: jnp.ndarray,
    cfg: NoiseMixerConfig = NoiseMixerConfig(),
) -> jnp.ndarray:
    """wav, noise: (B, L). Returns augmented wav."""
    B, L = wav.shape
    k = jax.random.split(rng, 7)

    is_aug = (jax.random.uniform(k[0], (B,)) <= cfg.augment_prob).astype(wav.dtype)
    is_utt = (jax.random.uniform(k[1], (B,)) <= cfg.utterance_mix_ratio).astype(
        wav.dtype
    )
    perm = jax.random.permutation(k[2], B)
    shuffled = wav[perm]

    lo, hi = cfg.shift_range
    shift = jax.random.uniform(k[3], (B,)) * (hi - lo) + lo
    ramp = jnp.linspace(0.0, 1.0, L)[None, :]
    left_mask = (ramp > shift[:, None]).astype(wav.dtype)
    right_mask = (ramp[:, ::-1] > shift[:, None]).astype(wav.dtype)
    is_left = (jax.random.uniform(k[4], (B,)) >= 0.5).astype(wav.dtype)[:, None]

    is_utt_c = is_utt[:, None]
    noise = (1 - is_utt_c) * noise + is_utt_c * (
        is_left * left_mask * shuffled + (1 - is_left) * right_mask * shuffled
    )

    mlo, mhi = cfg.magnitude_range
    magnitude = jax.random.uniform(k[5], (B,)) * (mhi - mlo) + mlo
    utt_mag = (
        jax.random.uniform(k[6], (B,))
        * (cfg.utterance_magnitude_max_scale - mlo)
        + mlo
    )
    magnitude = utt_mag * is_utt + (1 - is_utt) * magnitude
    magnitude = is_aug[:, None] * magnitude[:, None]
    return wav + magnitude * noise

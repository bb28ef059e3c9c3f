"""Articulatory decoder: SegmentSynthesis output -> waveform.

The reference demo decodes the 14-dim articulatory trajectory (12 EMA dims +
log-pitch + loudness, 50 Hz) with the external SPARC package's articulatory
HiFi-GAN plus a speaker embedding and speaker pitch statistics
(`/root/reference/demo.ipynb` cell 11:
``coder.decode(ema, exp(pitch) * pitch_mean, loudness, spk_emb)``;
`segment_synthesis.py:143-146` divides the pitch channel by ``pitch_amp``).
This module provides the in-framework equivalent: a :class:`Generator`
conditioned on the 14 articulatory channels and a global speaker embedding,
with the demo's pitch-statistics handling.

Weights: train with :func:`sylber_tpu.vocoder.hifigan.make_vocoder_train_step`
on (articulatory, waveform) pairs, or convert a PyTorch HiFi-GAN generator
checkpoint via :func:`sylber_tpu.io.torch_convert.hifigan_params_from_torch`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hifigan import Generator, HiFiGANConfig


@dataclasses.dataclass(frozen=True)
class SparcDecoderConfig:
    n_ema: int = 12
    spk_emb_dim: int = 64
    generator: HiFiGANConfig = HiFiGANConfig(in_channels=14,
                                             cond_channels=64)


class SparcDecoder:
    """``decoder(art, spk_emb, pitch_mean)`` -> 16 kHz waveform.

    ``art``: (B, T, 14) from `SegmentSynthesis.resynthesize` (pitch channel
    already divided by pitch_amp — i.e. log-pitch in its natural scale);
    ``spk_emb``: (B, spk_emb_dim) speaker embedding;
    ``pitch_mean``: per-speaker mean F0 in Hz (the demo multiplies
    ``exp(pitch)`` by it).
    """

    def __init__(self, config: Optional[SparcDecoderConfig] = None,
                 params: Optional[Any] = None, seed: int = 0):
        self.config = config or SparcDecoderConfig()
        gcfg = self.config.generator
        assert gcfg.in_channels == self.config.n_ema + 2
        assert gcfg.cond_channels == self.config.spk_emb_dim
        self.generator = Generator(gcfg)
        # random-init weights emit noise, not speech — callers (decode_audio)
        # warn when this flag is still set
        self.random_init = params is None
        if params is None:
            feats = jnp.zeros((1, 8, gcfg.in_channels))
            cond = jnp.zeros((1, gcfg.cond_channels))
            params = self.generator.init(
                jax.random.PRNGKey(seed), feats, cond)["params"]
        self.params = params
        self._decode = jax.jit(
            lambda p, f, c: self.generator.apply({"params": p}, f, c))

    def features_from_art(self, art: jnp.ndarray,
                          pitch_mean: float = 120.0) -> jnp.ndarray:
        """Demo-equivalent conditioning: EMA dims pass through; the log-pitch
        channel becomes log(exp(pitch) * pitch_mean / 100) (absolute log-Hz,
        speaker-calibrated); loudness passes through."""
        art = jnp.asarray(art, jnp.float32)
        ema = art[..., : self.config.n_ema]
        pitch_hz = jnp.exp(art[..., self.config.n_ema]) * pitch_mean
        pitch_feat = jnp.log(jnp.maximum(pitch_hz, 1.0) / 100.0)
        loud = art[..., self.config.n_ema + 1]
        return jnp.concatenate(
            [ema, pitch_feat[..., None], loud[..., None]], axis=-1)

    def __call__(self, art, spk_emb, pitch_mean: float = 120.0) -> np.ndarray:
        art = jnp.asarray(art, jnp.float32)
        if art.ndim == 2:
            art = art[None]
        spk_emb = jnp.asarray(spk_emb, jnp.float32)
        if spk_emb.ndim == 1:
            spk_emb = spk_emb[None]
        feats = self.features_from_art(art, pitch_mean)
        wav = self._decode(self.params, feats, spk_emb)
        return np.asarray(wav)

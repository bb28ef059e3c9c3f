"""Trained mini-vocoder fixture gates: audible, pitch-tracking audio-out.

Uses ``tests/fixtures/mini_vocoder.npz`` — the in-framework articulatory
HiFi-GAN generator trained by ``scripts/train_vocoder_proof.py`` on
synthetic (art, wav) pairs. The reference delegates this stage to the
external SPARC package (`/root/reference/README.md:92-94`, demo.ipynb
cell 11); real SPARC weights are network-blocked, so the proof-of-training
runs on the analytic corpus.

Gates: decoded audio beats the recorded random-init baseline on mel-L1 by a
wide margin, has positive spectral correlation with the real waveform, and
`decode_audio` does NOT warn (trained params).
"""

import json
import warnings
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "fixtures"
CKPT = FIXTURES / "mini_vocoder.npz"
META = FIXTURES / "mini_vocoder.json"

pytestmark = pytest.mark.skipif(
    not (CKPT.exists() and META.exists()),
    reason="mini vocoder fixture not built (scripts/train_vocoder_proof.py)")


@pytest.fixture(scope="module")
def vocoder_fixture():
    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.vocoder.hifigan import HiFiGANConfig
    from sylber_tpu.vocoder.sparc import SparcDecoder, SparcDecoderConfig

    meta = json.loads(META.read_text())
    dcfg = SparcDecoderConfig(
        generator=HiFiGANConfig(**meta["generator"]))
    dec = SparcDecoder(dcfg, params=load_params_npz(str(CKPT)))
    return {"dec": dec, "meta": meta}


def test_recorded_eval_beats_random_init(vocoder_fixture):
    """Absolute bars at the r3-verdict targets (F0 >= 0.7, periodicity >=
    0.55, mel-L1 <= 0.45) — met via the NSF harmonic-source generator
    (hifigan.py), which pins output periodicity to the conditioning F0."""
    ev = vocoder_fixture["meta"]["eval"]
    base = vocoder_fixture["meta"]["eval_random_init"]
    assert ev["mel_l1"] < 0.6 * base["mel_l1"], (ev, base)
    assert ev["mel_l1"] < 0.45, ev
    assert ev["spec_corr"] > 0.85, ev
    assert ev["f0_corr"] > 0.7, ev
    assert ev["periodicity"] > 0.55, ev


def test_decoded_audio_tracks_fresh_ground_truth(vocoder_fixture):
    """Decode fresh held-out articulatory tracks and score against the true
    waveform: spectral correlation + mel-L1 improvement vs silence."""
    import jax.numpy as jnp

    from sylber_tpu.data.synthetic import PITCH_MEAN, synth_utterance
    from sylber_tpu.vocoder.mel import MelConfig, log_mel

    dec = vocoder_fixture["dec"]
    rng = np.random.RandomState(90909)
    wavs, arts = [], []
    for _ in range(4):
        wav, _segs, art = synth_utterance(rng, 32000, return_art=True)
        wavs.append(wav)
        arts.append(art)
    wavs = np.stack(wavs)
    arts = np.stack(arts)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fake = dec(arts, np.zeros((4, 64), np.float32), PITCH_MEAN)
    assert not any("random-init" in str(w.message) for w in rec)
    assert fake.shape == wavs.shape

    mel_cfg = MelConfig()
    mel_f = np.asarray(log_mel(jnp.asarray(fake), mel_cfg))
    mel_r = np.asarray(log_mel(jnp.asarray(wavs), mel_cfg))
    mel_s = np.asarray(log_mel(jnp.zeros_like(jnp.asarray(wavs)), mel_cfg))
    a = mel_f - mel_f.mean()
    b = mel_r - mel_r.mean()
    spec_corr = float((a * b).sum()
                      / (np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12))
    assert spec_corr > 0.5, spec_corr
    assert np.abs(mel_f - mel_r).mean() < np.abs(mel_s - mel_r).mean(), \
        "decoded audio no better than silence"


def test_energy_follows_loudness_channel(vocoder_fixture):
    """Scaling the loudness channel down must reduce output energy —
    evidence the generator actually consumes the conditioning."""
    from sylber_tpu.data.synthetic import PITCH_MEAN, synth_utterance

    dec = vocoder_fixture["dec"]
    rng = np.random.RandomState(777)
    _wav, _segs, art = synth_utterance(rng, 16000, return_art=True)
    art = art[None]
    spk = np.zeros((1, 64), np.float32)
    loud = dec(art, spk, PITCH_MEAN)
    art_quiet = art.copy()
    art_quiet[..., 13] *= 0.05
    quiet = dec(art_quiet, spk, PITCH_MEAN)
    assert float((quiet ** 2).mean()) < 0.5 * float((loud ** 2).mean())

"""Synthetic corpus contracts: v1 bit-stability + the rich style's axes.

The v1 corpus underwrites every committed trained fixture (mini encoder,
CFM, vocoder, VQ, codebooks) and the bench gates — its sample stream must
stay bit-identical across refactors. The rich style (multi-speaker,
three-formant 160-phoneme bank, phrase intonation) exists to de-saturate
codebook proofs and make per-utterance pitch modulation learnable
(VERDICT r4 item 5); these tests pin the properties those proofs rely on.
"""

import hashlib

import numpy as np

from sylber_tpu.data.synthetic import (FORMANT_BANK, PITCH_MEAN,
                                       RICH_FORMANT_BANK, SPEAKER_BANK,
                                       synth_utterance)


def test_v1_bitstream_pinned():
    """The exact v1 sample stream, pinned by hash: every committed trained
    fixture was trained/evaluated on this stream."""
    rng = np.random.RandomState(123)
    wav, segs = synth_utterance(rng, 5 * 16000)
    assert hashlib.sha256(wav.tobytes()).hexdigest().startswith("8e1db14b")
    assert len(segs) == 23


def test_v1_is_default_and_explicit_style_matches():
    r1, r2 = np.random.RandomState(7), np.random.RandomState(7)
    w1, s1 = synth_utterance(r1, 3 * 16000)
    w2, s2 = synth_utterance(r2, 3 * 16000, style="v1")
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(s1, s2)


def test_rich_contract_matches_v1_conventions():
    """Same output contract as v1: frame-aligned [start, end) segments,
    14-channel art with zeros in silence and log(f0/PITCH_MEAN) pitch."""
    rng = np.random.RandomState(11)
    wav, segs, ids, art = synth_utterance(rng, 5 * 16000, return_ids=True,
                                          return_art=True, style="rich")
    assert wav.shape == (5 * 16000,) and np.isfinite(wav).all()
    assert art.shape == (250, 14)
    assert len(ids) == len(segs)
    assert (ids < len(RICH_FORMANT_BANK)).all()
    # segments are non-overlapping, increasing, in-range
    assert (segs[:, 1] > segs[:, 0]).all()
    assert (segs[1:, 0] >= segs[:-1, 1]).all()
    # silence frames (outside every segment) are blank in all channels
    in_seg = np.zeros(250, bool)
    for s, e in segs:
        in_seg[s:e] = True
    sil = art[~in_seg]
    assert np.abs(sil[:, :13]).max() == 0.0  # loudness ch13 has floor noise
    # voiced pitch channel decodes to the speaker register range (~85-280 Hz
    # x contour swing)
    voiced = art[:, 13] > 0.02
    f0 = PITCH_MEAN * np.exp(art[voiced, 12])
    assert 50 < f0.min() and f0.max() < 450


def test_rich_spans_speakers_and_phonemes():
    """48 utterances must cover a wide pitch-register range (multiple
    speakers) and well over v1's 40 phoneme classes."""
    rng = np.random.RandomState(3)
    means, all_ids = [], []
    for _ in range(48):
        _, _, ids, art = synth_utterance(rng, 4 * 16000, return_ids=True,
                                         return_art=True, style="rich")
        v = art[:, 13] > 0.02
        means.append(art[v, 12].mean())
        all_ids.extend(ids.tolist())
    assert max(means) - min(means) > 0.6  # >0.6 log-units across registers
    assert len(set(all_ids)) > 100  # phoneme coverage beyond v1's 40
    assert len(SPEAKER_BANK) == 12 and len(FORMANT_BANK) == 40


def test_rich_has_per_utterance_pitch_modulation():
    """Mean-removed within-utterance log-F0 variation must be a real signal
    (v1's per-syllable jitter gives ~0.1 too, but uncorrelated in time; the
    rich contour is smooth — check both magnitude and smoothness)."""
    rng = np.random.RandomState(5)
    stds, smooth = [], []
    for _ in range(16):
        _, _, art = synth_utterance(rng, 5 * 16000, return_art=True,
                                    style="rich")
        v = art[:, 13] > 0.02
        lp = art[v, 12]
        stds.append(lp.std())
        # lag-1 autocorr of the voiced pitch track: contour-driven pitch is
        # smooth (>0.8); pure per-syllable jitter would sit far lower
        d = lp - lp.mean()
        smooth.append((d[1:] * d[:-1]).sum()
                      / max((d * d).sum(), 1e-9))
    assert np.mean(stds) > 0.06
    assert np.mean(smooth) > 0.8


def test_continuum_is_continuous_not_gridded():
    """The continuum style exists so production-scale codebooks (5K-20K
    units) have a true feature continuum to tile: speakers are sampled from
    continuous ranges and every syllable token is a unique perturbed point
    near its phoneme class (scripts/production_codebooks.py). Pin that:
    (a) the v1/rich output contract holds; (b) per-utterance registers do
    NOT collapse onto the 12-row speaker bank; (c) repeated draws of the
    same phoneme class yield distinct articulatory targets."""
    rng = np.random.RandomState(17)
    regs = []
    arts_by_id = {}
    for _ in range(24):
        wav, segs, ids, art = synth_utterance(
            rng, 4 * 16000, return_ids=True, return_art=True,
            style="continuum")
        assert np.isfinite(wav).all() and art.shape[1] == 14
        assert len(ids) == len(segs)
        v = art[:, 13] > 0.02
        regs.append(float(art[v, 12].mean()))
        for (s, e), pid in zip(segs, ids):
            mid = (s + e) // 2
            if art[mid, 13] > 0.02:
                arts_by_id.setdefault(int(pid), []).append(art[mid, :12])
    # continuous registers: 24 utterances give ~24 distinct means, far more
    # than the 12 discrete bank registers could produce
    assert len(np.unique(np.round(regs, 3))) >= 20
    # same phoneme class, different syllables -> distinct art targets
    dists = [float(np.abs(a[0] - a[1]).max())
             for a in arts_by_id.values() if len(a) >= 2]
    assert dists and np.median(dists) > 0.02


def test_continuum_leaves_v1_and_rich_untouched():
    """Adding the style must not shift the v1 or rich RNG sequences."""
    w_v1, _ = synth_utterance(np.random.RandomState(123), 5 * 16000)
    assert hashlib.sha256(w_v1.tobytes()).hexdigest().startswith("8e1db14b")
    r1, r2 = np.random.RandomState(9), np.random.RandomState(9)
    w1, s1 = synth_utterance(r1, 3 * 16000, style="rich")
    w2, s2 = synth_utterance(r2, 3 * 16000, style="rich")
    np.testing.assert_array_equal(w1, w2)

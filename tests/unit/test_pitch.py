"""ops/pitch: in-graph F0 tracker, segment pitch pooling, explicit-pitch
conditioning path, and the scalar pitch-token quantizer.

The batched FFT-autocorrelation tracker must agree with the host-side
numpy tracker it replaces (`scripts/train_vocoder_proof.py:85` — the
per-frame `np.correlate` loop), and the explicit-pitch CFM path must
train and sample end-to-end (rationale: `ops/pitch.py` docstring;
extension past the reference's feature-derived pitch sub-space,
`/root/reference/sylber/model/quantizer.py:182-257`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylber_tpu.flow.quantizer import ScalarPitchQuantizer
from sylber_tpu.ops.pitch import (fill_segment_values, frame_f0,
                                  segment_mean_pitch, segment_pitch_cond)


def _np_f0_autocorr(wav, sr=16000, frame=1024, hop=320, fmin=70.0,
                    fmax=400.0):
    """Host reference tracker (same estimator as train_vocoder_proof.py)."""
    lmin, lmax = int(sr / fmax), int(sr / fmin)
    n_frames = max((len(wav) - frame) // hop + 1, 0)
    f0 = np.zeros(n_frames, np.float32)
    strength = np.zeros(n_frames, np.float32)
    for t in range(n_frames):
        seg = wav[t * hop: t * hop + frame].astype(np.float64)
        seg = seg - seg.mean()
        ac = np.correlate(seg, seg, "full")[frame - 1:]
        if ac[0] <= 1e-9:
            continue
        ac = ac / ac[0]
        lag = lmin + int(np.argmax(ac[lmin: lmax + 1]))
        f0[t] = sr / lag
        strength[t] = ac[lag]
    return f0, strength


def _harmonic(f0_hz, n, sr=16000, harmonics=4):
    t = np.arange(n) / sr
    return sum(np.sin(2 * np.pi * f0_hz * (k + 1) * t) / (k + 1)
               for k in range(harmonics)).astype(np.float32)


def test_frame_f0_matches_numpy_tracker():
    rng = np.random.RandomState(0)
    wavs = []
    for f in (95.0, 150.0, 230.0):
        w = _harmonic(f, 16000) + 0.01 * rng.randn(16000).astype(np.float32)
        wavs.append(w)
    wavs.append(0.02 * rng.randn(16000).astype(np.float32))  # unvoiced
    batch = np.stack(wavs)
    f0_j, s_j = (np.asarray(x) for x in frame_f0(jnp.asarray(batch)))
    for i, w in enumerate(wavs):
        f0_n, s_n = _np_f0_autocorr(w)
        strong = s_n > 0.4
        if i < 3:
            assert strong.mean() > 0.8, (i, strong.mean())
            # identical argmax lag on confident frames (allow rare fp32
            # ties at neighbouring lags: compare in Hz with 3% slack)
            rel = np.abs(f0_j[i][strong] - f0_n[strong]) / f0_n[strong]
            assert np.quantile(rel, 0.95) < 0.03, rel.max()
            np.testing.assert_allclose(s_j[i][strong], s_n[strong],
                                       atol=5e-3)
        else:
            assert (s_j[i] > 0.6).mean() < 0.2  # noise is not periodic


def test_frame_f0_silence_is_zero():
    f0, s = frame_f0(jnp.zeros((1, 8000)))
    assert np.asarray(f0).sum() == 0 and np.asarray(s).sum() == 0


def test_segment_mean_and_fill():
    values = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 0.0, 0.0]])
    voiced = jnp.asarray([[True, True, False, True, True, True, False,
                           False]])
    segments = jnp.asarray([[[0, 3], [3, 6], [6, 8], [0, 0]]])
    num = jnp.asarray([3])
    mean, has = segment_mean_pitch(values, voiced, segments, num)
    np.testing.assert_allclose(np.asarray(mean)[0, :3],
                               [1.5, (4 + 10 + 20) / 3, 0.0])
    assert list(np.asarray(has)[0]) == [True, True, False, False]
    filled = fill_segment_values(mean, has, segments, num, 8)
    np.testing.assert_allclose(
        np.asarray(filled)[0],
        [1.5, 1.5, 1.5, 34 / 3, 34 / 3, 34 / 3, 0.0, 0.0], rtol=1e-6)


def test_scalar_pitch_quantizer_roundtrip():
    q = ScalarPitchQuantizer(n_bins=64)
    v = jnp.asarray(np.linspace(-0.5, 1.15, 33, dtype=np.float32))[None]
    has = jnp.ones_like(v, bool).at[0, 5].set(False)
    idx = q.get_indices(v, has)
    dv, dh = q.decode(idx)
    assert int(np.asarray(idx)[0, 5]) == 0 and not bool(np.asarray(dh)[0, 5])
    err = np.abs(np.asarray(dv - v))[np.asarray(has)]
    assert err.max() <= q.step / 2 + 1e-6, err.max()
    assert q.vocab_size == 65


def test_segment_pitch_cond_recovers_true_pitch():
    """End-to-end: synthetic utterance -> in-graph tracker + segment pool
    vs the analytic per-segment mean log-pitch (truth channel 12)."""
    from sylber_tpu.data.dataset import _zero_mean_unit_var
    from sylber_tpu.data.synthetic import synth_utterance

    rng = np.random.RandomState(3)
    wav, segs, art = synth_utterance(rng, 80000, return_art=True,
                                     style="rich")
    wav = np.concatenate([np.zeros(160, np.float32),
                          _zero_mean_unit_var(wav),
                          np.zeros(160, np.float32)])
    segs = np.asarray(segs)
    MS = len(segs)
    segments = jnp.asarray(segs)[None]
    num = jnp.asarray([MS])
    L = art.shape[0]
    filled = np.asarray(segment_pitch_cond(
        jnp.asarray(wav)[None], segments, num, L)[0])
    # analytic per-segment voiced-mean fill of the truth channel
    truth_fill = np.zeros(L, np.float32)
    for a, b in segs:
        v = art[a:b, 13] > 0.02
        if v.any():
            truth_fill[a:b] = art[a:b, 12][v].mean()
    voiced = truth_fill != 0
    assert voiced.sum() > 50
    x, y = filled[voiced], truth_fill[voiced]
    r = ((x - x.mean()) * (y - y.mean())).sum() / (
        np.sqrt(((x - x.mean()) ** 2).sum() * ((y - y.mean()) ** 2).sum())
        + 1e-12)
    assert r > 0.9, r
    assert np.abs(x - y).mean() < 0.1, np.abs(x - y).mean()


@pytest.fixture(scope="module")
def tiny_pitch_synth():
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.models.voicebox import RegressorConfig
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig

    cfg = SynthesisConfig(
        encoding_layer=2,
        hubert=HubertConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            conv_dim=(16,) * 7,
                            num_conv_pos_embeddings=16,
                            num_conv_pos_embedding_groups=4),
        regressor=RegressorConfig(dim=32, depth=1, dim_head=8, heads=4,
                                  dim_in_proj=8, dim_cond_emb=16),
        input_output_dim=16, input_hidden_dims=(32,),
        explicit_pitch_cond=True)
    return SegmentSynthesis(config=cfg,
                            pitch_quantizer=ScalarPitchQuantizer(32), seed=0)


def test_explicit_pitch_train_step_and_sample(tiny_pitch_synth):
    """Train step consumes batch['pitch_cond']; wav-path resynthesize
    measures pitch in-graph (through the pitch-token quantizer) and runs
    end-to-end."""
    from sylber_tpu.synthesis import (init_synthesis_train_state,
                                      make_synthesis_optimizer,
                                      make_synthesis_train_step)
    from sylber_tpu.train.synthesis_loop import precompute_features

    synth = tiny_pitch_synth
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 16320).astype(np.float32)
    feats, pc = precompute_features(synth.hubert, synth.params.hubert, wav,
                                    0.5, 0.8, batch=2, explicit_pitch=True)
    assert feats.shape[:2] == pc.shape, (feats.shape, pc.shape)
    art = rng.randn(2, feats.shape[1], 14).astype(np.float32)
    opt = make_synthesis_optimizer(lr=1e-3, warmup_steps=1, total_steps=4)
    step = jax.jit(make_synthesis_train_step(synth, opt))
    state = init_synthesis_train_state(synth, opt)
    batch = {"features": feats, "art": jnp.asarray(art),
             "pitch_cond": pc}
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["cfm_loss"]))

    out, segs = synth.resynthesize(input_values=wav, steps=2,
                                   normthreshold=0.5)
    assert out.shape == (2, feats.shape[1], 14)
    assert np.isfinite(out).all()


def test_explicit_pitch_feature_path_requires_pitch_cond(tiny_pitch_synth):
    synth = tiny_pitch_synth
    feats = np.random.RandomState(1).randn(1, 8, 32).astype(np.float32)
    with pytest.raises(AssertionError, match="pitch_cond"):
        synth.resynthesize(features=feats, steps=2)
    out, _ = synth.resynthesize(features=feats, steps=2,
                                pitch_cond=np.zeros((1, 8), np.float32))
    assert np.isfinite(out).all()

"""End-to-end Segmenter tests: API wiring + numerical parity vs torch.

Note on strategy: a *random-init* post-LN HuBERT produces near-constant
hidden states (LayerNorm pins every frame to the same norm), so no threshold
admits numerically robust segmentation decisions on its outputs. Bit-exact
decision parity of the segmentation itself is proven in
tests/unit/test_segment.py on structured inputs; here we verify
(a) the fused Segmenter program equals oracle(encoder(x)) — wiring,
(b) Segmenter's hidden states match the torch reference pipeline — numerics,
(c) batched == single-utterance results.
Full checkpoint parity (BASELINE config #1) is exercised by
scripts/parity_vs_reference.py when a trained `sylber.ckpt` is present.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import HubertConfig as HFConfig
from transformers import HubertModel as HFHubert

import jax.numpy as jnp

from sylber_tpu.api import Segmenter
from sylber_tpu.io.torch_convert import hubert_params_from_torch
from sylber_tpu.ops.segment_np import segment_oracle, pool_segment_features

N_LAYERS = 2


def synth_speech(rng, n=16000):
    """Speech-like synthetic audio: AM-modulated harmonics with pauses."""
    t = np.arange(n) / 16000.0
    f0 = 120 + 30 * np.sin(2 * np.pi * 1.3 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t + rng.rand() * 6.28) / k
              for k in range(1, 6))
    env = np.clip(np.sin(2 * np.pi * 4.27 * t + rng.rand() * 6.28), 0, None)
    gate = (np.sin(2 * np.pi * 0.7 * t + rng.rand() * 6.28) > -0.4).astype(float)
    wav = (sig * env * gate + 0.01 * rng.randn(n)).astype(np.float32)
    wav = (wav - wav.mean()) / wav.std(ddof=1)
    return wav


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf = HFHubert(HFConfig(num_hidden_layers=N_LAYERS)).eval()
    params = hubert_params_from_torch(hf.state_dict(), num_hidden_layers=N_LAYERS)
    seg = Segmenter(params=params, encoding_layer=N_LAYERS)
    return hf, seg


def test_fused_program_equals_oracle_of_own_states(setup):
    """Wiring: Segmenter == segment_oracle(hidden) + mean pooling, bit-exact
    on integer boundaries."""
    _, seg = setup
    rng = np.random.RandomState(0)
    for n in (9000, 16000):
        wav = synth_speech(rng, n)
        out = seg(wav=wav, in_second=False, norm_threshold=1.0,
                  merge_threshold=0.9)
        states = out["hidden_states"]
        want = segment_oracle(states, 1.0, 0.9)
        assert out["segments"].tolist() == want.tolist()
        if len(want):
            np.testing.assert_allclose(
                out["segment_features"], pool_segment_features(states, want),
                atol=2e-4, rtol=1e-4)


def test_hidden_states_match_torch_pipeline(setup):
    """Numerics: Segmenter hidden states == torch HubertModel forward."""
    hf, seg = setup
    rng = np.random.RandomState(1)
    wav = synth_speech(rng, 16000)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav[None])).last_hidden_state[0].numpy()
    out = seg(wav=wav, in_second=False, norm_threshold=1.0, merge_threshold=0.9)
    assert out["hidden_states"].shape == ref.shape
    np.testing.assert_allclose(out["hidden_states"], ref, atol=5e-4, rtol=1e-3)


def test_in_second_scaling(setup):
    _, seg = setup
    rng = np.random.RandomState(7)
    wav = synth_speech(rng)
    a = seg(wav=wav, in_second=False, norm_threshold=1.0, merge_threshold=0.9)
    b = seg(wav=wav, in_second=True, norm_threshold=1.0, merge_threshold=0.9)
    np.testing.assert_allclose(b["segments"], a["segments"] / 50.0)


def test_batch_equals_single(setup):
    _, seg = setup
    rng = np.random.RandomState(3)
    wavs = [synth_speech(rng, n) for n in (9000, 16000, 13000)]
    batch = seg(wav=wavs, in_second=False, norm_threshold=1.0,
                merge_threshold=0.9)
    for i, w in enumerate(wavs):
        single = seg(wav=w, in_second=False, norm_threshold=1.0,
                     merge_threshold=0.9)
        assert batch[i]["segments"].tolist() == single["segments"].tolist()


def test_wav_file_roundtrip(tmp_path, setup):
    """WAV loading path: int16 WAV on disk -> same result as in-memory."""
    _, seg = setup
    from scipy.io import wavfile

    rng = np.random.RandomState(5)
    wav = synth_speech(rng, 12000)
    path = tmp_path / "utt.wav"
    wavfile.write(str(path), 16000, (wav / np.abs(wav).max() * 0.8 * 32767)
                  .astype(np.int16))
    out = seg(wav_file=str(path), in_second=True, norm_threshold=1.0,
              merge_threshold=0.9)
    assert "segments" in out and out["hidden_states"].shape[-1] == 768


def test_pcm16_on_device_normalization(setup):
    """int16 input -> on-device zero-mean/unit-var == host-normalized f32."""
    import jax.numpy as jnp

    _, seg = setup
    rng = np.random.RandomState(11)
    pcm = (synth_speech(rng, 12000) * 3000).astype(np.int16)
    f32 = pcm.astype(np.float32)
    f32 = (f32 - f32.mean()) / np.sqrt(f32.var() + 1e-7)

    mask = jnp.ones((1, len(pcm)), jnp.int32)
    h_pcm, _ = seg._forward_segment(seg.params, jnp.asarray(pcm[None]),
                                    mask, jnp.float32(1.0), jnp.float32(0.9))
    h_f32, _ = seg._forward_segment(seg.params, jnp.asarray(f32[None]),
                                    mask, jnp.float32(1.0), jnp.float32(0.9))
    np.testing.assert_allclose(np.asarray(h_pcm), np.asarray(h_f32),
                               atol=2e-4, rtol=1e-3)


def test_bucketing_bounds_recompiles(setup):
    """Many different lengths within the same bucket reuse one compiled
    program (production serving must not recompile per length)."""
    _, seg = setup
    rng = np.random.RandomState(13)
    seg._forward_segment.clear_cache()
    for n in (14100, 14500, 15000, 15999, 14011):
        seg(wav=synth_speech(rng, n), in_second=False,
            norm_threshold=1.0, merge_threshold=0.9)
    assert seg._forward_segment._cache_size() == 1
    # a second bucket appears for a longer input
    seg(wav=synth_speech(rng, 17000), in_second=False,
        norm_threshold=1.0, merge_threshold=0.9)
    assert seg._forward_segment._cache_size() == 2


def test_ultra_short_input(setup):
    """Sub-frame audio: zero frames, empty segments, no crash."""
    _, seg = setup
    out = seg(wav=np.zeros(100, np.float32), in_second=False,
              norm_threshold=1.0, merge_threshold=0.9)
    assert out["hidden_states"].shape[0] == 0
    assert len(out["segments"]) == 0
    assert len(out["segment_features"]) == 0


def test_oversize_batch_streams_and_matches_per_batch(setup):
    """Inputs larger than the biggest batch bucket must (a) return exactly
    the per-sub-batch results in order and (b) stream — process_async pins
    each sub-batch's (B, L, 768) device outputs until finalized, so a
    corpus-scale call must never dispatch everything before fetching
    (HBM-linear regression caught by review)."""
    _, seg_big = setup
    small = Segmenter(params=seg_big.params, encoding_layer=N_LAYERS,
                      batch_buckets=(1, 2))
    rng = np.random.RandomState(11)
    wavs = [synth_speech(rng, 8000 + 400 * i) for i in range(5)]
    outs = small.process(wavs, in_second=False, norm_threshold=1.0,
                         merge_threshold=0.9, return_hidden=False)
    assert len(outs) == 5
    # reference: the same sub-batches processed separately
    ref = []
    for i in range(0, 5, 2):
        ref.extend(small.process(wavs[i:i + 2], in_second=False,
                                 norm_threshold=1.0, merge_threshold=0.9,
                                 return_hidden=False))
    for a, b in zip(outs, ref):
        np.testing.assert_array_equal(a["segments"], b["segments"])
        np.testing.assert_allclose(a["segment_features"],
                                   b["segment_features"], rtol=1e-6,
                                   atol=1e-6)


def test_speculative_prefix_fetch_identical(setup):
    """The opt-in speculative feature-prefix fetch (serving knob) returns
    byte-identical outputs to the exact sliced fetch — both when the prefix
    covers the batch (fast path) and when it must fall back (tiny K)."""
    _, seg = setup
    rng = np.random.RandomState(3)
    wavs = [synth_speech(rng, 16000), synth_speech(rng, 12000)]

    base = seg.process(wavs, return_hidden=False)
    try:
        seg.speculative_tokens_per_s = 6.0  # prefix covers (K >= max_k)
        spec = seg.process(wavs, return_hidden=False)
        # force the fallback: an absurdly low assumed rate makes K < max_k
        # whenever any utterance has >= 1 segment... use negative margin by
        # monkeying the attr to a tiny value
        seg.speculative_tokens_per_s = 1e-9
        fall = seg.process(wavs, return_hidden=False)
    finally:
        seg.speculative_tokens_per_s = None

    for a, b in zip(base, spec):
        np.testing.assert_array_equal(a["segments"], b["segments"])
        np.testing.assert_array_equal(a["segment_features"],
                                      b["segment_features"])
    for a, b in zip(base, fall):
        np.testing.assert_array_equal(a["segments"], b["segments"])
        np.testing.assert_array_equal(a["segment_features"],
                                      b["segment_features"])

"""FLAC ingestion: built-in decoders vs checked-in fixtures and libFLAC.

The reference reads LibriSpeech (FLAC) through torchaudio
(`/root/reference/sylber/dataset/collective_audio_segment.py:64-66`); this
framework carries its own decoders (pure-Python + native C++). Both must be
bit-exact against real libFLAC encodes; `utils.audio.load_wav` must dispatch
FLAC/OGG transparently so SpeechDataset and segment_corpus work on the
target corpus.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

from sylber_tpu.utils.flac import FlacError, decode_flac, decode_flac_file

FIXTURES = Path(__file__).parent.parent / "fixtures"


def _fixture_pcm():
    sr, pcm = wavfile.read(FIXTURES / "speechlike.wav")
    return pcm.astype(np.int32), sr


def _sndfile_or_skip():
    from sylber_tpu.utils import sndfile

    if not sndfile.available():
        pytest.skip("libsndfile not available in this environment")
    return sndfile


def _synth(rng, n, sr=16000, stereo=False):
    t = np.arange(n) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t)
         * np.clip(np.sin(2 * np.pi * 4 * t), 0, None)
         + 0.05 * np.sin(2 * np.pi * 620 * t) + 0.01 * rng.randn(n))
    pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    if stereo:
        p2 = np.clip(np.roll(x, 7) * 30000, -32768, 32767).astype(np.int16)
        return np.stack([pcm, p2])
    return pcm


# ---------------- checked-in fixture (no encoder needed) ----------------

def test_python_decoder_fixture_bit_exact():
    pcm, sr = _fixture_pcm()
    dec, dsr, bps = decode_flac_file(FIXTURES / "speechlike.flac")
    assert dsr == sr and bps == 16
    assert np.array_equal(dec[0], pcm)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_decoder_fixture_bit_exact():
    from sylber_tpu.utils.native import NativeUnavailable, decode_flac_native

    pcm, sr = _fixture_pcm()
    try:
        dec, dsr, bps = decode_flac_native(
            (FIXTURES / "speechlike.flac").read_bytes())
    except NativeUnavailable as e:
        pytest.skip(str(e))
    assert dsr == sr and bps == 16
    assert np.array_equal(dec[0], pcm)


# ---------------- cross-check vs real libFLAC encodes ----------------

@pytest.mark.parametrize("case", ["mono", "mono_odd", "stereo", "sr44k",
                                  "short", "silence", "constant"])
def test_decoders_vs_libflac(case, tmp_path):
    sndfile = _sndfile_or_skip()
    rng = np.random.RandomState(hash(case) % (2 ** 31))
    sr = 44100 if case == "sr44k" else 16000
    if case == "silence":
        pcm = np.zeros(8000, np.int16)
    elif case == "constant":
        pcm = np.full(5000, -321, np.int16)
    elif case == "short":
        pcm = _synth(rng, 100)
    elif case == "mono_odd":
        pcm = _synth(rng, 16001 + 4096)
    elif case == "stereo":
        pcm = _synth(rng, 24000, stereo=True)
    else:
        pcm = _synth(rng, sr, sr)
    f = tmp_path / f"{case}.flac"
    sndfile.write(f, pcm, sr)
    ref = (pcm[None] if pcm.ndim == 1 else pcm).astype(np.int32)

    dec, dsr, bps = decode_flac_file(f)
    assert dsr == sr and bps == 16 and np.array_equal(dec, ref)

    if shutil.which("g++"):
        from sylber_tpu.utils.native import (NativeUnavailable,
                                             decode_flac_native)
        try:
            dn, nsr, nbps = decode_flac_native(f.read_bytes())
        except NativeUnavailable:
            return
        assert nsr == sr and nbps == 16 and np.array_equal(dn, ref)


def test_corrupt_flac_raises():
    data = (FIXTURES / "speechlike.flac").read_bytes()
    with pytest.raises(FlacError):
        decode_flac(data[:40])  # truncated inside STREAMINFO
    with pytest.raises(FlacError):
        decode_flac(b"RIFF" + data[4:])  # wrong magic
    if shutil.which("g++"):
        from sylber_tpu.utils.native import (NativeUnavailable,
                                             decode_flac_native)
        try:
            with pytest.raises(ValueError):
                decode_flac_native(data[: len(data) // 2])  # truncated frames
        except NativeUnavailable:
            pass


# ---------------- load_wav dispatch ----------------

def test_load_wav_dispatch_flac_equals_wav():
    from sylber_tpu.utils.audio import load_wav

    wav, sr_w = load_wav(FIXTURES / "speechlike.wav")
    flac, sr_f = load_wav(FIXTURES / "speechlike.flac")
    assert sr_w == sr_f
    assert wav.shape == flac.shape
    assert np.array_equal(wav, flac)  # same /32768 scaling, same samples


def test_load_wav_dispatch_ogg():
    from sylber_tpu.utils import sndfile
    from sylber_tpu.utils.audio import load_wav

    if not sndfile.available():
        with pytest.raises(ValueError, match="unsupported audio container"):
            load_wav(FIXTURES / "speechlike.ogg")
        return
    wav, sr_w = load_wav(FIXTURES / "speechlike.wav")
    ogg, sr_o = load_wav(FIXTURES / "speechlike.ogg")
    assert sr_o == sr_w
    # vorbis is lossy: same length scale, correlated content
    assert abs(ogg.shape[1] - wav.shape[1]) < 256
    n = min(ogg.shape[1], wav.shape[1])
    c = np.corrcoef(ogg[0, :n], wav[0, :n])[0, 1]
    assert c > 0.9, c


# ---------------- end-to-end: dataset + corpus ingestion ----------------

def test_speech_dataset_reads_flac_corpus(tmp_path):
    sndfile = _sndfile_or_skip()
    from sylber_tpu.data.dataset import SpeechDataset

    rng = np.random.RandomState(3)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    tags = []
    for i in range(4):
        pcm = _synth(rng, int(rng.uniform(1.0, 2.0) * 16000))
        sndfile.write(wav_dir / f"utt{i}.flac", pcm, 16000)
        tags.append(f"utt{i}")
    ds = SpeechDataset(wav_dirs=[str(wav_dir)], tags=[(1.0, tags)],
                       max_len=16000, seed=0)
    batches = list(ds.batches(2, shuffle=False))
    assert len(batches) == 2
    for b in batches:
        assert b["input_values"].shape[0] == 2
        assert np.isfinite(b["input_values"]).all()
        assert b["attention_mask"].sum() > 0


def test_segmenter_on_flac_file():
    """The public API surface the reference README shows (`segmenter(wav_file=
    'x.flac')`) must work on FLAC directly."""
    import jax.numpy as jnp

    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig

    cfg = HubertConfig(hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4,
                       dtype=jnp.float32, precision="default")
    seg = Segmenter(hubert_config=cfg)
    out_f = seg(wav_file=str(FIXTURES / "speechlike.flac"))
    out_w = seg(wav_file=str(FIXTURES / "speechlike.wav"))
    assert np.array_equal(out_f["segments"], out_w["segments"])
    np.testing.assert_allclose(out_f["segment_features"],
                               out_w["segment_features"], rtol=0, atol=0)


def test_load_wav_sndfile_dispatch_matches_own_decoder(tmp_path):
    """load_wav prefers libsndfile for FLAC (2x faster decode — the
    ingestion hot path, scripts/ingest_probe.py); its float32 output must
    be bit-identical to the framework decoder's pcm / 2^(bps-1) scaling."""
    sndfile = _sndfile_or_skip()
    from sylber_tpu.utils.audio import load_wav
    from sylber_tpu.utils.flac import decode_flac_file

    rng = np.random.RandomState(99)
    pcm = _synth(rng, 20000)
    f = tmp_path / "x.flac"
    sndfile.write(f, pcm, 16000)

    via_dispatch, sr = load_wav(f)
    own, osr, bps = decode_flac_file(f)
    assert sr == osr == 16000 and bps == 16
    np.testing.assert_array_equal(
        via_dispatch, own.astype(np.float32) / float(1 << (bps - 1)))

"""Rich-corpus trained fixture gates (multi-speaker + phrase intonation).

The r4 verdict's corpus-saturation item: the v1 synthetic corpus caps at
~265 distinct segment clusters and near-flat per-utterance pitch, which
made production-shaped codebooks ungateable and pitch-correlation gates
seed-sensitive. The rich corpus (``data/synthetic.py`` ``style="rich"``:
12 speakers, 160 phoneme classes, phrase-level intonation contours) fixes
both; these gates pin the trained proofs on it:

- ``mini_ckpt_rich.*``      — stage-1+2 encoder (scripts/train_mini_proof.py
  --style rich, 4000+1500 steps): recorded boundary F1 + live fast-vs-exact
  agreement on rich audio.
- ``mini_synth_rich.*``     — CFM resynthesis stack
  (train_synthesis.py --config configs/sylber_resynthesis_rich_mini.yaml):
  recorded pitch/loudness tracking on a 48-utt eval (the v1 6-utt evals
  swung 0.62-0.94 across seeds; 48 utts de-risks the gate).
- ``mini_vocoder_rich.*``   — NSF HiFi-GAN (scripts/train_vocoder_proof.py
  --style rich, 8000 steps): recorded mel/F0/periodicity + live decode.

Reference points: multi-speaker training corpus (`/root/reference/
sylber_configs/sylber_base.yaml` LibriSpeech) and the 5K/10K/20K-unit
results (`/root/reference/docs/index.html`) both presuppose a corpus with
real speaker/prosody variety — this is its offline stand-in.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "fixtures"


def _skip_unless(*names):
    missing = [n for n in names if not (FIXTURES / n).exists()]
    return pytest.mark.skipif(
        bool(missing), reason=f"rich fixture(s) not built: {missing}")


# ---------------------------------------------------------------------------
# encoder (mini_ckpt_rich)
# ---------------------------------------------------------------------------

enc_skip = _skip_unless("mini_ckpt_rich.npz", "mini_ckpt_rich.json")


@pytest.fixture(scope="module")
def rich_enc():
    import jax.numpy as jnp

    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.models.hubert import HubertConfig

    meta = json.loads((FIXTURES / "mini_ckpt_rich.json").read_text())
    params = load_params_npz(str(FIXTURES / "mini_ckpt_rich.npz"))
    hub = {k: tuple(v) if isinstance(v, list) else v
           for k, v in meta["hubert"].items()}

    def config(dtype="float32", frontend_dtype="float32",
               precision="highest"):
        return HubertConfig(num_hidden_layers=meta["encoding_layer"],
                            dtype=jnp.dtype(dtype),
                            frontend_dtype=jnp.dtype(frontend_dtype),
                            precision=precision, **hub)

    return {"params": params, "meta": meta, "config": config}


@enc_skip
def test_rich_encoder_recorded_eval(rich_enc):
    ev = rich_enc["meta"]["eval"]
    assert ev["boundary_f1_vs_truth_tol2"] >= 0.85, ev
    assert ev["fast_vs_exact_boundary_f1_tol0"] >= 0.995, ev
    # syllable token rate within the truth's order (reference 4.27 tok/s)
    assert 0.6 * ev["token_rate_truth"] <= ev["token_rate_exact"] \
        <= 1.35 * ev["token_rate_truth"], ev


@enc_skip
def test_rich_encoder_segments_rich_audio_live(rich_enc):
    """Live: learned segmentation recovers analytic boundaries on fresh
    rich-style audio (different speakers than any fixed seed)."""
    from sylber_tpu.api import Segmenter
    from sylber_tpu.data.synthetic import synth_utterance
    from sylber_tpu.utils.metrics import boundary_f1

    rng = np.random.RandomState(555001)
    wavs, truths = [], []
    for _ in range(6):
        n = int(rng.uniform(3.0, 6.0) * 16000)
        wav, segs = synth_utterance(rng, n, style="rich")
        wavs.append((wav - wav.mean()) / (wav.std(ddof=1) + 1e-12))
        truths.append(segs)
    seg = Segmenter(params=rich_enc["params"],
                    hubert_config=rich_enc["config"](),
                    norm_threshold=rich_enc["meta"]["norm_threshold"],
                    merge_threshold=rich_enc["meta"]["merge_threshold"])
    outs = seg.process(wavs, in_second=False, return_hidden=False)
    f1 = np.mean([boundary_f1(o["segments"], t, tol_frames=2)
                  for o, t in zip(outs, truths)])
    assert f1 >= 0.80, f1


# ---------------------------------------------------------------------------
# CFM resynthesis (mini_synth_rich)
# ---------------------------------------------------------------------------

synth_skip = _skip_unless("mini_synth_rich.npz", "mini_synth_rich.json",
                          "mini_ckpt.npz")


@pytest.fixture(scope="module")
def rich_synth():
    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisParams
    from sylber_tpu.train.synthesis_loop import synthesis_config_from_dict

    meta = json.loads((FIXTURES / "mini_synth_rich.json").read_text())
    model_cfg = meta["config"]["model"]
    sc = synthesis_config_from_dict(model_cfg)
    trained = load_params_npz(str(FIXTURES / "mini_synth_rich.npz"))
    enc = load_params_npz(str(FIXTURES / "mini_ckpt.npz"))
    synth = SegmentSynthesis(config=sc, params=SynthesisParams(
        enc, trained["input_mlp"], trained["regressor"]))
    return {"synth": synth, "meta": meta,
            "norm_thr": float(model_cfg["norm_threshold"])}


@synth_skip
def test_rich_cfm_recorded_eval(rich_synth):
    """48-utt held-out eval recorded at fixture-build time: the rich CFM
    must track pitch ACROSS speakers (wide F0 range) and loudness."""
    ev = rich_synth["meta"]["eval"]
    assert ev["n_eval_utts"] >= 48, ev
    assert ev["pitch_corr"] > 0.8, ev
    assert ev["loud_corr"] > 0.6, ev


@synth_skip
def test_rich_cfm_tracks_fresh_heldout(rich_synth):
    """Fresh rich utterances, fresh sampling: contours track, L1s within
    1.5x the recorded eval."""
    from sylber_tpu.train.synthesis_loop import (
        build_synthesis_corpus, evaluate_synthesis, precompute_features)

    synth = rich_synth["synth"]
    corpus = build_synthesis_corpus(6, 5.0, seed=616161, style="rich")
    feats = precompute_features(synth.hubert, synth.params.hubert,
                                corpus["wav"], rich_synth["norm_thr"],
                                0.8, batch=6)
    m = evaluate_synthesis(synth, feats, corpus["art"], steps=20, seed=5)
    rec = rich_synth["meta"]["eval"]
    assert m["pitch_corr"] > 0.5, m
    assert m["loud_corr"] > 0.5, m
    assert m["pitch_l1_voiced"] < 1.5 * rec["pitch_l1_voiced"], (m, rec)
    assert m["loud_l1"] < 1.5 * rec["loud_l1"], (m, rec)


# ---------------------------------------------------------------------------
# vocoder (mini_vocoder_rich)
# ---------------------------------------------------------------------------

voc_skip = _skip_unless("mini_vocoder_rich.npz", "mini_vocoder_rich.json")


@pytest.fixture(scope="module")
def rich_vocoder():
    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.vocoder.hifigan import HiFiGANConfig
    from sylber_tpu.vocoder.sparc import SparcDecoder, SparcDecoderConfig

    meta = json.loads((FIXTURES / "mini_vocoder_rich.json").read_text())
    dcfg = SparcDecoderConfig(generator=HiFiGANConfig(**meta["generator"]))
    dec = SparcDecoder(dcfg, params=load_params_npz(
        str(FIXTURES / "mini_vocoder_rich.npz")))
    return {"dec": dec, "meta": meta}


@voc_skip
def test_rich_vocoder_recorded_eval(rich_vocoder):
    """NSF harmonic source pins F0 even across the rich corpus' 12-speaker
    register range; mel-L1 bar is looser than v1's (multi-speaker spectra
    are harder: recorded 0.60 vs 0.39 single-speaker)."""
    ev = rich_vocoder["meta"]["eval"]
    base = rich_vocoder["meta"]["eval_random_init"]
    assert ev["mel_l1"] < 0.6 * base["mel_l1"], (ev, base)
    assert ev["spec_corr"] > 0.85, ev
    assert ev["f0_corr"] > 0.9, ev
    assert ev["periodicity"] > 0.55, ev


@voc_skip
def test_rich_vocoder_decodes_fresh_truth(rich_vocoder):
    """Decode fresh rich articulatory tracks: spectrally correlated with
    the true waveform, better than silence."""
    import jax.numpy as jnp

    from sylber_tpu.data.synthetic import synth_utterance
    from sylber_tpu.vocoder.mel import MelConfig, log_mel

    dec = rich_vocoder["dec"]
    rng = np.random.RandomState(444111)
    wavs, arts = [], []
    for _ in range(4):
        wav, _segs, art = synth_utterance(rng, 32000, return_art=True,
                                          style="rich")
        wavs.append(wav)
        arts.append(art)
    wavs, arts = np.stack(wavs), np.stack(arts)
    spk = np.zeros((4, rich_vocoder["dec"].config.generator.cond_channels),
                   np.float32)
    fake = dec(arts, spk, rich_vocoder["meta"]["pitch_mean"])
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
    assert np.abs(mel_f - mel_r).mean() < np.abs(mel_s - mel_r).mean()

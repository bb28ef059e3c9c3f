"""Rich-corpus discrete-token chain gates, incl. per-utterance F0 modulation.

``tests/fixtures/token_chain_rich.json`` is produced by
``scripts/token_chain_proof.py --style rich`` on the rich-corpus trained
fixtures (mini_synth_rich CFM + mini_vocoder_rich NSF vocoder over the
frozen v1 mini encoder): k-means codebooks up to 4096 units fit on ~17k
pooled segment features from a 1024-utt corpus, then the FULL chain
(wav -> segment -> tokenize -> decode -> CFM -> vocoder) per codebook size.

New vs the v1 chain gates (test_token_resynthesis.py):

1. **Per-utterance pitch-MODULATION gates** (VERDICT r4 item 4): the
   vocoder leg scores mean-removed autocorrelation-F0 corr of the chain
   AUDIO against the real waveform per utterance — within-utterance pitch
   dynamics, not register. The v1 corpus was near-flat per utterance
   (chain ~0.13-0.15, ungated); the rich corpus has phrase intonation, so
   modulation is gateable: true-art (vocoder ceiling), feature-conditioned,
   and token-conditioned legs each get a floor.
2. **Codebook-saturation break** (VERDICT r4 item 5): the v1 corpus capped
   every codebook at ~265 distinct clusters; the rich corpus (12 speakers x
   160 phonemes x intonation) must push km1024 far above that and make the
   production-shaped km4096 fit meaningful (reference's 5K-unit variant,
   `/root/reference/docs/index.html`).

Reference: quantizers `/root/reference/sylber/model/quantizer.py:86-175`,
pitch_amp handling `segment_synthesis.py:143-146`.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "fixtures"
CHAIN = FIXTURES / "token_chain_rich.json"

pytestmark = pytest.mark.skipif(
    not CHAIN.exists(),
    reason="rich token chain fixture not built "
           "(scripts/token_chain_proof.py --style rich)")


@pytest.fixture(scope="module")
def table():
    return json.loads(CHAIN.read_text())


def test_continuous_chain_quality(table):
    f = table["table"]["features"]
    assert f["pitch_corr"] > 0.8, f
    assert f["loud_corr"] > 0.6, f


def test_tokens_cost_bounded_degradation(table):
    t = table["table"]
    f = t["features"]
    for key in [k for k in t if k.startswith("km") and int(k[2:]) >= 256]:
        m = t[key]
        assert m["pitch_corr"] > f["pitch_corr"] - 0.08, (key, m)
        assert m["loud_corr"] > f["loud_corr"] - 0.05, (key, m)
        assert m["pitch_l1_voiced"] < f["pitch_l1_voiced"] + 0.04, (key, m)
    for key in [k for k in t if k.startswith("km")]:
        m = t[key]
        assert m["pitch_corr"] > 0.6, (key, m)
        assert m["loud_corr"] > 0.55, (key, m)


def test_codebook_saturation_broken(table):
    """km1024 uses EVERY code (v1 corpus plateaued at ~265 of 1024);
    km4096 pushes coverage beyond km1024 (measured 1104 distinct codes on
    13.7k pooled segment features — a meaningful production-shaped fit,
    not an over-parameterized no-op)."""
    usages = {int(k[2:]): m["codebook_usage"]
              for k, m in table["table"].items() if k.startswith("km")}
    assert usages[64] == 64, usages
    assert usages[256] == 256, usages
    assert usages[1024] >= 900, usages
    assert usages[4096] > usages[1024], usages


def test_per_utt_pitch_modulation_gates(table):
    """Per-utterance mean-removed pitch-modulation fidelity (VERDICT r4
    item 4), measured at two levels:

    - ``pitch_mod_r``: the CFM's articulatory pitch channel vs truth —
      the model metric (feature-conditioned >= 0.5 per the verdict target;
      measured 0.533, and 0.51-0.535 through production codebooks).
    - ``vocoder.f0_corr``: autocorrelation-F0 of the generated AUDIO vs
      the real waveform — the full-chain metric, which stacks the CFM,
      the vocoder, and two F0-tracker passes (ceiling: true-art through
      the same vocoder+tracker scores 0.987; feature-conditioned measured
      0.486, tokens 0.45-0.49 — the v1 corpus' ungated value was 0.13).
    """
    t = table["table"]
    assert t["true_art"]["vocoder"]["f0_corr"] >= 0.9, t["true_art"]
    assert t["features"]["pitch_mod_r"] >= 0.5, t["features"]
    assert t["features"]["vocoder"]["f0_corr"] >= 0.4, t["features"]
    for key in [k for k in t if k.startswith("km") and int(k[2:]) >= 256]:
        assert t[key]["pitch_mod_r"] >= 0.45, (key, t[key])
        assert t[key]["vocoder"]["f0_corr"] >= 0.4, (key, t[key])


def test_rich_codebooks_checked_in(table):
    for K, fname in table["codebooks"].items():
        p = FIXTURES / fname
        assert p.exists(), p
        assert np.load(p).shape[0] == int(K)


# ---------------------------------------------------------------------------
# rich trained grouped-residual VQ (jointly trained with the CFM)
# ---------------------------------------------------------------------------

VQ_CKPT = FIXTURES / "mini_vq_synth_rich.npz"
VQ_TOK = FIXTURES / "mini_vq_tokenizer_rich.npz"
VQ_META = FIXTURES / "mini_vq_synth_rich.json"
ENC = FIXTURES / "mini_ckpt.npz"

_vq_skip = pytest.mark.skipif(
    not (VQ_CKPT.exists() and VQ_TOK.exists() and VQ_META.exists()
         and ENC.exists()),
    reason="rich trained VQ fixture not built (train_synthesis.py --tokens "
           "--config configs/sylber_resynthesis_tokens_rich_mini.yaml "
           "--fixture-dir tests/fixtures --fixture-prefix "
           "mini_vq_synth_rich)")


@pytest.fixture(scope="module")
def rich_vq():
    from sylber_tpu.flow.quantizer import (GroupedResidualVQConfig,
                                           QuantizerConfig)
    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisParams
    from sylber_tpu.train.synthesis_loop import synthesis_config_from_dict
    from sylber_tpu.train.vq_synthesis import TrainedVQTokenizer

    meta = json.loads(VQ_META.read_text())
    qd = meta["quantizer_config"]
    qcfg = QuantizerConfig(
        input_dim=qd["input_dim"], output_dim=qd["output_dim"],
        hidden_dims=tuple(qd["hidden_dims"]),
        pitch_emb_dim=qd["pitch_emb_dim"],
        art_vq=GroupedResidualVQConfig(**qd["art_vq"]),
        pitch_vq=GroupedResidualVQConfig(**qd["pitch_vq"]),
        unit_norm_encoder_input=qd["unit_norm_encoder_input"],
        unit_norm_encoder_output=qd["unit_norm_encoder_output"],
        keep_blank_zero=qd["keep_blank_zero"],
        separate_norm=qd["separate_norm"])
    tok = TrainedVQTokenizer.load_npz(str(VQ_TOK), qcfg)
    model_cfg = meta["config"]["model"]
    sc = synthesis_config_from_dict(model_cfg)
    trained = load_params_npz(str(VQ_CKPT))
    enc = load_params_npz(str(ENC))
    synth = SegmentSynthesis(config=sc, quantizer=tok)
    synth.params = SynthesisParams(enc, trained["input_mlp"],
                                   trained["regressor"])
    return {"synth": synth, "tok": tok, "meta": meta,
            "norm_thr": float(model_cfg["norm_threshold"])}


@_vq_skip
def test_rich_vq_recorded_eval(rich_vq):
    """48-utt recorded eval of the jointly-trained 512-art + 64-pitch VQ
    (reference Quantizer's art/pitch split scaled to the rich corpus):
    pitch at parity with the continuous chain (measured 0.908 vs 0.916)."""
    ev = rich_vq["meta"]["eval"]
    assert ev["n_eval_utts"] >= 48, ev
    assert ev["pitch_corr"] > 0.7, ev
    assert ev["loud_corr"] > 0.6, ev
    assert ev["pitch_l1_voiced"] < 0.2, ev


@_vq_skip
def test_rich_vq_chain_live_on_heldout(rich_vq):
    """The trained VQ tokenizer drives SegmentSynthesis live on fresh rich
    audio: wav -> segment -> VQ encode/quantize/decode -> CFM."""
    from sylber_tpu.train.synthesis_loop import (_pearson,
                                                 build_synthesis_corpus)

    synth = rich_vq["synth"]
    corpus = build_synthesis_corpus(4, 5.0, seed=888111, style="rich")
    art, _ = synth.resynthesize(input_values=corpus["wav"], steps=16, seed=3,
                                normthreshold=rich_vq["norm_thr"],
                                merge_threshold=0.8)
    truth = np.asarray(corpus["art"], np.float32)
    L = min(art.shape[1], truth.shape[1])
    art, truth = art[:, :L], truth[:, :L]
    assert np.isfinite(art).all()
    loud_r = _pearson(art[..., 13].ravel(), truth[..., 13].ravel())
    assert loud_r > 0.5, loud_r
    voiced = truth[..., 13] > 0.02
    pitch_r = _pearson(art[..., 12][voiced], truth[..., 12][voiced])
    assert pitch_r > 0.4, pitch_r


@_vq_skip
def test_rich_vq_uses_both_subspaces(rich_vq):
    """Art and pitch codebooks are both non-degenerate on rich features:
    many distinct codes in use (the r4 collapse mode was ONE pitch code
    winning every assignment)."""
    import jax.numpy as jnp

    tok = rich_vq["tok"]
    rng = np.random.RandomState(0)
    # probe the tokenizer on unit-scale feature-like inputs spanning the
    # corpus: use the checked-in km256 rich centroids as realistic probes
    probes = np.load(FIXTURES / "mini_codebook_rich_256.npy").astype(
        np.float32)
    ids = np.asarray(tok.get_indices(jnp.asarray(probes[None])))[0]
    art_used = len(np.unique(ids[:, 0]))
    pitch_used = len(np.unique(ids[:, 1]))
    assert art_used > 64, art_used
    assert pitch_used > 8, pitch_used

"""Explicit-pitch conditioning gates: trained fixture + discrete pitch-token
chain.

Background (measured, `scripts/pitch_modulation_ceiling_probe.py`):
segment-constant conditioning can carry per-utterance pitch modulation up
to r = 0.93, but segment-averaged encoder features hold only ~0.28 of it
linearly — the feature-only CFM tops out at pitch_mod_r 0.533, and the
reference's pitch sub-space (`/root/reference/sylber/model/quantizer.py:
182-257`) draws from the same features, so it shares that bound. The
explicit-pitch mode (`SynthesisConfig.explicit_pitch_cond` + `ops/pitch.py`
in-graph F0 tracker) conditions on per-segment mean log-F0 measured from
the input audio instead, and `flow/quantizer.ScalarPitchQuantizer`
discretizes that channel so the TOKEN chain keeps an explicit pitch stream
exactly where the reference keeps its pitch codebook.

Fixtures:
- ``mini_synth_rich_pitch.*`` — trained by `train_synthesis.py --config
  configs/sylber_resynthesis_rich_pitch_mini.yaml` (18k steps, rich corpus,
  48-utt held-out eval). Measured: pitch_corr 0.981 (vs 0.916 feature-only),
  pitch_mod_r 0.888 (vs 0.533), pitch_l1_voiced 0.028 (vs ~0.1).
- ``token_chain_rich_pitch.json`` — `scripts/pitch_chain_proof.py`: the
  fully discrete chain (km1024 art tokens + 64-bin scalar pitch tokens)
  vs continuous-pitch and true-art-vocoder ceilings.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "fixtures"
CKPT = FIXTURES / "mini_synth_rich_pitch.npz"
META = FIXTURES / "mini_synth_rich_pitch.json"
CHAIN = FIXTURES / "token_chain_rich_pitch.json"

fixture_skip = pytest.mark.skipif(
    not (CKPT.exists() and META.exists()),
    reason="explicit-pitch CFM fixture not built (train_synthesis.py "
           "--config configs/sylber_resynthesis_rich_pitch_mini.yaml "
           "--fixture-dir tests/fixtures --fixture-prefix "
           "mini_synth_rich_pitch)")
chain_skip = pytest.mark.skipif(
    not CHAIN.exists(),
    reason="explicit-pitch chain fixture not built "
           "(scripts/pitch_chain_proof.py)")


@fixture_skip
def test_pitch_fixture_recorded_eval():
    """The explicit-pitch CFM must beat the feature-only information bound:
    pitch_mod_r >= 0.8 (feature-only ceiling is 0.533; measured 0.888) and
    near-exact absolute pitch (measured 0.981 / L1 0.028)."""
    ev = json.loads(META.read_text())["eval"]
    assert ev["n_eval_utts"] >= 48, ev
    assert ev["pitch_corr"] > 0.9, ev
    assert ev["pitch_mod_r"] >= 0.8, ev
    assert ev["pitch_l1_voiced"] < 0.08, ev
    assert ev["loud_corr"] > 0.6, ev


@fixture_skip
def test_pitch_fixture_config_is_explicit_pitch():
    meta = json.loads(META.read_text())
    assert meta["config"]["model"]["explicit_pitch_cond"] is True
    for name in ("input_mlp", "regressor"):
        assert any(k.startswith(name) for k in
                   np.load(CKPT).files), (name, np.load(CKPT).files[:5])


@fixture_skip
def test_pitch_fixture_live_wav_path():
    """Live end-to-end on fresh rich audio through the wav path: the
    in-graph F0 tracker + segment pooling + CFM must track per-utterance
    pitch far above the feature-only bound, with pitch tokens attached."""
    import yaml

    from sylber_tpu.flow.quantizer import ScalarPitchQuantizer
    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisParams
    from sylber_tpu.train.synthesis_loop import (build_synthesis_corpus,
                                                 synthesis_config_from_dict)
    from sylber_tpu.utils.metrics import per_utterance_pitch_modulation

    root = FIXTURES.parent.parent
    cfg = yaml.safe_load(
        open(root / "configs" / "sylber_resynthesis_rich_pitch_mini.yaml"))
    sc = synthesis_config_from_dict(dict(cfg["model"]))
    synth = SegmentSynthesis(
        config=sc, pitch_quantizer=ScalarPitchQuantizer(64))
    enc = load_params_npz(str(FIXTURES / "mini_ckpt.npz"))
    cfm = load_params_npz(str(CKPT))
    synth.params = SynthesisParams(enc, cfm["input_mlp"], cfm["regressor"])
    meta = json.loads((FIXTURES / "mini_ckpt.json").read_text())

    corpus = build_synthesis_corpus(4, 5.0, seed=888222, style="rich")
    art, _ = synth.resynthesize(
        input_values=corpus["wav"], steps=16, seed=3,
        normthreshold=float(meta["norm_threshold"]),
        merge_threshold=float(meta["merge_threshold"]))
    truth = np.asarray(corpus["art"], np.float32)
    L = min(art.shape[1], truth.shape[1])
    art, truth = art[:, :L], truth[:, :L]
    assert np.isfinite(art).all()
    mod = per_utterance_pitch_modulation(art, truth)
    assert mod > 0.6, mod
    voiced = truth[..., 13] > 0.02
    l1 = float(np.abs(art[..., 12][voiced] - truth[..., 12][voiced]).mean())
    assert l1 < 0.12, l1


# ---------------------------------------------------------------------------
# discrete chain (km1024 art tokens + 64-bin pitch tokens)
# ---------------------------------------------------------------------------


@chain_skip
def test_pitch_chain_table():
    t = json.loads(CHAIN.read_text())["table"]
    # vocoder ceiling sanity (same gate as the rich chain)
    assert t["true_art"]["vocoder"]["f0_corr"] >= 0.9, t["true_art"]
    # continuous-pitch chain: the wav path reproduces the recorded eval
    assert t["features"]["pitch_mod_r"] >= 0.8, t["features"]
    assert t["features"]["pitch_corr"] >= 0.9, t["features"]
    # art tokens must not break the pitch channel (pitch rides its own
    # channel, so km quantization of the 144-d features barely touches it)
    assert t["km1024"]["pitch_mod_r"] >= 0.75, t["km1024"]
    # the FULLY discrete chain (art + pitch tokens): 64 log-spaced bins
    # cover 70-400 Hz at ~2.8%/bin granularity — modulation must survive
    p = [k for k in t if k.startswith("km1024+p")]
    assert p, list(t)
    assert t[p[0]]["pitch_mod_r"] >= 0.75, t[p[0]]
    assert t[p[0]]["pitch_l1_voiced"] < 0.08, t[p[0]]
    # chain AUDIO per-utt F0: must beat the feature-only chain's 0.486
    assert t[p[0]]["vocoder"]["f0_corr"] >= 0.6, t[p[0]]

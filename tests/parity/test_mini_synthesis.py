"""Trained resynthesis fixture gates (BASELINE config #4, offline).

Uses ``tests/fixtures/mini_synth.npz`` — a CFM SegmentSynthesis stack
(input MLP + voicebox Regressor) trained by
``python train_synthesis.py --config configs/sylber_resynthesis_mini.yaml``
on the synthetic (wav, art) corpus with analytic articulatory ground truth,
conditioned on the frozen 144-d mini sylber encoder.

Gates: freshly sampled trajectories on held-out audio must track the
ground-truth pitch and loudness contours (Pearson correlation floors +
no-regression vs the recorded fixture metrics). The reference's released
resynthesis training path is broken dead code
(`/root/reference/sylber/model/segment_synthesis.py:152-199`); the recipe
implemented here follows `flowmatching.py:826-871` + the trainer settings
at `segment_synthesis.py:244-250`.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "fixtures"
CKPT = FIXTURES / "mini_synth.npz"
META = FIXTURES / "mini_synth.json"
ENC = FIXTURES / "mini_ckpt.npz"

pytestmark = pytest.mark.skipif(
    not (CKPT.exists() and META.exists() and ENC.exists()),
    reason="mini synthesis fixture not built (train_synthesis.py "
           "--config configs/sylber_resynthesis_mini.yaml "
           "--fixture-dir tests/fixtures)")

# absolute floors: a random-init sampler scores ~0 on both (measured ~0.15 /
# -0.14 in the round-3 smoke); a trained one must clearly track the contours
PITCH_CORR_FLOOR = 0.5
LOUD_CORR_FLOOR = 0.6


@pytest.fixture(scope="module")
def synth_fixture():
    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisParams
    from sylber_tpu.train.synthesis_loop import synthesis_config_from_dict

    meta = json.loads(META.read_text())
    model_cfg = meta["config"]["model"]
    sc = synthesis_config_from_dict(model_cfg)
    trained = load_params_npz(str(CKPT))
    enc = load_params_npz(str(ENC))
    synth = SegmentSynthesis(config=sc, params=SynthesisParams(
        enc, trained["input_mlp"], trained["regressor"]))
    return {"synth": synth, "meta": meta,
            "norm_thr": float(model_cfg["norm_threshold"])}


def test_recorded_eval_passes_gates(synth_fixture):
    ev = synth_fixture["meta"]["eval"]
    assert ev["pitch_corr"] > PITCH_CORR_FLOOR, ev
    assert ev["loud_corr"] > LOUD_CORR_FLOOR, ev


def test_sampled_trajectories_track_ground_truth(synth_fixture):
    """Fresh held-out utterances (seed disjoint from training AND from the
    recorded eval), fresh sampling: correlations above the floors and not
    collapsed vs the recorded metrics."""
    from sylber_tpu.train.synthesis_loop import (
        build_synthesis_corpus, evaluate_synthesis, precompute_features)

    synth = synth_fixture["synth"]
    corpus = build_synthesis_corpus(6, 5.0, seed=31337)
    feats = precompute_features(synth.hubert, synth.params.hubert,
                                corpus["wav"], synth_fixture["norm_thr"],
                                0.8, batch=6)
    m = evaluate_synthesis(synth, feats, corpus["art"], steps=20, seed=5)
    rec = synth_fixture["meta"]["eval"]
    assert m["pitch_corr"] > PITCH_CORR_FLOOR, m
    assert m["loud_corr"] > LOUD_CORR_FLOOR, m
    # no-regression on the L1 tracking errors (correlation is seed-sensitive
    # on a 6-utt sample — measured 0.62 vs 0.94 across fresh seeds — while
    # the L1s are stable within ~10%)
    assert m["pitch_l1_voiced"] < 1.5 * rec["pitch_l1_voiced"], (m, rec)
    assert m["loud_l1"] < 1.5 * rec["loud_l1"], (m, rec)


def test_cfg_guidance_strengthens_conditioning(synth_fixture):
    """On the trained model, cond_scale > 1 must move samples toward the
    conditioned prediction (guidance-direction sanity, reference
    `flowmatching.py:566-579`)."""
    from sylber_tpu.train.synthesis_loop import (
        build_synthesis_corpus, precompute_features)

    synth = synth_fixture["synth"]
    corpus = build_synthesis_corpus(2, 3.0, seed=424242)
    feats = precompute_features(synth.hubert, synth.params.hubert,
                                corpus["wav"], synth_fixture["norm_thr"],
                                0.8, batch=2)
    base, _ = synth.resynthesize(features=np.asarray(feats), steps=8,
                                 seed=3, cond_scale=1.0)
    guided, _ = synth.resynthesize(features=np.asarray(feats), steps=8,
                                   seed=3, cond_scale=1.5)
    diff = np.abs(guided - base).mean()
    assert diff > 1e-3, "CFG null pass had no effect on a trained model"
    assert np.isfinite(guided).all()

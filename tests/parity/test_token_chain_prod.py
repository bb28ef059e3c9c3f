"""Production-scale codebook gates: 5K / 10K / 20K syllable units.

``tests/fixtures/token_chain_prod.json`` is produced by
``scripts/production_codebooks.py`` (one ~70-min TPU run): segment features
from the trained v1 mini encoder pooled over 8192 CONTINUUM-corpus
utterances (~110k segments — continuous speaker/formant perturbations, so
the feature distribution is a real continuum rather than the rich corpus'
160-phoneme x 12-speaker grid that saturates k-means at ~1.1k clusters),
then km5000 / km10000 / km20000 fit on-device and verified two ways:

- intrinsically: full-pool codebook usage (sampling under-counts,
  CLAUDE.md), inertia, quantization SNR, and ridge-probe pitch decodability
  of the QUANTIZED features vs the continuous ceiling;
- extrinsically: the full wav -> segment -> tokenize -> CFM -> vocoder
  chain on rich held-out audio with the trained rich CFM + NSF vocoder
  fixtures, scored exactly like the km64..km4096 chain
  (test_token_chain_rich.py).

This mirrors the reference's released 5,000 / 10,000 / 20,000-unit
variants (`/root/reference/docs/index.html` results table; quantizers at
`/root/reference/sylber/model/quantizer.py:86-175`).

Measured (2026-08, committed fixture): km5000 uses all 5000 codes at
31.6 dB quantization SNR; km10000/km20000 converge to ~8.5k distinct
non-empty codes (inertia ~1e-3 — the intrinsic cluster count of a 110k
segment pool; more centroids duplicate points, matching how real corpora
bound usable codebook size). Pitch ridge decodability survives
quantization (0.938-0.941 vs 0.951 continuous); chain pitch corr through
5K-20K tokens is 0.887-0.901 vs 0.916 feature-conditioned.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "fixtures"
CHAIN = FIXTURES / "token_chain_prod.json"

pytestmark = pytest.mark.skipif(
    not CHAIN.exists(),
    reason="production codebook fixture not built "
           "(scripts/production_codebooks.py)")


@pytest.fixture(scope="module")
def table():
    return json.loads(CHAIN.read_text())


def _km_keys(t):
    return sorted((k for k in t if k.startswith("km")),
                  key=lambda k: int(k[2:]))


def test_fit_corpus_is_production_scale(table):
    """The pool must be large enough that 5K+ codebooks are a real fit,
    not an over-parameterized no-op (>= 20 segments per km5000 centroid)."""
    fc = table["fit_corpus"]
    assert fc["style"] == "continuum", fc
    assert fc["n_segments"] >= 100_000, fc
    assert min(int(k[2:]) for k in _km_keys(table["table"])) >= 5000


def test_production_codebook_usage(table):
    """km5000 must use EVERY code (the rich corpus capped at 1104 of 4096;
    the continuum corpus breaks that ceiling by >4.5x). Larger codebooks
    converge to the pool's intrinsic cluster count (~8.5k on 110k
    segments) — usage must keep growing past km5000, not collapse."""
    t = table["table"]
    usage = {int(k[2:]): t[k]["codebook_usage"] for k in _km_keys(t)}
    assert usage[5000] == 5000, usage
    assert usage[10000] >= 7000, usage
    assert usage[20000] >= 7000, usage
    assert usage[20000] >= usage[10000] - 500, usage


def test_quantization_fidelity(table):
    """SNR grows with codebook size; inertia shrinks; ridge-probe pitch
    decodability of quantized features stays within 0.03 of the continuous
    ceiling (measured gap <= 0.013)."""
    t = table["table"]
    r_cont = table["table"]["features"]["pitch_ridge_r"]
    assert r_cont >= 0.9, r_cont
    keys = _km_keys(t)
    snrs = [t[k]["quant_snr_db"] for k in keys]
    assert snrs[0] >= 25.0, snrs
    assert all(s >= 40.0 for s in snrs[1:]), snrs
    inertias = [t[k]["kmeans_inertia"] for k in keys]
    assert inertias == sorted(inertias, reverse=True), inertias
    for k in keys:
        assert t[k]["pitch_ridge_r"] >= r_cont - 0.03, (k, t[k])
        assert t[k]["pitch_ridge_r"] >= 0.9, (k, t[k])


def test_chain_quality_through_production_tokens(table):
    """Full chain on rich held-out audio: 5K-20K-unit tokenization costs
    <= 0.05 pitch correlation vs feature conditioning and keeps every
    absolute gate of the rich chain (pitch/loudness corr, per-utt
    modulation, chain-audio F0/periodicity)."""
    t = table["table"]
    f = t["features"]
    assert f["pitch_corr"] > 0.8, f
    assert f["loud_corr"] > 0.7, f
    assert f["pitch_mod_r"] >= 0.5, f
    assert f["vocoder"]["f0_corr"] >= 0.4, f
    for k in _km_keys(t):
        m = t[k]
        assert m["pitch_corr"] > f["pitch_corr"] - 0.05, (k, m)
        assert m["loud_corr"] > f["loud_corr"] - 0.05, (k, m)
        assert m["pitch_l1_voiced"] < f["pitch_l1_voiced"] + 0.04, (k, m)
        assert m["pitch_corr"] > 0.8, (k, m)
        assert m["loud_corr"] > 0.7, (k, m)
        assert m["pitch_mod_r"] >= 0.45, (k, m)
        assert m["vocoder"]["f0_corr"] >= 0.4, (k, m)
        assert m["vocoder"]["periodicity"] >= 0.7, (k, m)


def test_prod_codebooks_checked_in(table):
    """fp16 codebooks ship as fixtures usable by KMQuantizer directly."""
    for K, fname in table["codebooks"].items():
        p = FIXTURES / fname
        assert p.exists(), p
        cb = np.load(p)
        assert cb.shape[0] == int(K), (fname, cb.shape)
        assert cb.dtype == np.float16, (fname, cb.dtype)
        assert np.isfinite(cb.astype(np.float32)).all(), fname

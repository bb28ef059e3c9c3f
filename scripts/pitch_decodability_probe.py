"""Per-utterance pitch-modulation decodability ceiling of encoder features.

The CFM resynthesis stack is conditioned on segment-averaged encoder
features (reference `segment_synthesis.py:107-135`); whatever per-utterance
pitch *modulation* (mean-removed contour) it can reproduce is upper-bounded
by what is linearly decodable from those features.  This probe fits a ridge
regressor features -> per-frame log-pitch (voiced frames) on one half of a
held-out synthetic corpus and scores per-utterance mean-removed Pearson r
on the other half — the number to compare against the CFM's measured
per-utt modulation corr (VERDICT r4 item 4).

Measured (r5): v1-trained encoder on the rich corpus ceiling ~0.445;
the rich-trained encoder is the candidate fix.

Usage:
  JAX_PLATFORMS=cpu python scripts/pitch_decodability_probe.py \
      --encoder tests/fixtures/mini_ckpt_rich.json [--style rich] [--n 56]
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform

apply_jax_platform()


def per_utt_mean_removed_corr(pred, truth, voiced):
    """Mean-removed (within-utterance) Pearson r, averaged over utts with
    enough voiced frames to define a contour."""
    rs = []
    for p, t, v in zip(pred, truth, voiced):
        if v.sum() < 20:
            continue
        a = p[v] - p[v].mean()
        b = t[v] - t[v].mean()
        den = np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12
        rs.append(float((a * b).sum() / den))
    return float(np.mean(rs)), rs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="tests/fixtures/mini_ckpt.json",
                    help="encoder fixture meta json (npz alongside)")
    ap.add_argument("--style", default="rich", choices=["v1", "rich"])
    ap.add_argument("--n", type=int, default=56,
                    help="total utts (half fit, half eval)")
    ap.add_argument("--seed", type=int, default=97531)
    ap.add_argument("--ridge", type=float, default=1.0)
    args = ap.parse_args()

    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.models.hubert import HubertConfig, HubertModel
    from sylber_tpu.train.synthesis_loop import (build_synthesis_corpus,
                                                 precompute_features)

    meta = json.loads(Path(args.encoder).read_text())
    hub = HubertConfig(num_hidden_layers=meta["encoding_layer"],
                       precision="default",
                       **{k: tuple(v) if isinstance(v, list) else v
                          for k, v in meta["hubert"].items()})
    params = load_params_npz(str(Path(args.encoder).with_suffix(".npz")))
    model = HubertModel(hub)

    corpus = build_synthesis_corpus(args.n, 5.0, seed=args.seed,
                                    style=args.style)
    feats = np.asarray(precompute_features(
        model, params, corpus["wav"], float(meta["norm_threshold"]),
        float(meta.get("merge_threshold", 0.8)), batch=8))
    art = corpus["art"]
    L = min(feats.shape[1], art.shape[1])
    feats, art = feats[:, :L], art[:, :L]
    pitch = art[..., 12]
    voiced = art[..., 13] > 0.02

    half = args.n // 2
    Xf = feats[:half][voiced[:half]]
    yf = pitch[:half][voiced[:half]]
    # ridge fit in f64 (closed form)
    X = np.concatenate([Xf, np.ones((len(Xf), 1), Xf.dtype)], 1).astype(np.float64)
    A = X.T @ X + args.ridge * np.eye(X.shape[1])
    w = np.linalg.solve(A, X.T @ yf.astype(np.float64))

    Fe = feats[half:]
    pred = (Fe.reshape(-1, Fe.shape[-1]).astype(np.float64)
            @ w[:-1] + w[-1]).reshape(Fe.shape[:2])
    mean_r, rs = per_utt_mean_removed_corr(pred, pitch[half:], voiced[half:])
    # absolute (non-mean-removed) corr over pooled voiced frames for context
    pv = pred[voiced[half:]]
    tv = pitch[half:][voiced[half:]]
    pooled = float(np.corrcoef(pv, tv)[0, 1])
    print(json.dumps({
        "encoder": args.encoder, "style": args.style,
        "n_fit": half, "n_eval": args.n - half,
        "per_utt_mean_removed_pitch_r": mean_r,
        "per_utt_r_p10": float(np.percentile(rs, 10)),
        "per_utt_r_median": float(np.median(rs)),
        "pooled_pitch_r": pooled,
    }, indent=2))


if __name__ == "__main__":
    main()

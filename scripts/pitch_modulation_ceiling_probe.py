"""Representation ceiling for per-utterance pitch modulation.

The resynthesis chain conditions the CFM on SEGMENT-AVERAGED features
filled constant across each segment's frames (reference
`/root/reference/sylber/model/segment_synthesis.py:94-141` does the same:
`segment_features` are per-segment vectors scattered back over frame
spans). Within a syllable, the conditioning therefore cannot represent a
pitch contour at all — the best any decoder conditioned this way can do
is the per-segment mean.

This probe measures that ceiling directly, with NO model in the loop on
the pitch side:

- ``oracle_segment_fill``: per-segment voiced-mean of the TRUE pitch
  track, filled across the segment's frames (segments from the trained
  mini encoder on the wav — the same segmentation the chain uses), scored
  with the chain's own per-utterance mean-removed pitch-modulation metric.
- ``oracle_truth_segments``: same, but with segments from the analytic
  syllable boundaries (removes segmentation error from the ceiling).

If the trained CFM's pitch_mod_r (0.533 on the rich held-out set) is close
to ``oracle_segment_fill``, the metric is representation-bound — the gap
to 1.0 is the segment-constant conditioning, not the CFM — and the lever
for more within-utterance pitch dynamics is conditioning design (e.g.
intra-segment positional pitch decoding), not training.

Usage: python scripts/pitch_modulation_ceiling_probe.py [--cpu]
           [--n-eval 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import (apply_jax_platform,
                                       enable_compilation_cache)

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def fill_segment_means(pitch: np.ndarray, loud: np.ndarray,
                       spans: np.ndarray) -> np.ndarray:
    """Per-segment voiced-mean pitch filled across each span's frames."""
    out = np.zeros_like(pitch)
    for a, b in spans:
        a, b = max(int(a), 0), min(int(b), len(pitch))
        if b <= a:
            continue
        v = loud[a:b] > 0.02
        out[a:b] = pitch[a:b][v].mean() if v.any() else 0.0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-eval", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    apply_jax_platform("cpu" if args.cpu else None)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from token_chain_proof import build_synth, per_utt_pitch_modulation

    from sylber_tpu.data.dataset import _zero_mean_unit_var
    from sylber_tpu.data.synthetic import synth_utterance
    from sylber_tpu.ops.segment import segment_batch
    from sylber_tpu.train.synthesis_loop import BUFFER, FRAME, SR

    print(f"backend: {jax.default_backend()}")
    synth, norm_thr, merge_thr = build_synth(style="rich")
    # replicate build_synthesis_corpus(seed=90001) exactly, but keep the
    # analytic segment spans too (same RNG consumption — fixtures stay
    # bit-identical, synthetic.py docstring)
    n_samples = int(args.seconds * SR) // FRAME * FRAME
    rng = np.random.RandomState(90001)
    wavs, arts, segs_true = [], [], []
    for _ in range(args.n_eval):
        wav, segs, art = synth_utterance(rng, n_samples, return_art=True,
                                         style="rich")
        wavs.append(np.concatenate([np.zeros(BUFFER, np.float32),
                                    _zero_mean_unit_var(wav),
                                    np.zeros(BUFFER, np.float32)]))
        arts.append(art)
        segs_true.append(np.asarray(segs))
    heldout = {"wav": np.stack(wavs), "art": np.stack(arts),
               "segments": segs_true}
    truth = np.asarray(heldout["art"], np.float32)

    @jax.jit
    def seg(params, w):
        hidden = synth.hubert.apply({"params": params}, w, None).astype(
            jnp.float32)
        res = segment_batch(hidden, norm_thr, merge_thr)
        return res.segments, res.num_segments

    wavs = heldout["wav"]
    model_fill = np.zeros(truth.shape[:2], np.float32)
    B = 8
    for i in range(0, len(wavs), B):
        chunk = wavs[i: i + B]
        pad = B - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        s, k = (np.asarray(x) for x in seg(synth.params.hubert,
                                           jnp.asarray(chunk)))
        for j in range(B - pad):
            t = truth[i + j]
            model_fill[i + j] = fill_segment_means(
                t[..., 12], t[..., 13], s[j, : int(k[j])])

    model_fill = model_fill[..., None]
    # reuse the chain metric: it reads [..., 12] for pitch, [..., 13] for
    # the voicing gate, so assemble (B, L, 14)-shaped views
    def as_art(pitch_2d):
        a = np.zeros(truth.shape, np.float32)
        a[..., 12] = pitch_2d
        return a

    r_model_seg = per_utt_pitch_modulation(as_art(model_fill[..., 0]), truth)

    # ceiling with ORACLE (analytic) syllable boundaries
    spans_true = heldout.get("segments")
    r_true_seg = None
    if spans_true is not None:
        oracle_fill = np.stack([
            fill_segment_means(truth[i, :, 12], truth[i, :, 13],
                               np.asarray(spans_true[i]))
            for i in range(len(truth))])
        r_true_seg = per_utt_pitch_modulation(as_art(oracle_fill), truth)

    out = {
        "n_eval_utts": args.n_eval,
        "oracle_segment_fill": r_model_seg,
        "oracle_truth_segments": r_true_seg,
        "note": "per-utt mean-removed pitch corr of segment-constant TRUE "
                "pitch vs the true contour — the representation ceiling of "
                "segment-averaged conditioning",
    }
    print(json.dumps(out, indent=2))
    Path("/tmp/pitch_mod_ceiling.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()

"""Explicit-pitch token chain proof: wav -> (art tokens + pitch tokens) ->
CFM -> vocoder audio.

The measured ceiling story (`scripts/pitch_modulation_ceiling_probe.py`):
segment-averaged encoder features hold only ~0.28 of within-utterance
pitch modulation linearly, capping the feature-conditioned CFM at
pitch_mod_r ~0.533 — and the reference's pitch sub-space
(`/root/reference/sylber/model/quantizer.py:182-257`) draws from the same
features, so it shares the bound. The explicit-pitch mode
(`SynthesisConfig.explicit_pitch_cond` + `ops/pitch.py`) conditions the
CFM on per-segment mean log-F0 measured from the input audio instead,
and `flow/quantizer.ScalarPitchQuantizer` discretizes that channel so the
TOKEN chain keeps an explicit pitch stream exactly where the reference
keeps its pitch codebook.

This script closes that loop on the trained fixtures, rich held-out set:

- ``true_art``     — analytic articulatory truth through the trained NSF
                     vocoder: the audio-F0 ceiling.
- ``features``     — continuous segment features + continuous measured
                     pitch channel (the trained explicit-pitch CFM's
                     native eval).
- ``km1024``       — km1024 art tokens (`mini_codebook_rich_1024.npy`,
                     fit on the same v1-encoder rich pool) + CONTINUOUS
                     pitch channel.
- ``km1024+p64``   — the fully discrete chain: km1024 art tokens + 64-bin
                     scalar pitch tokens (65-token pitch vocab incl.
                     unvoiced).

Artifacts: ``tests/fixtures/token_chain_rich_pitch.json`` (gated by
``tests/parity/test_token_chain_pitch.py``).

Usage: python scripts/pitch_chain_proof.py [--cpu] [--n-eval 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from token_chain_proof import eval_chain, vocoder_leg  # same scripts/ dir

from sylber_tpu.utils.platform import (apply_jax_platform,
                                        enable_compilation_cache)

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def build_pitch_synth(quantizer=None, pitch_quantizer=None, seed: int = 0):
    """SegmentSynthesis over the frozen v1 mini encoder + the trained
    explicit-pitch rich CFM (`mini_synth_rich_pitch.*`)."""
    import yaml

    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisParams
    from sylber_tpu.train.synthesis_loop import synthesis_config_from_dict

    root = FIXTURES.parent.parent
    cfg = yaml.safe_load(
        open(root / "configs" / "sylber_resynthesis_rich_pitch_mini.yaml"))
    sc = synthesis_config_from_dict(dict(cfg["model"]))
    synth = SegmentSynthesis(config=sc, quantizer=quantizer,
                             pitch_quantizer=pitch_quantizer, seed=seed)
    enc = load_params_npz(str(FIXTURES / "mini_ckpt.npz"))
    cfm = load_params_npz(str(FIXTURES / "mini_synth_rich_pitch.npz"))
    synth.params = SynthesisParams(enc, cfm["input_mlp"], cfm["regressor"])
    meta = json.loads((FIXTURES / "mini_ckpt.json").read_text())
    return synth, float(meta["norm_threshold"]), float(meta["merge_threshold"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-eval", type=int, default=24)
    ap.add_argument("--steps", type=int, default=50, help="ODE steps")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--pitch-bins", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out",
                    default=str(FIXTURES / "token_chain_rich_pitch.json"))
    args = ap.parse_args()

    apply_jax_platform("cpu" if args.cpu else None)
    enable_compilation_cache()
    import jax

    from sylber_tpu.flow.quantizer import KMQuantizer, ScalarPitchQuantizer
    from sylber_tpu.train.synthesis_loop import build_synthesis_corpus

    print(f"backend: {jax.default_backend()}")
    heldout = build_synthesis_corpus(args.n_eval, args.seconds,
                                     seed=90001,  # synthesis_loop eval seed
                                     style="rich")
    cents = np.load(FIXTURES / "mini_codebook_rich_1024.npy"
                    ).astype(np.float32)

    table = {}
    t0 = time.time()
    table["true_art"] = {"vocoder": vocoder_leg(
        np.asarray(heldout["art"], np.float32), heldout,
        "mini_vocoder_rich")}
    print("true_art:", json.dumps(table["true_art"]))

    legs = [
        ("features", None, None),
        ("km1024", KMQuantizer(cents), None),
        (f"km1024+p{args.pitch_bins}", KMQuantizer(cents),
         ScalarPitchQuantizer(args.pitch_bins)),
    ]
    for name, q, pq in legs:
        synth, norm_thr, merge_thr = build_pitch_synth(
            quantizer=q, pitch_quantizer=pq)
        art, m = eval_chain(synth, norm_thr, merge_thr, heldout,
                            steps=args.steps)
        m["vocoder"] = vocoder_leg(art, heldout, "mini_vocoder_rich")
        table[name] = m
        print(f"{name}:", json.dumps(m), f"[{time.time() - t0:.0f}s]")

    out = {
        "chain": "wav -> segment -> (art tokens + pitch tokens) -> CFM "
                 "-> vocoder",
        "style": "rich",
        "encoder": "tests/fixtures/mini_ckpt.npz",
        "cfm": "tests/fixtures/mini_synth_rich_pitch.npz",
        "vocoder_ckpt": "tests/fixtures/mini_vocoder_rich.npz",
        "art_codebook": "mini_codebook_rich_1024.npy",
        "pitch_bins": args.pitch_bins,
        "ode_steps": args.steps,
        "n_eval_utts": args.n_eval,
        "table": table,
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

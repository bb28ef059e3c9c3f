"""Full checkpoint parity: our Segmenter vs the PyTorch reference pipeline.

BASELINE config #1: with a trained ``sylber.ckpt`` present locally, run both
frameworks on the same utterance(s) and report exact `segments` agreement,
fp32-tolerance `segment_features`/`hidden_states` deltas, and boundary F1.

Usage:
    python scripts/parity_vs_reference.py --ckpt sylber.ckpt \
        --wav /root/reference/samples/sample.wav [--tol 1e-3]

Requires torch+transformers (baked in). The reference repo's get_segment is
loaded directly from /root/reference for the torch side.
"""

import argparse
import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform

apply_jax_platform()  # axon ignores $JAX_PLATFORMS; must go through jax.config

REF = "/root/reference"


def ref_pipeline(ckpt, wav, norm_threshold, merge_threshold, layers=9):
    import torch
    from transformers import HubertConfig, HubertModel

    spec = importlib.util.spec_from_file_location(
        "ref_segment_utils", os.path.join(REF, "sylber/utils/segment_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model = HubertModel(HubertConfig(num_hidden_layers=layers)).eval()
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model.load_state_dict(sd, strict=False)
    with torch.no_grad():
        states = model(torch.from_numpy(wav[None])).last_hidden_state[0].numpy()
    segs = np.asarray(mod.get_segment(states, norm_threshold,
                                      merge_threshold)).reshape(-1, 2)
    feats = (np.stack([states[s:e].mean(0) for s, e in segs])
             if len(segs) else np.zeros((0, states.shape[-1])))
    return states, segs, feats


def boundary_f1(a, b, tol_frames=1):
    if len(a) == 0 or len(b) == 0:
        return float(len(a) == len(b))
    ba = np.unique(np.asarray(a).reshape(-1))
    bb = np.unique(np.asarray(b).reshape(-1))
    hits = sum(1 for x in ba if np.abs(bb - x).min() <= tol_frames)
    prec = hits / len(ba)
    rec = sum(1 for x in bb if np.abs(ba - x).min() <= tol_frames) / len(bb)
    return 2 * prec * rec / max(prec + rec, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--wav", default=os.path.join(REF, "samples/sample.wav"))
    ap.add_argument("--norm-threshold", type=float, default=2.6)
    ap.add_argument("--merge-threshold", type=float, default=0.8)
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()

    from sylber_tpu.api import Segmenter
    from sylber_tpu.utils.audio import load_for_inference

    wav = load_for_inference(args.wav)
    ref_states, ref_segs, ref_feats = ref_pipeline(
        args.ckpt, wav, args.norm_threshold, args.merge_threshold)

    seg = Segmenter(model_ckpt=args.ckpt, precision="highest")
    out = seg(wav=wav, in_second=False,
              norm_threshold=args.norm_threshold,
              merge_threshold=args.merge_threshold)

    exact = out["segments"].tolist() == ref_segs.tolist()
    f1 = boundary_f1(out["segments"], ref_segs, tol_frames=0)
    h_err = np.abs(out["hidden_states"] - ref_states).max()
    f_err = (np.abs(out["segment_features"] - ref_feats).max()
             if exact and len(ref_segs) else float("nan"))

    print(f"segments exact match: {exact}")
    print(f"boundary F1 (tol 0 frames): {f1:.4f}")
    print(f"hidden_states max |delta|: {h_err:.3e}")
    print(f"segment_features max |delta|: {f_err:.3e}")
    ok = exact and h_err < args.tol
    print("PARITY OK" if ok else "PARITY MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

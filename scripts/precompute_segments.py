"""Precompute per-utterance segment .npy files for stage-1 training.

The reference's stage-1 recipe consumes SDHuBERT-derived segments stored as
``<data_dir>/<tag>.npy`` (`/root/reference/sylber/dataset/collective_audio_segment.py:88-95`)
but ships no tool to produce them. This script runs a (SDHuBERT- or
sylber-style) encoder checkpoint over a manifest and writes frame-index
segments per tag, batched on the accelerator; the segmentation itself runs
on-device (XLA scan). Use ``--native`` to run the algorithm with the C++
host segmenter instead (CPU-only environments).

Usage:
  python scripts/precompute_segments.py --manifest tags.txt \
      --wav-dir /data/wavs --out-dir /data/segments \
      --ckpt sdhubert.ckpt [--norm-threshold 2.6] [--merge-threshold 0.8]
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform

apply_jax_platform()  # axon ignores $JAX_PLATFORMS; must go through jax.config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--norm-threshold", type=float, default=2.6)
    ap.add_argument("--merge-threshold", type=float, default=0.8)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--native", action="store_true",
                    help="segment on the host with the C++ implementation")
    args = ap.parse_args()

    from sylber_tpu.api import Segmenter
    from sylber_tpu.utils.audio import load_for_inference

    seg = Segmenter(model_ckpt=args.ckpt)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    wav_dir = Path(args.wav_dir)

    tags = [t.strip() for t in open(args.manifest) if t.strip()]
    native = None
    if args.native:
        from sylber_tpu.utils.native import segment_native

        native = segment_native

    done = 0
    for i in range(0, len(tags), args.batch_size):
        chunk = tags[i: i + args.batch_size]
        wavs = []
        for t in chunk:
            for ext in (".wav", ".flac"):
                p = wav_dir / f"{t}{ext}"
                if p.exists():
                    wavs.append(load_for_inference(p))
                    break
            else:
                raise FileNotFoundError(t)
        outs = seg.process(wavs, in_second=False,
                           norm_threshold=args.norm_threshold,
                           merge_threshold=args.merge_threshold)
        for t, o in zip(chunk, outs):
            segs = (native(o["hidden_states"], args.norm_threshold,
                           args.merge_threshold)
                    if native is not None else o["segments"])
            np.save(out_dir / f"{t}.npy", np.asarray(segs, np.int64))
        done += len(chunk)
        print(f"\r{done}/{len(tags)}", end="", flush=True)
    print("\ndone")


if __name__ == "__main__":
    main()

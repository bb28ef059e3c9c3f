"""Fit k-means syllable-token codebooks (5K/10K/20K-unit variants).

Pipeline: manifest -> Segmenter (pooled segment features, on-device) ->
mini-batch k-means -> centroids .npy compatible with
`sylber_tpu.flow.quantizer.KMQuantizer` (and the reference's loader layout).

Usage:
  python scripts/fit_quantizer.py --manifest tags.txt --wav-dir wavs/ \
      --ckpt sylber.ckpt --n-clusters 5000 --out centroids_5k.npy \
      [--residual-out centroids_5k_res.npy]
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
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--n-clusters", type=int, default=5000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--residual-out", default=None,
                    help="also fit a 2nd-stage residual codebook")
    ap.add_argument("--normalize", action="store_true")
    ap.add_argument("--max-utts", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    from sylber_tpu.api import Segmenter
    from sylber_tpu.flow.kmeans import fit_kmeans
    from sylber_tpu.utils.audio import load_for_inference

    seg = Segmenter(model_ckpt=args.ckpt)
    wav_dir = Path(args.wav_dir)
    tags = [t.strip() for t in open(args.manifest) if t.strip()]
    if args.max_utts:
        tags = tags[: args.max_utts]

    feats = []
    for i in range(0, len(tags), args.batch_size):
        wavs = []
        for t in tags[i: i + args.batch_size]:
            for ext in (".wav", ".flac"):
                p = wav_dir / f"{t}{ext}"
                if p.exists():
                    wavs.append(load_for_inference(p))
                    break
        outs = seg.process(wavs, in_second=False)
        feats.extend(o["segment_features"] for o in outs
                     if len(o["segment_features"]))
        print(f"\r{min(i + args.batch_size, len(tags))}/{len(tags)}",
              end="", flush=True)
    feats = np.concatenate(feats, axis=0)
    print(f"\n{len(feats)} segment features")

    centroids, inertia = fit_kmeans(feats, args.n_clusters,
                                    normalize=args.normalize)
    np.save(args.out, centroids)
    print(f"wrote {args.out} (inertia {inertia:.3f})")

    if args.residual_out:
        from sylber_tpu.flow.quantizer import KMQuantizer

        km = KMQuantizer(centroids)
        import jax.numpy as jnp

        residual = feats - np.asarray(km.decode(km.get_indices(
            jnp.asarray(feats))))
        c2, inertia2 = fit_kmeans(residual, args.n_clusters)
        np.save(args.residual_out, c2)
        print(f"wrote {args.residual_out} (inertia {inertia2:.3f})")


if __name__ == "__main__":
    main()

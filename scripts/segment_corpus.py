"""Batch-segment a corpus: the LibriSpeech-style throughput/eval runner.

Walks a directory (or manifest) of audio files, runs bucketed batched
inference, and writes per-utterance results (segments in seconds + token
counts) plus corpus-level stats: RTFx, token rate (reference headline:
4.27 tok/s, `/root/reference/README.md:5`), and — when a second results file
is given — boundary F1 against it (BASELINE: within 0.5% of the reference).

Usage:
  python scripts/segment_corpus.py --audio-dir test-clean/ --out results.npz \
      [--ckpt sylber.ckpt] [--batch-size 32] [--compare other_results.npz]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform

apply_jax_platform()  # axon ignores $JAX_PLATFORMS; must go through jax.config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-dir", default=None)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--wav-dir", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--norm-threshold", type=float, default=2.6)
    ap.add_argument("--merge-threshold", type=float, default=0.8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--compare", default=None,
                    help="npz of another run; reports boundary F1 vs it")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the untimed per-bucket compile warm-up pass")
    args = ap.parse_args()

    import jax.numpy as jnp

    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.utils.audio import load_for_inference
    from sylber_tpu.utils.metrics import boundary_f1, token_rate

    if args.audio_dir:
        files = sorted(Path(args.audio_dir).rglob("*.wav")) \
            + sorted(Path(args.audio_dir).rglob("*.flac"))
        names = [str(f.relative_to(args.audio_dir)) for f in files]
    else:
        assert args.manifest and args.wav_dir
        names = [t.strip() for t in open(args.manifest) if t.strip()]
        files = []
        for t in names:
            for ext in (".wav", ".flac"):
                p = Path(args.wav_dir) / f"{t}{ext}"
                if p.exists():
                    files.append(p)
                    break
    assert files, "no audio found"

    seg = Segmenter(
        model_ckpt=args.ckpt,
        hubert_config=HubertConfig(dtype=jnp.dtype(args.dtype),
                                   precision="default",
                                   frontend_dtype=jnp.dtype(args.dtype)),
        norm_threshold=args.norm_threshold,
        merge_threshold=args.merge_threshold,
        length_bucket_s=4.0,
    )

    # load + sort by length for bucket efficiency
    wavs = [load_for_inference(f) for f in files]
    order = np.argsort([-len(w) for w in wavs])
    total_seconds = sum(len(w) for w in wavs) / 16000.0

    # plan batches, then warm each distinct (padded-length, batch-size)
    # bucket with one untimed call: jit compiles over the axon tunnel cost
    # 30-250 s each and would otherwise dominate small-corpus wall clock
    planned = [order[i: i + args.batch_size]
               for i in range(0, len(order), args.batch_size)]
    if not args.no_warmup:
        seen = set()
        for idx in planned:
            lb = seg.length_bucket
            key = (-(-max(len(wavs[j]) for j in idx) // lb) * lb, len(idx))
            if key not in seen:
                seen.add(key)
                seg.process([wavs[j] for j in idx], in_second=True,
                            return_hidden=False)
        print(f"warmed {len(seen)} bucket shapes", file=sys.stderr)

    results = {}
    batch_walls = []  # (seconds of audio, wall) per batch
    t0 = time.perf_counter()
    for bi, idx in enumerate(planned):
        tb = time.perf_counter()
        outs = seg.process([wavs[j] for j in idx], in_second=True,
                           return_hidden=False)
        batch_walls.append((sum(len(wavs[j]) for j in idx) / 16000.0,
                            time.perf_counter() - tb))
        for j, o in zip(idx, outs):
            results[names[j]] = o["segments"]
        if bi % 50 == 49:
            # long dispatch loops accumulate cyclic host garbage faster than
            # CPython's allocation-count GC fires (see train/loop.py)
            import gc

            gc.collect()
    wall = time.perf_counter() - t0

    # wall-clock RTFx includes one jit compile per (batch, length) bucket
    # (30-250 s each over the axon tunnel) — dominant for small corpora,
    # amortized for real ones. Also report a steady-state estimate that
    # drops compile-outlier batches (> 5x the median batch wall).
    med = float(np.median([w for _, w in batch_walls]))
    steady = [(a, w) for a, w in batch_walls if w <= 5 * med]
    segs_list = list(results.values())
    stats = {
        "utts": len(files),
        "audio_seconds": total_seconds,
        "wall_seconds": wall,
        "rtfx": total_seconds / wall,
        "rtfx_steady": (sum(a for a, _ in steady)
                        / max(sum(w for _, w in steady), 1e-9)),
        "n_compile_outlier_batches": len(batch_walls) - len(steady),
        "token_rate": token_rate(segs_list,
                                 [len(w) / 16000.0 for w in wavs]),
    }
    np.savez(args.out, stats=json.dumps(stats),
             **{k: v for k, v in results.items()})
    print(json.dumps(stats))

    if args.compare:
        other = np.load(args.compare, allow_pickle=True)
        f1s = [boundary_f1((results[k] * 50).astype(int),
                           (other[k] * 50).astype(int), tol_frames=0)
               for k in results if k in other]
        print(json.dumps({"boundary_f1_vs_compare": float(np.mean(f1s)),
                          "n_compared": len(f1s)}))


if __name__ == "__main__":
    main()

"""Production-scale syllable codebooks: 5K / 10K / 20K units.

The reference's released variants quantize segment embeddings into 5,000 /
10,000 / 20,000-unit codebooks (`/root/reference/docs/index.html` results
table; quantizers at `/root/reference/sylber/model/quantizer.py:86-175`).
The rich synthetic corpus cannot exercise that scale — its segment features
live on a discrete 160-phoneme x 12-speaker grid and k-means saturates at
~1.1K clusters (km4096 usage 1104, inertia 7e-4: centroids sit ON the data).
This script fits production-scale codebooks on the CONTINUUM corpus
(`data/synthetic.py style="continuum"`: continuous speakers + per-syllable
formant/articulatory perturbation), where the feature distribution is a true
continuum like real speech, then verifies the codebooks both intrinsically
and through the full resynthesis chain:

1. pool segment features from the trained v1 mini encoder
   (`tests/fixtures/mini_ckpt.npz`) over N continuum utterances (chunked so
   host RSS stays bounded);
2. fit km5000 / km10000 / km20000 on-device (`flow/kmeans.fit_kmeans`:
   exact k-means++ seeding + mini-batch Lloyd with dead-cluster reseeding);
3. intrinsic metrics per codebook: usage over the FULL pooled set (a sample
   under-counts, CLAUDE.md), inertia, quantization SNR, and ridge-probe
   pitch decodability of quantized vs continuous features (does per-segment
   mean log-F0 survive quantization?);
4. extrinsic: the full wav -> segment -> tokenize -> CFM -> vocoder chain on
   the RICH held-out set (the trained rich CFM + NSF vocoder fixtures),
   scored exactly like scripts/token_chain_proof.py — the continuum
   codebooks must cover the rich corpus' feature space.

Artifacts: ``tests/fixtures/token_chain_prod.json`` (gated by
``tests/parity/test_token_chain_prod.py``) + fp16 codebooks
``tests/fixtures/mini_codebook_prod_{K}.npy``.

Usage: python scripts/production_codebooks.py [--n-utts 8192]
           [--sizes 5000 10000 20000] [--cpu]
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

from sylber_tpu.utils.platform import (apply_jax_platform,
                                        enable_compilation_cache)

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def collect_features_with_truth(synth, norm_thr, merge_thr, n_utts,
                                seconds=5.0, seed=0, batch=32,
                                chunk_utts=512, style="continuum"):
    """Pooled (features, per-segment mean log-pitch, voiced-fraction) over
    the synthetic corpus. Generated + extracted in chunks so neither the
    host corpus nor the axon-retained H2D buffers grow unboundedly."""
    import jax
    import jax.numpy as jnp

    from sylber_tpu.ops.segment import segment_batch
    from sylber_tpu.train.synthesis_loop import build_synthesis_corpus

    @jax.jit
    def fwd(params, w):
        hidden = synth.hubert.apply({"params": params}, w, None).astype(
            jnp.float32)
        res = segment_batch(hidden, norm_thr, merge_thr)
        return res.features, res.segments, res.num_segments

    feats_all, pitch_all, vfrac_all = [], [], []
    for c0 in range(0, n_utts, chunk_utts):
        n_chunk = min(chunk_utts, n_utts - c0)
        corpus = build_synthesis_corpus(n_chunk, seconds, seed=seed + c0,
                                        style=style)
        wavs, arts = corpus["wav"], corpus["art"]
        for i in range(0, len(wavs), batch):
            chunk = wavs[i: i + batch]
            pad = batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            f, s, k = (np.asarray(x) for x in
                       fwd(synth.params.hubert, jnp.asarray(chunk)))
            for j in range(batch - pad):
                art = arts[i + j]
                L = art.shape[0]
                for seg in range(int(k[j])):
                    a, b = int(s[j, seg, 0]), int(s[j, seg, 1])
                    a, b = max(a, 0), min(b, L)
                    if b <= a:
                        continue
                    span = art[a:b]
                    voiced = span[:, 13] > 0.02
                    feats_all.append(f[j, seg])
                    pitch_all.append(float(span[voiced, 12].mean())
                                     if voiced.any() else 0.0)
                    vfrac_all.append(float(voiced.mean()))
        print(f"  chunk {c0 + n_chunk}/{n_utts}: "
              f"{len(feats_all)} segments pooled", flush=True)
    return (np.stack(feats_all), np.asarray(pitch_all, np.float32),
            np.asarray(vfrac_all, np.float32))


def ridge_r(x: np.ndarray, y: np.ndarray, lam: float = 1.0,
            seed: int = 0) -> float:
    """Held-out Pearson r of a ridge probe x -> y (80/20 split)."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(x))
    n_tr = int(0.8 * len(x))
    tr, te = idx[:n_tr], idx[n_tr:]
    xm, xs = x[tr].mean(0), x[tr].std(0) + 1e-6
    xt = (x[tr] - xm) / xs
    w = np.linalg.solve(xt.T @ xt + lam * np.eye(x.shape[1]),
                        xt.T @ (y[tr] - y[tr].mean()))
    pred = ((x[te] - xm) / xs) @ w
    yt = y[te] - y[tr].mean()
    pred, yt = pred - pred.mean(), yt - yt.mean()
    den = np.sqrt((pred ** 2).sum() * (yt ** 2).sum()) + 1e-12
    return float((pred * yt).sum() / den)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[5000, 10000, 20000])
    ap.add_argument("--n-utts", type=int, default=8192)
    ap.add_argument("--n-eval", type=int, default=48)
    ap.add_argument("--steps", type=int, default=50, help="ODE steps")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-chain", action="store_true",
                    help="intrinsic metrics only (no CFM/vocoder legs)")
    ap.add_argument("--out", default=str(FIXTURES / "token_chain_prod.json"))
    args = ap.parse_args()

    apply_jax_platform("cpu" if args.cpu else None)
    enable_compilation_cache()
    import jax

    from token_chain_proof import build_synth, eval_chain, vocoder_leg

    from sylber_tpu.flow.kmeans import fit_kmeans
    from sylber_tpu.flow.quantizer import KMQuantizer
    from sylber_tpu.train.synthesis_loop import build_synthesis_corpus

    print(f"backend: {jax.default_backend()}")
    synth, norm_thr, merge_thr = build_synth(style="rich")

    t0 = time.time()
    feats, pitch_truth, vfrac = collect_features_with_truth(
        synth, norm_thr, merge_thr, n_utts=args.n_utts,
        seconds=args.seconds)
    print(f"collected {feats.shape} continuum segment features in "
          f"{time.time() - t0:.1f}s")

    # pitch decodability ceiling of the CONTINUOUS features (voiced segments)
    voiced_seg = vfrac > 0.5
    xs, ys = feats[voiced_seg], pitch_truth[voiced_seg]
    r_cont = ridge_r(xs, ys)
    print(f"continuous-feature pitch ridge r = {r_cont:.3f} "
          f"({voiced_seg.sum()} voiced segments)")

    heldout = build_synthesis_corpus(args.n_eval, args.seconds,
                                     seed=90001, style="rich")
    table = {"features": {"pitch_ridge_r": r_cont}}
    if not args.skip_chain:
        art_cont, m = eval_chain(synth, norm_thr, merge_thr, heldout,
                                 steps=args.steps)
        m["vocoder"] = vocoder_leg(art_cont, heldout, "mini_vocoder_rich")
        table["features"].update(m)
        print("features:", json.dumps(table["features"]))

    codebook_files = {}
    for K in args.sizes:
        t0 = time.time()
        cents, inertia = fit_kmeans(feats, K, seed=0)
        path = FIXTURES / f"mini_codebook_prod_{K}.npy"
        np.save(path, cents.astype(np.float16))
        codebook_files[K] = path.name
        q = KMQuantizer(cents)
        # intrinsic: usage over the FULL pooled set, SNR, pitch retention.
        # Chunked: _nearest materializes an (N, K) distance matrix — at
        # N=110k, K=20k that is 8.8 GB of HBM; 16k-row chunks keep it 1.3 GB.
        toks = np.concatenate([
            np.asarray(q.get_indices(feats[i: i + 16384]))
            for i in range(0, len(feats), 16384)])
        quant = np.asarray(q.decode(toks))
        snr = 10.0 * np.log10(
            (feats ** 2).sum(-1).mean()
            / (((feats - quant) ** 2).sum(-1).mean() + 1e-12))
        m = {"kmeans_inertia": float(inertia),
             "codebook_usage": int(len(np.unique(toks))),
             "quant_snr_db": round(float(snr), 2),
             "pitch_ridge_r": ridge_r(quant[voiced_seg], ys),
             "fit_seconds": round(time.time() - t0, 1)}
        if not args.skip_chain:
            synth_q, _, _ = build_synth(quantizer=q, style="rich")
            art_q, mc = eval_chain(synth_q, norm_thr, merge_thr, heldout,
                                   steps=args.steps)
            mc["vocoder"] = vocoder_leg(art_q, heldout, "mini_vocoder_rich")
            m.update(mc)
        table[f"km{K}"] = m
        print(f"km{K}:", json.dumps(m), flush=True)

    out = {
        "chain": "continuum-corpus codebooks; chain eval on rich held-out",
        "fit_corpus": {"style": "continuum", "n_utts": args.n_utts,
                       "n_segments": int(len(feats)),
                       "n_voiced_segments": int(voiced_seg.sum())},
        "encoder": "tests/fixtures/mini_ckpt.npz",
        "cfm": "tests/fixtures/mini_synth_rich.npz",
        "vocoder_ckpt": "tests/fixtures/mini_vocoder_rich.npz",
        "codebooks": codebook_files,
        "ode_steps": args.steps,
        "n_eval_utts": args.n_eval,
        "table": table,
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

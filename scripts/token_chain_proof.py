"""Discrete-token chain proof: wav -> syllable tokens -> CFM -> vocoder audio.

The reference's headline capability is resynthesis from DISCRETE syllable
tokens (5K/10K/20K-unit variants, `/root/reference/docs/index.html`;
quantizers at `/root/reference/sylber/model/quantizer.py:86-175`). This
script closes that loop end-to-end on the trained mini fixtures:

1. fit k-means codebooks (several sizes) on pooled segment features of the
   trained mini encoder (`tests/fixtures/mini_ckpt.npz`) over the synthetic
   training corpus — the offline stand-in for LibriSpeech;
2. for each codebook size, run the FULL chain on held-out utterances:
   wav -> fused segment (on-device) -> tokenize (nearest centroid) ->
   decode(tokens) -> frame fill -> CFM resynthesis
   (`synthesis.resynthesize(input_values=...)` with `quantizer=` — the
   quantize/decode/fill happens in-graph) -> pitch/loudness correlation and
   masked L1 against the analytic articulatory ground truth;
3. the no-quantizer chain (continuous features) runs as the reference point,
   so the table shows exactly what degradation tokens add per codebook size;
4. one vocoder leg: token-resynthesized articulatory tracks through the
   trained mini HiFi-GAN (`tests/fixtures/mini_vocoder.npz`), scoring
   autocorrelation-F0 correlation of the generated audio vs the real
   waveform.

Artifacts: ``tests/fixtures/token_chain.json`` (the quality table, gated by
``tests/parity/test_token_resynthesis.py``) + fp16 centroid codebooks
``tests/fixtures/mini_codebook_{K}.npy``.

Usage: python scripts/token_chain_proof.py [--cpu] [--sizes 64 256 1024]
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


def build_synth(quantizer=None, seed: int = 0, style: str = "v1"):
    """SegmentSynthesis over the trained mini encoder + trained mini CFM.

    ``style="rich"`` loads the rich-corpus CFM fixture (mini_synth_rich.*,
    trained by configs/sylber_resynthesis_rich_mini.yaml) over the SAME
    frozen v1 encoder — it segments rich audio at boundary F1 0.936."""
    import yaml

    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisParams
    from sylber_tpu.train.synthesis_loop import synthesis_config_from_dict

    root = FIXTURES.parent.parent
    cfg_name = ("sylber_resynthesis_rich_mini.yaml" if style == "rich"
                else "sylber_resynthesis_mini.yaml")
    cfm_name = "mini_synth_rich.npz" if style == "rich" else "mini_synth.npz"
    cfg = yaml.safe_load(open(root / "configs" / cfg_name))
    model_cfg = dict(cfg["model"])
    sc = synthesis_config_from_dict(model_cfg)
    synth = SegmentSynthesis(config=sc, quantizer=quantizer, seed=seed)
    enc = load_params_npz(str(FIXTURES / "mini_ckpt.npz"))
    cfm = load_params_npz(str(FIXTURES / cfm_name))
    synth.params = SynthesisParams(enc, cfm["input_mlp"], cfm["regressor"])
    meta = json.loads((FIXTURES / "mini_ckpt.json").read_text())
    return synth, float(meta["norm_threshold"]), float(meta["merge_threshold"])


def collect_segment_features(synth, norm_thr, merge_thr, n_utts=256,
                             seconds=5.0, seed=0, batch=32, style="v1"):
    """Pooled segment features over the synthetic corpus (one fused
    program per batch: forward -> segment -> pool), stacked (N, d)."""
    import jax
    import jax.numpy as jnp

    from sylber_tpu.ops.segment import segment_batch
    from sylber_tpu.train.synthesis_loop import build_synthesis_corpus

    corpus = build_synthesis_corpus(n_utts, seconds, seed=seed, style=style)

    @jax.jit
    def fwd(params, w):
        hidden = synth.hubert.apply({"params": params}, w, None).astype(
            jnp.float32)
        res = segment_batch(hidden, norm_thr, merge_thr)
        return res.features, res.num_segments

    feats_all = []
    wavs = corpus["wav"]
    for i in range(0, len(wavs), batch):
        chunk = wavs[i: i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        f, k = (np.asarray(x) for x in fwd(synth.params.hubert,
                                           jnp.asarray(chunk)))
        for j in range(batch - pad):
            feats_all.append(f[j, : k[j]])
    return np.concatenate(feats_all, axis=0)


def per_utt_pitch_modulation(art, truth):
    """Mean-removed per-utterance pitch corr at the ARTICULATORY level —
    the CFM's within-utterance pitch-dynamics fidelity, isolated from the
    vocoder and the F0 tracker (VERDICT r4 item 4)."""
    from sylber_tpu.utils.metrics import per_utterance_pitch_modulation

    return per_utterance_pitch_modulation(art, truth)


def eval_chain(synth, norm_thr, merge_thr, heldout, steps=50, seed=0,
               batch=8):
    """wav -> (tokens ->) CFM art; pitch/loudness corr + masked L1 vs the
    analytic truth (same scoring as train/synthesis_loop.evaluate_synthesis,
    but through the wav path so tokenization happens in-graph)."""
    from sylber_tpu.train.synthesis_loop import _pearson

    wavs, truth = heldout["wav"], np.asarray(heldout["art"], np.float32)
    arts = []
    for i in range(0, len(wavs), batch):
        chunk = wavs[i: i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        art, _ = synth.resynthesize(input_values=chunk, steps=steps,
                                    seed=seed, normthreshold=norm_thr,
                                    merge_threshold=merge_thr)
        arts.append(art[: batch - pad])
    art = np.concatenate(arts, axis=0)
    L = min(art.shape[1], truth.shape[1])
    art, tr = art[:, :L], truth[:, :L]
    voiced = tr[..., 13] > 0.02
    return art, {
        "pitch_mod_r": per_utt_pitch_modulation(art, tr),
        "pitch_corr": _pearson(art[..., 12][voiced], tr[..., 12][voiced]),
        "loud_corr": _pearson(art[..., 13].ravel(), tr[..., 13].ravel()),
        "art_l1_voiced": float(np.abs(art[..., :12][voiced]
                                      - tr[..., :12][voiced]).mean()),
        "pitch_l1_voiced": float(np.abs(art[..., 12][voiced]
                                        - tr[..., 12][voiced]).mean()),
        "loud_l1": float(np.abs(art[..., 13] - tr[..., 13]).mean()),
    }


def vocoder_leg(art, heldout, vocoder_prefix="mini_vocoder"):
    """(Token-)resynthesized art -> trained mini HiFi-GAN -> per-utterance
    MEAN-REMOVED F0-track corr of the generated audio vs the REAL waveform
    (autocorrelation tracker — spectrum-argmax octave-errors, see
    train_vocoder_proof.py). Mean removal makes this a pitch-MODULATION
    metric: it scores the within-utterance F0 dynamics, not the register."""
    from train_vocoder_proof import f0_track_autocorr  # same scripts/ dir

    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.vocoder.hifigan import HiFiGANConfig
    from sylber_tpu.vocoder.sparc import SparcDecoder, SparcDecoderConfig

    meta = json.loads((FIXTURES / f"{vocoder_prefix}.json").read_text())
    dcfg = SparcDecoderConfig(generator=HiFiGANConfig(**meta["generator"]))
    dec = SparcDecoder(dcfg, params=load_params_npz(
        str(FIXTURES / f"{vocoder_prefix}.npz")))
    spk = np.zeros(dcfg.generator.cond_channels, np.float32)
    audio = np.asarray(dec(art, spk, meta["pitch_mean"]))
    BUF = 160
    f0_corrs, periodicity = [], []
    for i in range(len(audio)):
        real = heldout["wav"][i][BUF:BUF + audio.shape[1]]
        f_r, s_r = f0_track_autocorr(real)
        f_f, s_f = f0_track_autocorr(audio[i])
        # score where BOTH tracks are confidently periodic: on frames where
        # the generated audio is aperiodic the tracker's f_f is undefined
        # noise, which measures the tracker, not the chain's F0 dynamics
        voiced = (s_r > 0.4) & (s_f > 0.4)
        if voiced.sum() > 10:
            fr, ff = f_r[voiced] - f_r[voiced].mean(), \
                f_f[voiced] - f_f[voiced].mean()
            f0_corrs.append(float(
                (fr * ff).sum()
                / (np.sqrt((fr * fr).sum() * (ff * ff).sum()) + 1e-12)))
            periodicity.append(float(np.median(s_f[voiced])))
    return {"f0_corr": float(np.mean(f0_corrs)) if f0_corrs else 0.0,
            "periodicity": float(np.mean(periodicity)) if periodicity
            else 0.0, "n_utts": len(f0_corrs)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[64, 256, 1024])
    ap.add_argument("--n-utts", type=int, default=256)
    ap.add_argument("--n-eval", type=int, default=24)
    ap.add_argument("--steps", type=int, default=50, help="ODE steps")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--style", default="v1", choices=["v1", "rich"],
                    help="synthetic corpus style; rich uses the "
                         "mini_synth_rich CFM + mini_vocoder_rich fixtures "
                         "and writes *_rich codebooks/table")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    suffix = "_rich" if args.style == "rich" else ""
    if args.out is None:
        args.out = str(FIXTURES / f"token_chain{suffix}.json")

    apply_jax_platform("cpu" if args.cpu else None)
    enable_compilation_cache()
    import jax

    from sylber_tpu.flow.kmeans import fit_kmeans
    from sylber_tpu.flow.quantizer import KMQuantizer
    from sylber_tpu.train.synthesis_loop import build_synthesis_corpus

    print(f"backend: {jax.default_backend()} style: {args.style}")
    vocoder_prefix = f"mini_vocoder{suffix}"
    synth, norm_thr, merge_thr = build_synth(style=args.style)

    t0 = time.time()
    feats = collect_segment_features(synth, norm_thr, merge_thr,
                                     n_utts=args.n_utts,
                                     seconds=args.seconds, style=args.style)
    print(f"collected {feats.shape} segment features in "
          f"{time.time() - t0:.1f}s")

    heldout = build_synthesis_corpus(args.n_eval, args.seconds,
                                     seed=90001,  # synthesis_loop eval seed
                                     style=args.style)

    table = {}
    # oracle leg: TRUE articulatory tracks through the vocoder — the
    # ceiling the CFM legs are scored against (isolates the vocoder from
    # the CFM's pitch-modulation fidelity, VERDICT r4 item 4)
    table["true_art"] = {"vocoder": vocoder_leg(
        np.asarray(heldout["art"], np.float32), heldout, vocoder_prefix)}
    print("true_art:", json.dumps(table["true_art"]))

    # reference point: the continuous-feature chain (no quantizer)
    art_cont, m = eval_chain(synth, norm_thr, merge_thr, heldout,
                             steps=args.steps)
    m["vocoder"] = vocoder_leg(art_cont, heldout, vocoder_prefix)
    table["features"] = m
    print("features:", json.dumps(m))

    codebook_files = {}
    for K in args.sizes:
        cents, inertia = fit_kmeans(feats, K, seed=0)
        path = FIXTURES / f"mini_codebook{suffix}_{K}.npy"
        np.save(path, cents.astype(np.float16))
        codebook_files[K] = path.name
        q = KMQuantizer(cents)
        synth_q, _, _ = build_synth(quantizer=q, style=args.style)
        art_q, m = eval_chain(synth_q, norm_thr, merge_thr, heldout,
                              steps=args.steps)
        # token stats over the FULL pooled training features (a 4096-frame
        # sample under-counts usage for production-sized codebooks)
        toks = np.asarray(q.get_indices(np.asarray(feats, np.float32)))
        m["kmeans_inertia"] = float(inertia)
        m["codebook_usage"] = int(len(np.unique(toks)))
        m["vocoder"] = vocoder_leg(art_q, heldout, vocoder_prefix)
        table[f"km{K}"] = m
        print(f"km{K}:", json.dumps(m))

    out = {
        "chain": "wav -> segment -> tokenize -> decode -> CFM -> vocoder",
        "style": args.style,
        "encoder": "tests/fixtures/mini_ckpt.npz",
        "cfm": f"tests/fixtures/mini_synth{suffix}.npz",
        "vocoder_ckpt": f"tests/fixtures/{vocoder_prefix}.npz",
        "codebooks": codebook_files,
        "ode_steps": args.steps,
        "n_eval_utts": args.n_eval,
        "table": table,
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""End-to-end training proof on synthetic speech with known boundaries.

Trains a small-but-architecturally-complete Sylber (9-layer HuBERT, 144-d)
through the full stage-1 -> stage-2 pipeline on the synthetic syllabic corpus
(`sylber_tpu/data/synthetic.py`), then evaluates on held-out audio:

- boundary F1 of the learned online segmentation vs analytic ground truth;
- boundary F1 of stage-2-online (learned threshold) vs oracle-offline
  segmentation;
- token rate (reference headline 4.27 tok/s, /root/reference/README.md:5);
- fast-mode (bf16 everything, precision=default) vs exact-mode (f32,
  precision=highest) segmentation agreement — the offline stand-in for the
  real-checkpoint parity gate (BASELINE.md targets).

Writes ``tests/fixtures/mini_ckpt.npz`` (float16 params + learned threshold)
and ``tests/fixtures/mini_ckpt.json`` (config + eval numbers) consumed by
``tests/parity/test_fast_exact_agreement.py``.

Usage: python scripts/train_mini_proof.py [--out-dir runs/mini_proof]
       [--stage1-steps 1500] [--stage2-steps 600] [--cpu]
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform, enable_compilation_cache

apply_jax_platform()  # axon ignores $JAX_PLATFORMS; must go through jax.config
enable_compilation_cache()

MINI_HUBERT = {
    "hidden_size": 144,
    "num_attention_heads": 12,
    "intermediate_size": 576,
    "conv_dim": [128] * 7,
    "num_conv_pos_embeddings": 64,
    "num_conv_pos_embedding_groups": 16,
}


def _model_cfg(stage2: bool, thr: dict | None, lr: float, steps: int,
               hub_dict: dict | None = None):
    m = {
        "encoding_layer": 9,
        "ema_decay": 1.0,
        "hubert": dict(MINI_HUBERT if hub_dict is None else hub_dict),
        "precision": "default",
        "lr": lr,
        "warmup_steps": 100,
        "total_steps": steps,
        "min_factor": 1.0,
        "do_noise_augment": True,
        "noise_mixer_configs": {"augment_prob": 0.2,
                                "utterance_mix_ratio": 0.25},
        "mask_prob": 0.0,
    }
    if stage2:
        m.update(segment_online=True,
                 merge_threshold_range=[0.8, 0.9],
                 use_train_thrupdate=True,
                 thresholder_configs=thr or {})
    return m


def _data_cfg(n_utts: int, stage2: bool, batch_size: int,
              style: str = "v1"):
    return {"synthetic": True, "n_utts": n_utts, "max_len": 80_000,
            "batch_size": batch_size, "segment_online_data": stage2,
            "style": style}


def measure_norm_stats(params, hubert_config, seed=123, n_utts=8,
                       style="v1"):
    """Teacher frame-norm stats over voiced/silence frames (ground truth),
    to initialize the stage-2 thresholder for this model's norm scale."""
    import jax.numpy as jnp

    from sylber_tpu.data.synthetic import synth_utterance
    from sylber_tpu.models.hubert import HubertModel

    model = HubertModel(hubert_config)
    rng = np.random.RandomState(seed)
    sig, noi = [], []
    for _ in range(n_utts):
        wav, segs = synth_utterance(rng, 5 * 16000, style=style)
        w = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        h = np.asarray(model.apply({"params": params},
                                   jnp.asarray(w[None]), None))
        norms = np.sqrt((h[0].astype(np.float64) ** 2).sum(-1) + 1e-8)
        m = np.zeros(len(norms), bool)
        for s, e in segs:
            m[s:min(e, len(norms))] = True
        sig.append(norms[m])
        noi.append(norms[~m])
    sig = np.concatenate(sig)
    noi = np.concatenate(noi)
    return {"signal_mean": float(sig.mean()), "signal_var": float(sig.var()),
            "noise_mean": float(noi.mean()), "noise_var": float(noi.var())}


def evaluate(params, hubert_config, norm_threshold, merge_threshold=0.8,
             n_utts=24, seed=7777, style="v1"):
    """Held-out eval: F1 vs ground truth + fast-vs-exact agreement."""
    import jax.numpy as jnp

    from sylber_tpu.api import Segmenter
    from sylber_tpu.data.synthetic import synth_utterance
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.utils.metrics import boundary_f1, token_rate

    rng = np.random.RandomState(seed)
    wavs, truths = [], []
    for _ in range(n_utts):
        n = int(rng.uniform(3.0, 8.0) * 16000)
        wav, segs = synth_utterance(rng, n, style=style)
        wavs.append((wav - wav.mean()) / (wav.std(ddof=1) + 1e-12))
        truths.append(segs)

    import dataclasses

    def seg_for(dtype, frontend_dtype, precision):
        cfg = dataclasses.replace(hubert_config, dtype=jnp.dtype(dtype),
                                  frontend_dtype=jnp.dtype(frontend_dtype),
                                  precision=precision)
        return Segmenter(params=params, hubert_config=cfg,
                         norm_threshold=norm_threshold,
                         merge_threshold=merge_threshold)

    exact = seg_for("float32", "float32", "highest")
    fast = seg_for("bfloat16", "bfloat16", "default")

    out_e = exact.process(wavs, in_second=False, return_hidden=False)
    out_f = fast.process(wavs, in_second=False, return_hidden=False)

    f1_vs_truth = [boundary_f1(o["segments"], t, tol_frames=1)
                   for o, t in zip(out_e, truths)]
    f1_vs_truth_t2 = [boundary_f1(o["segments"], t, tol_frames=2)
                      for o, t in zip(out_e, truths)]
    f1_fast_exact = [boundary_f1(f["segments"], e["segments"], tol_frames=0)
                     for f, e in zip(out_f, out_e)]
    f1_fast_exact_t1 = [boundary_f1(f["segments"], e["segments"],
                                    tol_frames=1)
                        for f, e in zip(out_f, out_e)]
    nseg_delta = [abs(len(f["segments"]) - len(e["segments"]))
                  for f, e in zip(out_f, out_e)]
    secs = [len(w) / 16000.0 for w in wavs]
    return {
        "boundary_f1_vs_truth_tol1": float(np.mean(f1_vs_truth)),
        "boundary_f1_vs_truth_tol2": float(np.mean(f1_vs_truth_t2)),
        "fast_vs_exact_boundary_f1_tol0": float(np.mean(f1_fast_exact)),
        "fast_vs_exact_boundary_f1_tol1": float(np.mean(f1_fast_exact_t1)),
        "fast_vs_exact_nseg_delta_mean": float(np.mean(nseg_delta)),
        "token_rate_exact": token_rate(
            [o["segments"] for o in out_e], secs),
        "token_rate_truth": token_rate(truths, secs),
        "n_eval_utts": n_utts,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="runs/mini_proof")
    ap.add_argument("--stage1-steps", type=int, default=1500)
    ap.add_argument("--stage2-steps", type=int, default=600)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--n-utts", type=int, default=256)
    ap.add_argument("--steps-per-dispatch", type=int, default=8,
                    help="K train steps per jitted dispatch (identical "
                         "math; K=8 is ~12%% faster through the loop but "
                         "its scan program costs ~30 min to compile over "
                         "the tunnel on a cold XLA cache — use 1 when the "
                         "cache is cold and the run is one-off)")
    ap.add_argument("--fixture-dir", default=None,
                    help="write mini_ckpt fixture here (e.g. tests/fixtures)")
    ap.add_argument("--style", default="v1", choices=["v1", "rich"],
                    help="synthetic corpus style (rich: multi-speaker + "
                         "phrase intonation); fixture name gains a _rich "
                         "suffix")
    ap.add_argument("--full", action="store_true",
                    help="full-width 768-d HuBERT-base (default hubert "
                         "config) instead of the 144-d mini; fixture name "
                         "becomes full_ckpt (used by bench.py's fast-vs-"
                         "exact gate)")
    args = ap.parse_args()
    hub_dict = {} if args.full else MINI_HUBERT
    fixture_name = "full_ckpt" if args.full else "mini_ckpt"
    if args.style != "v1":
        fixture_name += f"_{args.style}"

    import jax
    import jax.numpy as jnp

    from sylber_tpu.io.checkpoint import load_params
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.train.loop import train
    from sylber_tpu.train.thresholder import get_threshold

    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}")

    # ---- stage 1: distill onto ground-truth segments ----
    cfg1 = {
        "name": "mini_stage1", "seed": 0,
        "model": _model_cfg(False, None, lr=5e-4 if not args.full else 2e-4,
                            steps=args.stage1_steps, hub_dict=hub_dict),
        "data": _data_cfg(args.n_utts, False, args.batch_size,
                          style=args.style),
        "max_steps": args.stage1_steps,
        # K steps per dispatch: identical math (f32 + threefry here; the
        # loop tests pin loss/param equality), ~1/K the host/dispatch work
        "steps_per_dispatch": args.steps_per_dispatch,
    }
    out1 = os.path.join(args.out_dir, "stage1")
    train(cfg1, out_dir=out1, max_steps=args.stage1_steps, log_every=100,
          ckpt_every=args.stage1_steps)
    params1 = load_params(os.path.join(out1, "params_final"))

    hub = HubertConfig(num_hidden_layers=9, precision="default",
                       **{k: tuple(v) if isinstance(v, list) else v
                          for k, v in hub_dict.items()})

    # ---- thresholder init from measured stage-1 norm stats ----
    thr_stats = measure_norm_stats(params1, hub, style=args.style)
    print("measured norm stats:", json.dumps(thr_stats))

    # ---- stage 2: online segmentation ----
    cfg2 = {
        "name": "mini_stage2", "seed": 1,
        "model": _model_cfg(True, thr_stats, lr=2e-4 if not args.full
                            else 1e-4, steps=args.stage2_steps,
                            hub_dict=hub_dict),
        "data": _data_cfg(args.n_utts, True, args.batch_size,
                          style=args.style),
        "max_steps": args.stage2_steps,
        "steps_per_dispatch": args.steps_per_dispatch,
    }
    out2 = os.path.join(args.out_dir, "stage2")
    state = train(cfg2, out_dir=out2, max_steps=args.stage2_steps,
                  log_every=100, ckpt_every=args.stage2_steps,
                  init_params=params1)
    params2 = jax.device_get(state.params)
    learned_thr = float(np.asarray(jax.device_get(
        get_threshold(state.thresholder))))
    print(f"learned norm threshold: {learned_thr:.4f}")

    # ---- held-out evaluation ----
    results = evaluate(params2, hub, learned_thr, style=args.style)
    print(json.dumps(results, indent=2))

    if args.fixture_dir:
        from sylber_tpu.io.checkpoint import save_params_npz

        fd = Path(args.fixture_dir)
        fd.mkdir(parents=True, exist_ok=True)
        save_params_npz(str(fd / f"{fixture_name}.npz"), params2,
                        dtype=np.float16)
        meta = {"hubert": hub_dict, "encoding_layer": 9,
                "norm_threshold": learned_thr, "merge_threshold": 0.8,
                "thresholder_stats": thr_stats, "style": args.style,
                "train": {"stage1_steps": args.stage1_steps,
                          "stage2_steps": args.stage2_steps,
                          "batch_size": args.batch_size,
                          "n_utts": args.n_utts},
                "eval": results}
        (fd / f"{fixture_name}.json").write_text(json.dumps(meta, indent=2))
        print(f"fixture written to {fd}/{fixture_name}.npz "
              f"({os.path.getsize(fd / (fixture_name + '.npz')) / 1e6:.1f}"
              f" MB)")


if __name__ == "__main__":
    main()

"""End-to-end walkthrough (script version of the reference's demo.ipynb).

1. segment an utterance into syllables,
2. visualize the frame-similarity structure (optional, needs matplotlib),
3. resynthesize articulatory trajectories from the segment features,
4. decode to waveform with the in-framework HiFi-GAN articulatory vocoder
   (--audio-out; the reference delegates this step to the external SPARC
   package, `/root/reference/README.md:92-94` — pass --vocoder-ckpt with
   trained/converted weights for intelligible audio, otherwise the random
   -init vocoder demonstrates the pipeline only).

Run: python examples/demo.py --wav path/to/utt.wav \
        [--ckpt sylber.ckpt] [--synthesis-ckpt synthesis_sylber.ckpt] \
        [--audio-out resynth.wav [--vocoder-ckpt hifigan.pt]]
Without checkpoints it runs random-init end to end (structure demo only).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform

apply_jax_platform()  # axon ignores $JAX_PLATFORMS; force via jax.config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--synthesis-ckpt", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--encoding-layer", type=int, default=9)
    ap.add_argument("--audio-out", default=None,
                    help="write resynthesized waveform here (in-framework "
                         "HiFi-GAN vocoder)")
    ap.add_argument("--vocoder-ckpt", default=None,
                    help="torch HiFi-GAN generator checkpoint to convert")
    ap.add_argument("--spk-emb", default=None,
                    help=".npy speaker embedding (default: zeros)")
    ap.add_argument("--pitch-mean", type=float, default=120.0)
    ap.add_argument("--mini-fixtures", action="store_true",
                    help="run the whole pipeline on the checked-in TRAINED "
                         "mini fixtures (144-d encoder + CFM synthesis + "
                         "HiFi-GAN vocoder, all trained on the synthetic "
                         "corpus) — fully-functional offline demo")
    args = ap.parse_args()

    fixtures = os.path.join(os.path.dirname(__file__), "..", "tests",
                            "fixtures")

    from sylber_tpu import Segmenter

    if args.mini_fixtures:
        import json

        from sylber_tpu.io.checkpoint import load_params_npz
        from sylber_tpu.models.hubert import HubertConfig

        mmeta = json.load(open(os.path.join(fixtures, "mini_ckpt.json")))
        segmenter = Segmenter(
            params=load_params_npz(os.path.join(fixtures, "mini_ckpt.npz")),
            hubert_config=HubertConfig(
                num_hidden_layers=mmeta["encoding_layer"],
                **{k: tuple(v) if isinstance(v, list) else v
                   for k, v in mmeta["hubert"].items()}),
            norm_threshold=mmeta["norm_threshold"],
            merge_threshold=mmeta["merge_threshold"])
    else:
        segmenter = Segmenter(model_ckpt=args.ckpt,
                              encoding_layer=args.encoding_layer)
    out = segmenter(wav_file=args.wav, in_second=True)
    segments = out["segments"]
    print(f"{len(segments)} syllable segments "
          f"({len(segments) / max(out['hidden_states'].shape[0] / 50.0, 1e-9):.2f} tokens/s):")
    for (s, e) in segments[:20]:
        print(f"  [{s:7.3f}s, {e:7.3f}s)")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        h = out["hidden_states"]
        sim = h @ h.T / (np.linalg.norm(h, axis=1)[:, None]
                         * np.linalg.norm(h, axis=1)[None, :] + 1e-8)
        plt.figure(figsize=(8, 8))
        plt.imshow(sim, origin="lower")
        for s, e in (segments * 50).astype(int):
            plt.axvline(s, color="w", lw=0.3)
        plt.savefig("similarity.png", dpi=120)
        print("wrote similarity.png")

    # resynthesis: expand segment features to a frame grid, then sample
    import yaml

    from sylber_tpu import SegmentSynthesis

    if args.mini_fixtures:
        import json

        from sylber_tpu.io.checkpoint import load_params_npz
        from sylber_tpu.synthesis import SynthesisParams
        from sylber_tpu.train.synthesis_loop import synthesis_config_from_dict

        smeta = json.load(open(os.path.join(fixtures, "mini_synth.json")))
        strained = load_params_npz(os.path.join(fixtures, "mini_synth.npz"))
        synth = SegmentSynthesis(
            config=synthesis_config_from_dict(smeta["config"]["model"]),
            params=SynthesisParams(segmenter.params, strained["input_mlp"],
                                   strained["regressor"]))
    else:
        cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                                "sylber_resynthesis.yaml")
        cfg = yaml.safe_load(open(cfg_path))
        synth = SegmentSynthesis(model_ckpt=args.synthesis_ckpt, **cfg)

    # frame-level conditioning: each frame carries its segment's feature
    n_frames = out["hidden_states"].shape[0]
    filled = np.zeros((n_frames, out["hidden_states"].shape[1]), np.float32)
    for (s, e), f in zip((segments * 50).astype(int),
                         out["segment_features"]):
        filled[s:e] = f
    art, _ = synth.resynthesize(features=filled[None], steps=args.steps)
    print(f"articulatory trajectory: {art.shape} "
          f"(12 EMA dims + log-pitch + loudness)")
    np.save("articulation.npy", art[0])
    print("wrote articulation.npy")

    if args.audio_out:
        from sylber_tpu.vocoder import SparcDecoder

        if args.vocoder_ckpt:
            from sylber_tpu.io.torch_convert import (
                hifigan_params_from_torch, torch_load)
            from sylber_tpu.vocoder.sparc import SparcDecoderConfig

            sd = torch_load(args.vocoder_ckpt)
            if isinstance(sd, dict) and "generator" in sd:
                sd = sd["generator"]
            dcfg = SparcDecoderConfig()
            vocoder = SparcDecoder(dcfg, params=hifigan_params_from_torch(
                sd, dcfg.generator))
        else:
            # fall back to the checked-in mini vocoder fixture (trained on
            # synthetic (art, wav) pairs by scripts/train_vocoder_proof.py):
            # tonal, pitch-tracking audio rather than noise
            fx = os.path.join(os.path.dirname(__file__), "..", "tests",
                              "fixtures", "mini_vocoder.npz")
            meta_p = fx.replace(".npz", ".json")
            if os.path.exists(fx) and os.path.exists(meta_p):
                import json

                from sylber_tpu.io.checkpoint import load_params_npz
                from sylber_tpu.vocoder.hifigan import HiFiGANConfig
                from sylber_tpu.vocoder.sparc import SparcDecoderConfig

                meta = json.load(open(meta_p))
                dcfg = SparcDecoderConfig(
                    generator=HiFiGANConfig(**meta["generator"]))
                vocoder = SparcDecoder(dcfg, params=load_params_npz(fx))
                print(f"using mini vocoder fixture {fx} "
                      f"(spec_corr {meta['eval']['spec_corr']:.2f} on "
                      "synthetic held-out)")
            else:
                vocoder = None
                print("note: no --vocoder-ckpt and no mini_vocoder fixture; "
                      "decoding with random-init weights (pipeline demo, "
                      "not intelligible audio)")
        spk = np.zeros(64, np.float32) if args.spk_emb is None \
            else np.load(args.spk_emb).astype(np.float32)
        wav_out = synth.decode_audio(art, spk, pitch_mean=args.pitch_mean,
                                     vocoder=vocoder)[0]
        from scipy.io import wavfile

        wavfile.write(args.audio_out, 16000,
                      np.clip(wav_out * 32767, -32768, 32767).astype(np.int16))
        print(f"wrote {args.audio_out} ({len(wav_out) / 16000.0:.2f}s)")
    else:
        print("pass --audio-out out.wav to decode to waveform in-framework "
              "(or use the external SPARC coder as the reference does)")


if __name__ == "__main__":
    main()

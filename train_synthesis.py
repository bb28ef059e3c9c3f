"""Resynthesis training entry point (BASELINE config #4).

    python train_synthesis.py --config configs/sylber_resynthesis_mini.yaml

Trains the SegmentSynthesis CFM stack (frozen encoder -> conditioning
features -> voicebox Regressor vector field) with the reference trainer
recipe — the reference's own released training forward is broken dead code
(`/root/reference/sylber/model/segment_synthesis.py:152-199`, SURVEY.md
§2.4.3); the intended objective is implemented in
`sylber_tpu.synthesis.make_synthesis_train_step` following
`flowmatching.py:826-871` + `segment_synthesis.py:244-250`.

On this image the (wav, articulatory) corpus is the synthetic syllabic
generator with analytic ground truth; point ``speech_model_ckpt`` at a real
encoder checkpoint and swap the data section for LibriSpeech+SPARC when
available. ``--fixture-dir`` writes the trained trainable params + eval
metrics as a test fixture (mini recipe).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import yaml

from sylber_tpu.utils.platform import apply_jax_platform, enable_compilation_cache

apply_jax_platform()  # axon ignores $JAX_PLATFORMS; must go through jax.config
enable_compilation_cache()  # K=8 scan programs compile ~30 min on the tunnel


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--eval-steps", type=int, default=50,
                    help="ODE steps for the held-out gate (demo uses 50)")
    ap.add_argument("--fixture-dir", default=None,
                    help="write mini_synth fixture (npz + json) here")
    ap.add_argument("--fixture-prefix", default=None,
                    help="fixture basename (default mini_synth, or "
                         "mini_vq_synth with --tokens); rich-corpus runs "
                         "pass e.g. mini_synth_rich to keep the v1 "
                         "fixtures intact")
    ap.add_argument("--tokens", action="store_true",
                    help="jointly train the trainable grouped-residual-VQ "
                         "quantizer in the conditioning path (VQ-VAE style; "
                         "needs model.quantizer_configs in the yaml) and "
                         "gate the full wav->tokens->CFM chain")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    out_dir = args.out_dir or f"runs/{cfg.get('name', 'synthesis')}"

    if args.tokens:
        return _main_tokens(cfg, out_dir, args)

    from sylber_tpu.train.synthesis_loop import train_synthesis

    state, metrics = train_synthesis(
        cfg, out_dir=out_dir, max_steps=args.max_steps,
        log_every=args.log_every, eval_steps=args.eval_steps)

    if args.fixture_dir:
        import jax

        from sylber_tpu.io.checkpoint import save_params_npz

        fx = Path(args.fixture_dir)
        fx.mkdir(parents=True, exist_ok=True)
        base = args.fixture_prefix or "mini_synth"
        params = jax.device_get(state.params)
        save_params_npz(str(fx / f"{base}.npz"),
                        {"input_mlp": params.input_mlp,
                         "regressor": params.regressor})
        meta = {"config": cfg, "eval": metrics}
        (fx / f"{base}.json").write_text(json.dumps(meta, indent=1))
        print(f"fixture written to {fx}/{base}.npz")
    return 0


def _main_tokens(cfg, out_dir, args):
    """--tokens mode: joint quantizer + CFM training, VQ-token fixture."""
    import dataclasses
    import jax

    from sylber_tpu.io.checkpoint import save_params_npz
    from sylber_tpu.train.vq_synthesis import (TrainedVQTokenizer,
                                               train_vq_synthesis)

    state, qcfg, metrics = train_vq_synthesis(
        cfg, out_dir=out_dir, max_steps=args.max_steps,
        log_every=args.log_every, eval_steps=args.eval_steps)

    if args.fixture_dir:
        fx = Path(args.fixture_dir)
        fx.mkdir(parents=True, exist_ok=True)
        base = args.fixture_prefix or "mini_vq_synth"
        tok_name = base.replace("_synth", "_tokenizer")
        tok = TrainedVQTokenizer(jax.device_get(state.quantizer), qcfg)
        tok.save_npz(str(fx / f"{tok_name}.npz"))
        save_params_npz(str(fx / f"{base}.npz"),
                        {"input_mlp": jax.device_get(state.input_mlp),
                         "regressor": jax.device_get(state.regressor)})
        meta = {"config": cfg,
                "quantizer_config": dataclasses.asdict(qcfg),
                "eval": metrics}
        (fx / f"{base}.json").write_text(json.dumps(meta, indent=1))
        print(f"fixtures written to {fx}/{tok_name}.npz + {base}.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Training entry point: `python train.py --config configs/sylber_base.yaml`.

Mirrors the reference CLI (`python train.py --config-name=sylber_base`,
`/root/reference/README.md:75-82`) using plain YAML + argparse (Hydra is not
part of the TPU image). Supports stage hand-off checkpoints:
``speech_model_ckpt`` (encoder init, torch or Orbax) and ``model_ckpt``
(previous-stage Orbax train state params), as in `train.py:44-60`.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import yaml

# Some TPU plugins (axon) ignore the JAX_PLATFORMS env var; enforce it via
# jax.config before any backend initialization.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass

# Persistent XLA cache: tunnel-attached TPU compiles run 30-250 s for
# single-step programs and ~30 MINUTES for the steps_per_dispatch=8 scan
# program (measured, scripts/loop_gap_probe.py) — pay them once.
from sylber_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()


def load_init_params(cfg):
    path = cfg.get("speech_model_ckpt") or cfg.get("model_ckpt")
    if not path:
        return None
    p = Path(path)
    enc_layers = cfg.get("model", {}).get("encoding_layer", 9)
    if p.is_dir():
        from sylber_tpu.io.checkpoint import load_params

        return load_params(str(p))
    from sylber_tpu.io.torch_convert import load_torch_checkpoint

    return load_torch_checkpoint(str(p), num_hidden_layers=enc_layers)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--val-every", type=int, default=None)
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    out_dir = args.out_dir or f"runs/{cfg.get('name', 'sylber')}"
    init_params = load_init_params(cfg)

    from sylber_tpu.train.loop import train

    train(
        cfg,
        out_dir=out_dir,
        max_steps=args.max_steps or cfg.get("max_steps"),
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        val_every=args.val_every,
        limit_val_batches=cfg.get("limit_val_batches", 100),
        init_params=init_params,
    )


if __name__ == "__main__":
    sys.exit(main())

"""Subprocess worker for the multi-process (multi-host) train-loop test.

Each worker acts as one "host": 4 simulated CPU devices, joined into one
8-device global mesh via ``jax.distributed.initialize`` (Gloo collectives
over localhost — the same code path a TPU pod takes over DCN, with Gloo in
place of the TPU runtime's transport). Run as:

    python _mp_worker.py <pid> <nproc> <port> <out_dir> <max_steps> [mp]

Writes ``fingerprint_<pid>.json`` (sum|params|) into ``out_dir`` so the
parent test can assert both processes converged to the identical state.
"""

import json
import os
import sys
from pathlib import Path


def main() -> None:
    pid, nproc, port, out_dir, max_steps = sys.argv[1:6]
    mp = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import jax

    jax.config.update("jax_platforms", "cpu")

    cfg = {
        "name": "mp_test",
        "seed": 0,
        "model": {
            "encoding_layer": 1,
            "hubert": {
                "hidden_size": 32,
                "num_attention_heads": 4,
                "intermediate_size": 64,
                "conv_dim": [16] * 7,
                "num_conv_pos_embeddings": 16,
                "num_conv_pos_embedding_groups": 4,
            },
            "precision": "default",
            "lr": 0.001,
            "warmup_steps": 2,
            "total_steps": 50,
        },
        "data": {
            "synthetic": True,
            "n_utts": 16,
            "max_len": 16000,
            "batch_size": 8,
        },
        "mesh": {"dp": 8 // mp, "mp": mp},
        "distributed": {
            "coordinator_address": f"127.0.0.1:{port}",
            "num_processes": int(nproc),
            "process_id": int(pid),
        },
    }

    from sylber_tpu.parallel.mesh import fetch_global
    from sylber_tpu.train.loop import train

    state = train(cfg, out_dir=out_dir, max_steps=int(max_steps),
                  log_every=1, ckpt_every=2)
    params = fetch_global(state.params)

    import numpy as np

    tot = float(sum(float(np.abs(np.asarray(v)).sum())
                    for v in jax.tree.leaves(params)))
    Path(out_dir, f"fingerprint_{pid}.json").write_text(
        json.dumps({"sum_abs_params": tot,
                    "step": int(fetch_global(state.step))}))


if __name__ == "__main__":
    main()

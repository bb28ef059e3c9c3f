"""Full training-loop smoke: synthetic corpus, checkpoint save + auto-resume."""

import json
import os

import numpy as np
import pytest

TINY_MODEL = {
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
    "lr": 1e-3,
    "warmup_steps": 2,
    "total_steps": 50,
    "do_noise_augment": True,
}


def _cfg(stage2=False):
    model = dict(TINY_MODEL)
    if stage2:
        model.update(segment_online=True, merge_threshold_range=[0.8, 0.9],
                     use_train_thrupdate=True,
                     thresholder_configs={"signal_mean": 6.1,
                                          "signal_var": 0.87,
                                          "noise_mean": 0.34,
                                          "noise_var": 0.34})
    return {
        "name": "smoke",
        "seed": 0,
        "model": model,
        "data": {"synthetic": True, "n_utts": 16, "max_len": 16000,
                 "batch_size": 8, "segment_online_data": stage2},
        "max_steps": 4,
    }


def test_loop_stage1_and_resume(tmp_path):
    from sylber_tpu.train.loop import train

    out = str(tmp_path / "run")
    state = train(_cfg(), out_dir=out, max_steps=3, log_every=1, ckpt_every=1)
    assert int(np.asarray(state.step)) == 3
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert all(np.isfinite(r["loss"]) for r in rows if r["prefix"] == "train")

    # resume continues from step 3
    state2 = train(_cfg(), out_dir=out, max_steps=5, log_every=1, ckpt_every=1)
    assert int(np.asarray(state2.step)) == 5


def test_loop_stage2_online(tmp_path):
    from sylber_tpu.train.loop import train

    out = str(tmp_path / "run2")
    state = train(_cfg(stage2=True), out_dir=out, max_steps=2, log_every=1,
                  ckpt_every=10)
    assert int(np.asarray(state.step)) == 2
    thr = float(np.asarray(state.thresholder.signal_mean))
    assert np.isfinite(thr) and thr != 6.1  # stats moved


def test_stage_handoff(tmp_path):
    """Stage 1 -> params_final export -> stage 2 init from it (the
    reference's cross-stage checkpoint flow, train.py:49-60)."""
    import jax

    from sylber_tpu.io.checkpoint import load_params
    from sylber_tpu.train.loop import train

    out1 = str(tmp_path / "stage1")
    s1 = train(_cfg(), out_dir=out1, max_steps=2, log_every=1, ckpt_every=1)

    params = load_params(out1 + "/params_final")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out2 = str(tmp_path / "stage2")
    s2 = train(_cfg(stage2=True), out_dir=out2, max_steps=1, log_every=1,
               ckpt_every=1, init_params=params)
    assert int(np.asarray(s2.step)) == 1


def test_crash_resume_after_sigkill(tmp_path):
    """Preemption robustness (SURVEY.md §5 — the reference has no recovery
    beyond manual resume_ckpt): SIGKILL a training process mid-run with
    per-step async Orbax saves in flight, then restart. The restart must
    auto-resume from the last COMPLETE checkpoint step (partially-written
    step dirs from the killed async save must not be picked up) and train
    to completion."""
    import subprocess
    import sys
    import time
    from pathlib import Path

    import yaml

    repo = Path(__file__).resolve().parents[2]
    cfg = _cfg()
    cfg["max_steps"] = 50
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "run"
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    p = subprocess.Popen(
        [sys.executable, str(repo / "train.py"), "--config", str(cfg_path),
         "--out-dir", str(out), "--max-steps", "50", "--log-every", "1",
         "--ckpt-every", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=repo)
    try:
        mfile = out / "metrics.jsonl"
        deadline = time.time() + 600
        while time.time() < deadline:
            if mfile.exists() and sum(1 for _ in open(mfile)) >= 3:
                break
            assert p.poll() is None, p.communicate()[0].decode()[-3000:]
            time.sleep(0.5)
        else:
            raise AssertionError("no training progress before deadline")
    finally:
        p.kill()
        p.wait()

    r = subprocess.run(
        [sys.executable, str(repo / "train.py"), "--config", str(cfg_path),
         "--out-dir", str(out), "--max-steps", "30", "--log-every", "1",
         "--ckpt-every", "5"],
        capture_output=True, env=env, cwd=repo, timeout=900)
    log = r.stdout.decode()
    assert r.returncode == 0, log[-3000:] + r.stderr.decode()[-2000:]
    assert "resumed from step" in log
    rows = [json.loads(l) for l in open(mfile)]
    steps = [r2["step"] for r2 in rows if r2["prefix"] == "train"]
    assert max(steps) == 30
    assert all(np.isfinite(r2["loss"]) for r2 in rows
               if r2["prefix"] == "train")

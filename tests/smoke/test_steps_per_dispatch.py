"""steps_per_dispatch: K training steps folded into one jitted lax.scan.

Contract: identical math to the host loop — same batch order (shared
index_stream), same per-step key schedule (fold_in(rng, state.step)), same
metrics rows — so a K-step run must reproduce the 1-step run's losses and
params, including when max_steps is not a multiple of K (single-step
remainder path) and across checkpoint resume.
"""

import json

import numpy as np


def _cfg(spd):
    return {
        "name": "spd", "seed": 0,
        "model": {
            "encoding_layer": 1,
            "hubert": {"hidden_size": 32, "num_attention_heads": 4,
                       "intermediate_size": 64, "conv_dim": [16] * 7,
                       "num_conv_pos_embeddings": 16,
                       "num_conv_pos_embedding_groups": 4},
            "precision": "default", "lr": 1e-3, "warmup_steps": 2,
            "total_steps": 50,
        },
        "data": {"synthetic": True, "n_utts": 16, "max_len": 16000,
                 "batch_size": 8, "device_resident": True},
        "steps_per_dispatch": spd,
    }


def _losses(out_dir):
    return {r["step"]: r["loss"]
            for r in map(json.loads, open(out_dir + "/metrics.jsonl"))
            if r["prefix"] == "train"}


def test_multi_step_dispatch_matches_single_step(tmp_path):
    import jax

    from sylber_tpu.train.loop import train

    d1, d3 = str(tmp_path / "s1"), str(tmp_path / "s3")
    s1 = train(_cfg(1), out_dir=d1, max_steps=6, log_every=1,
               ckpt_every=10 ** 9)
    s3 = train(_cfg(3), out_dir=d3, max_steps=6, log_every=1,
               ckpt_every=10 ** 9)
    l1, l3 = _losses(d1), _losses(d3)
    assert set(l1) == set(l3) == {1, 2, 3, 4, 5, 6}
    for s in l1:
        np.testing.assert_allclose(l3[s], l1[s], rtol=1e-5, err_msg=str(s))
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s3.params))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_multi_step_remainder_and_resume(tmp_path):
    """max_steps=7 with K=3: two scan dispatches + one single-step
    remainder; then resume (restored step is not K-aligned). Checkpoints
    must fire on interval CROSSINGS even though dispatch-boundary steps
    never hit exact multiples of ckpt_every (K=3 vs interval 2: boundaries
    3, 6, 7, 10 — the old exact-modulo policy would save only at 6 and
    silently stop after a non-aligned resume)."""
    import os

    from sylber_tpu.train.loop import train

    d = str(tmp_path / "s7")
    s = train(_cfg(3), out_dir=d, max_steps=7, log_every=1, ckpt_every=2)
    assert int(np.asarray(s.step)) == 7
    saved = sorted(int(x) for x in os.listdir(d + "/ckpts")
                   if x.isdigit())
    assert 3 in saved and 6 in saved, saved  # crossing semantics
    s2 = train(_cfg(3), out_dir=d, max_steps=10, log_every=1, ckpt_every=2)
    assert int(np.asarray(s2.step)) == 10
    saved2 = sorted(int(x) for x in os.listdir(d + "/ckpts")
                    if x.isdigit())
    assert 10 in saved2, saved2  # saves keep firing after resume
    losses = _losses(d)
    # resumed from the latest complete ckpt (6): steps 7..10 re-logged
    assert set(losses) == set(range(1, 11))
    assert np.isfinite(list(losses.values())).all()

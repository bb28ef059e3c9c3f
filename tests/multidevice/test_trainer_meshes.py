"""DP meshes for the synthesis (CFM) and vocoder (GAN) trainers.

The reference's intended resynthesis/vocoder training would have ridden the
same Lightning DDP as distillation (`/root/reference/train.py:91-102`);
here both trainers reuse ``parallel/mesh.py`` (batches shard over ``dp``,
state replicates, GSPMD inserts the gradient psum). These tests pin the
dp=8 loss trajectory to the single-device one on the simulated CPU mesh —
the same bar the distillation loop meets in ``test_dp_tp.py``.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_synthesis_cfg(mesh=None):
    cfg = {
        "name": "mesh_test",
        "seed": 0,
        "model": {
            "encoding_layer": 2,
            "hubert": {
                "hidden_size": 32,
                "num_attention_heads": 4,
                "intermediate_size": 64,
                "conv_dim": [16, 16, 16, 16, 16, 16, 16],
                "num_conv_pos_embeddings": 16,
                "num_conv_pos_embedding_groups": 4,
            },
            "norm_threshold": 0.5,
            "merge_threshold_range": [0.8, 0.8],
            "input_configs": {"output_dim": 16, "hidden_dims": [16],
                              "dropout": 0.0},
            "regressor_configs": {"depth": 1, "dim": 32, "heads": 2,
                                  "dim_head": 16, "dim_in_proj": 16,
                                  "dim_cond_emb": 16, "sigma": 0.0},
        },
        "data": {"synthetic": True, "n_utts": 16, "seconds": 1.0},
        "train": {"batch_size": 8, "lr": 1e-3, "warmup_steps": 1,
                  "max_steps": 4, "min_factor": 1.0},
        "eval": {"n_utts": 2},
    }
    if mesh:
        cfg["mesh"] = mesh
    return cfg


def _loss_rows(out_dir):
    rows = []
    for line in (Path(out_dir) / "metrics.jsonl").read_text().splitlines():
        r = json.loads(line)
        if "cfm_loss" in r:
            rows.append((r["step"], r["cfm_loss"]))
    return rows


def test_synthesis_train_dp_mesh_matches_single(tmp_path):
    """`mesh: {dp: 8}` in the resynthesis yaml: identical loss trajectory
    and final params vs the single-device loop (same seeds/batch order)."""
    from sylber_tpu.train.synthesis_loop import train_synthesis

    s1, _ = train_synthesis(_tiny_synthesis_cfg(),
                            out_dir=str(tmp_path / "single"),
                            max_steps=4, log_every=1, eval_steps=2)
    s8, _ = train_synthesis(_tiny_synthesis_cfg(mesh={"dp": 8}),
                            out_dir=str(tmp_path / "dp8"),
                            max_steps=4, log_every=1, eval_steps=2)

    r1 = _loss_rows(tmp_path / "single")
    r8 = _loss_rows(tmp_path / "dp8")
    assert [s for s, _ in r1] == [s for s, _ in r8]
    np.testing.assert_allclose([v for _, v in r1], [v for _, v in r8],
                               rtol=2e-4)  # GSPMD psum reduction order
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_vocoder_train_step_dp_mesh_matches_single():
    """One vocoder GAN step on a dp=8 mesh == single-device (same state,
    same batch): d_loss/g_loss equal and updated generator params equal."""
    from sylber_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from sylber_tpu.vocoder.hifigan import (HiFiGANConfig,
                                            VocoderTrainConfig,
                                            make_vocoder_train_step)

    gcfg = HiFiGANConfig(in_channels=14, cond_channels=8,
                         upsample_initial_channel=32)
    vcfg = VocoderTrainConfig(model=gcfg)
    init_fn, step_fn = make_vocoder_train_step(vcfg)
    B, T = 8, 16
    state = init_fn(jax.random.PRNGKey(0), t_frames=T, batch=B)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, 14).astype(np.float32))
    wavs = jnp.asarray(
        rng.randn(B, T * gcfg.total_upsample).astype(np.float32) * 0.1)
    cond = jnp.zeros((B, 8))

    step = jax.jit(step_fn)
    s_single, m_single = step(state, feats, wavs, cond)

    mesh = make_mesh(dp=8, mp=1)
    with jax.set_mesh(mesh):
        state_r = jax.tree.map(lambda x: replicated(x, mesh), state)
        fb, wb, cb = shard_batch((feats, wavs, cond), mesh)
        s_mesh, m_mesh = step(state_r, fb, wb, cb)

    for k in ("d_loss", "g_loss", "mel_l1"):
        np.testing.assert_allclose(float(m_single[k]), float(m_mesh[k]),
                                   rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s_single["gen"]),
                    jax.tree.leaves(s_mesh["gen"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)

"""Training smoke tests: tiny model, synthetic audio, a few stage-1/2 steps.

Asserts finite decreasing-ish loss, EMA behavior, thresholder movement, and
masking wiring (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylber_tpu.models.hubert import HubertConfig
from sylber_tpu.train.distill import (
    DistillConfig, init_train_state, make_train_step)

TINY = HubertConfig(
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(16,) * 7,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    precision="default",
)


def _batch(rng, B=2, L=4800, with_segments=True):
    wav = rng.randn(B, L).astype(np.float32)
    n_frames = TINY.feat_extract_output_length(L)
    batch = {
        "input_values": jnp.asarray(wav),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "noise": jnp.asarray(rng.randn(B, L).astype(np.float32)),
    }
    if with_segments:
        MS = n_frames + 1
        segs = np.zeros((B, MS, 2), np.int32)
        counts = np.zeros((B,), np.int32)
        for b in range(B):
            n = rng.randint(2, 5)
            bounds = np.sort(rng.choice(np.arange(1, n_frames), 2 * n, False))
            segs[b, :n] = bounds[: 2 * n].reshape(n, 2)
            counts[b] = n
        batch["segments"] = jnp.asarray(segs)
        batch["num_segments"] = jnp.asarray(counts)
    else:
        batch["segments"] = None
    return batch


def test_stage1_steps_reduce_loss():
    cfg = DistillConfig(model=TINY, ema_decay=1.0, do_noise_augment=True,
                        lr=1e-3, warmup_steps=2)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # frozen teacher: ema params unchanged from init
    init_state = init_train_state(cfg, jax.random.PRNGKey(0))
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.ema_params, init_state.ema_params)
    assert max(jax.tree.leaves(diff)) == 0.0


def test_stage2_online_segmentation_and_threshold_update():
    cfg = DistillConfig(
        model=TINY, ema_decay=1.0, segment_online=True,
        merge_threshold_range=(0.8, 0.9), use_train_thrupdate=True,
        thresholder_decay=0.9, lr=5e-4, warmup_steps=0)
    state = init_train_state(
        cfg, jax.random.PRNGKey(0),
        thresholder_kwargs=dict(signal_mean=6.10, signal_var=0.87,
                                noise_mean=0.34, noise_var=0.34))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(1)
    batch = _batch(rng, with_segments=False)
    thr0 = float(state.thresholder.signal_mean)
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["normthreshold"]))
    # online thresholder stats must move (signal EMA pulled toward data)
    assert float(state.thresholder.signal_mean) != thr0
    assert int(state.step) == 4


def test_ema_decay_tracks_student():
    cfg = DistillConfig(model=TINY, ema_decay=0.5, lr=1e-3, warmup_steps=0)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(2)
    batch = _batch(rng)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    # after 2 steps with decay<1, ema differs from both init and student
    leaf = lambda t: t["layer_0"]["attention"]["q_proj"]["kernel"]
    assert not np.allclose(np.asarray(leaf(state.ema_params)),
                           np.asarray(leaf(state.params)))


def test_span_masking_active():
    cfg = DistillConfig(model=TINY, mask_prob=0.5, min_mask_n=1,
                        max_mask_set=2, lr=1e-3)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(3)
    batch = _batch(rng)
    state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert int(metrics["masked_frames"]) > 0


def test_sylber_facade():
    """Reference-style object API over the functional training stack."""
    import jax.numpy as jnp

    from sylber_tpu import Sylber

    model = Sylber(hubert_config=TINY, segment_online=True,
                   merge_threshold_range=(0.8, 0.9),
                   thresholder_configs={"signal_mean": 6.1,
                                        "signal_var": 0.87,
                                        "noise_mean": 0.34,
                                        "noise_var": 0.34})
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4800).astype(np.float32)
    model.ema_step()
    out = model(wav, noise=rng.randn(2, 4800).astype(np.float32))
    assert np.isfinite(float(out["distillation_loss"]))
    feats, segments, avg = model.segment(wav)
    assert feats.shape[0] == 2 and len(segments) == 2


def test_grad_accumulation():
    """optax.MultiSteps: params update only at accumulation boundaries."""
    cfg = DistillConfig(model=TINY, lr=1e-3, warmup_steps=0,
                        accumulate_grad_batches=2)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(4)
    batch = _batch(rng)
    leaf = lambda s: np.asarray(s.params["layer_0"]["layer_norm"]["scale"])
    p0 = leaf(state)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    assert np.array_equal(leaf(state), p0)      # mid-accumulation: no update
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    assert not np.array_equal(leaf(state), p0)  # boundary: applied


def test_remat_training_matches_loss():
    """jax.checkpoint on encoder layers: same loss, less memory."""
    import dataclasses

    base = DistillConfig(model=TINY, lr=1e-3, warmup_steps=0)
    remat = DistillConfig(model=dataclasses.replace(TINY, remat=True),
                          lr=1e-3, warmup_steps=0)
    rng = np.random.RandomState(6)
    batch = _batch(rng)
    s1 = init_train_state(base, jax.random.PRNGKey(0))
    s2 = init_train_state(remat, jax.random.PRNGKey(0))
    _, m1 = jax.jit(make_train_step(base))(s1, batch, jax.random.PRNGKey(1))
    _, m2 = jax.jit(make_train_step(remat))(s2, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)

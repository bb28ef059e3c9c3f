"""Unit tests: thresholder formula, LR schedule, EMA, noise mixer stats."""

import importlib.util
import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylber_tpu.train.thresholder import (
    get_threshold, thresholder_init, update_stats)
from sylber_tpu.train.lr import cosine_warmup_schedule
from sylber_tpu.train.ema import ema_init, ema_update
from sylber_tpu.data.noise import NoiseMixerConfig, mix_noise

REF = "/root/reference"


def _ref_module(rel):
    spec = importlib.util.spec_from_file_location(
        "refmod_" + rel.replace("/", "_"), os.path.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_threshold_formula_matches_reference():
    torch = pytest.importorskip("torch")
    mod = _ref_module("sylber/utils/segment_utils.py")
    rng = np.random.RandomState(0)
    for _ in range(10):
        sm, sv = rng.uniform(3, 9), rng.uniform(0.2, 2.0)
        nm, nv = rng.uniform(0.1, 1.0), rng.uniform(0.1, 1.0)
        ref_thr = mod.Thresholder(sm, sv, nm, nv)
        want = float(ref_thr.get_threshold())
        got = float(get_threshold(thresholder_init(sm, sv, nm, nv)))
        assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (sm, sv, nm, nv)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_threshold_update_matches_reference():
    torch = pytest.importorskip("torch")
    mod = _ref_module("sylber/utils/segment_utils.py")
    rng = np.random.RandomState(1)
    ref = mod.Thresholder(6.10, 0.87, 0.34, 0.34, decay=0.99)
    state = thresholder_init(6.10, 0.87, 0.34, 0.34)
    for _ in range(5):
        sig = rng.uniform(4, 9, size=37).astype(np.float32)
        noi = rng.uniform(0.0, 1.0, size=23).astype(np.float32)
        ref.update_stats(torch.from_numpy(sig), torch.from_numpy(noi))
        state = update_stats(state, signal=jnp.asarray(sig),
                             noise=jnp.asarray(noi), decay=0.99)
    np.testing.assert_allclose(float(state.signal_mean),
                               float(ref.signal_mean), rtol=1e-5)
    np.testing.assert_allclose(float(state.signal_var),
                               float(ref.signal_var), rtol=1e-5)
    np.testing.assert_allclose(float(state.noise_mean),
                               float(ref.noise_mean), rtol=1e-5)
    np.testing.assert_allclose(float(state.noise_var),
                               float(ref.noise_var), rtol=1e-5)
    np.testing.assert_allclose(float(get_threshold(state)),
                               float(ref.get_threshold()), rtol=1e-4)


def test_threshold_fixed_mode():
    state = thresholder_init(threshold=2.6)
    assert float(get_threshold(state)) == float(np.float32(2.6))
    updated = update_stats(state, signal=jnp.ones(5) * 9.0)
    assert float(get_threshold(updated)) == float(np.float32(2.6))
    assert float(updated.signal_mean) == float(state.signal_mean)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_lr_schedule_matches_reference():
    mod = _ref_module("sylber/utils/lr_schedule.py")
    ref = mod.COSLRLAMBDA(warmup_steps=500, total_steps=20000, min_factor=0.05,
                          hold_steps=100)
    sched = cosine_warmup_schedule(1.0, 500, 20000, 0.05, 100)
    for step in [0, 1, 250, 499, 500, 501, 5000, 10000, 20599, 20600, 20601,
                 50000]:
        want = ref(step)
        got = float(sched(step))
        assert abs(got - want) < 1e-6, step


def test_ema_update():
    params = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    ema = ema_init(params)
    new_params = {"a": jnp.ones(3) * 3, "b": {"c": jnp.ones(2)}}
    out = ema_update(ema, new_params, 0.9)
    np.testing.assert_allclose(out["a"], 0.9 * 1 + 0.1 * 3)
    np.testing.assert_allclose(out["b"]["c"], 0.1)
    # decay=1.0 freezes the teacher (reference configs)
    frozen = ema_update(ema, new_params, 1.0)
    np.testing.assert_allclose(frozen["a"], ema["a"])


def test_noise_mixer_statistics():
    cfg = NoiseMixerConfig(augment_prob=0.5, utterance_mix_ratio=0.0,
                           magnitude_range=(0.3, 0.3))
    B, L = 512, 400
    wav = jnp.ones((B, L))
    noise = jnp.ones((B, L)) * 2.0
    out = mix_noise(jax.random.PRNGKey(0), wav, noise, cfg)
    deltas = np.asarray(out - wav)[:, 0]
    # augmented items get exactly magnitude*noise added; others unchanged
    aug = np.isclose(deltas, 0.6)
    clean = np.isclose(deltas, 0.0)
    assert (aug | clean).all()
    assert 0.35 < aug.mean() < 0.65  # ~augment_prob

    # utterance mixing replaces noise with a ramped shuffled utterance
    cfg2 = NoiseMixerConfig(augment_prob=1.0, utterance_mix_ratio=1.0,
                            magnitude_range=(0.2, 0.2),
                            utterance_magnitude_max_scale=0.2)
    out2 = mix_noise(jax.random.PRNGKey(1), wav, noise, cfg2)
    d2 = np.asarray(out2 - wav)
    assert d2.max() <= 0.2 + 1e-5  # capped magnitude, ramp in [0,1], wav=1
    assert (np.isclose(d2[:, 0], 0.0) | np.isclose(d2[:, -1], 0.0)).all()


def test_noise_mixer_no_augment_identity():
    cfg = NoiseMixerConfig(augment_prob=0.0)
    wav = jax.random.normal(jax.random.PRNGKey(2), (4, 100))
    noise = jax.random.normal(jax.random.PRNGKey(3), (4, 100))
    out = mix_noise(jax.random.PRNGKey(4), wav, noise, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(wav), atol=1e-6)


def test_ema_fp32_shadow_tracks_f32_run():
    """bf16 params + fp32-shadow EMA must track an all-f32 EMA run;
    a bf16-accumulated EMA underflows the (1-decay) increments and freezes
    (VERDICT r1 #8; reference fp32 shadow: ema_module.py:79-109)."""
    import jax.numpy as jnp
    import numpy as np

    from sylber_tpu.train.ema import ema_init, ema_restore, ema_update

    rng = np.random.RandomState(0)
    p32 = {"w": rng.randn(64).astype(np.float32)}
    decay = 0.999
    steps = 300

    ema32 = ema_init({"w": jnp.asarray(p32["w"])})
    ema_bf = ema_init({"w": jnp.asarray(p32["w"], jnp.bfloat16)})
    ema_sh = ema_init({"w": jnp.asarray(p32["w"], jnp.bfloat16)},
                      fp32_shadow=True)
    assert ema_sh["w"].dtype == jnp.float32

    cur = p32["w"].copy()
    for t in range(steps):
        cur = cur + rng.randn(64).astype(np.float32) * 0.01
        ema32 = ema_update(ema32, {"w": jnp.asarray(cur)}, decay)
        ema_bf = ema_update(ema_bf, {"w": jnp.asarray(cur, jnp.bfloat16)},
                            decay)
        ema_sh = ema_update(ema_sh, {"w": jnp.asarray(cur, jnp.bfloat16)},
                            decay)

    ref = np.asarray(ema32["w"])
    err_shadow = np.abs(np.asarray(ema_sh["w"]) - ref).max()
    err_bf16 = np.abs(np.asarray(ema_bf["w"], np.float32) - ref).max()
    # shadow matches the f32 run to ~bf16-input noise; raw bf16 EMA is
    # at least 10x worse (increments underflow the 8-bit mantissa)
    assert err_shadow < 5e-3, err_shadow
    assert err_bf16 > 10 * max(err_shadow, 1e-6), (err_bf16, err_shadow)

    # restore casts the shadow back to the student dtype
    restored = ema_restore(ema_sh, {"w": jnp.zeros(64, jnp.bfloat16)})
    assert restored["w"].dtype == jnp.bfloat16


def test_train_state_uses_shadow_for_low_precision_decay():
    import jax
    import jax.numpy as jnp

    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.train.distill import DistillConfig, init_train_state

    cfg = DistillConfig(
        model=HubertConfig(hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=4, intermediate_size=64,
                           conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                           num_conv_pos_embedding_groups=4,
                           precision="default"),
        ema_decay=0.999)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    # f32 params: shadow is a no-op, EMA leaves match param dtype
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.ema_params))

    bf16_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), state.params)
    state2 = init_train_state(cfg, jax.random.PRNGKey(0), params=bf16_params)
    # bf16 params + decay < 1: EMA master is fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state2.ema_params))

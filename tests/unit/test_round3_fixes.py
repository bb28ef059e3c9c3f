"""Regression tests for round-3 advisor/judge findings."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_device_stream_rejects_undersized_dataset():
    """batch_size > len(ds) used to busy-spin forever (drop-last epoch loop
    yields nothing); it must be a loud error."""
    from sylber_tpu.data.dataset import SyntheticSpeechDataset
    from sylber_tpu.data.device import device_stream
    from sylber_tpu.parallel.mesh import make_mesh

    ds = SyntheticSpeechDataset(n_utts=2, max_len=8000)
    mesh = make_mesh(mp=1)
    with pytest.raises(ValueError, match="batch_size"):
        device_stream(ds, batch_size=4, mesh=mesh)


def test_forced_analytic_frontend_warns_when_demoted():
    """frontend_l0_analytic=True with conv_bias=True cannot take the analytic
    path; the user must be told instead of a silent fallback."""
    from sylber_tpu.models.hubert import HubertConfig, HubertModel

    cfg = HubertConfig(num_hidden_layers=1, hidden_size=32,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4,
                       conv_bias=True, frontend_l0_analytic=True)
    model = HubertModel(cfg)
    wav = jnp.zeros((1, 4000))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        model.init_params(jax.random.PRNGKey(0), example_len=4000)
    assert any("frontend_l0_analytic" in str(w.message) for w in rec)

    # auto mode (None) must stay silent on the same config
    cfg2 = HubertConfig(num_hidden_layers=1, hidden_size=32,
                        num_attention_heads=4, intermediate_size=64,
                        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                        num_conv_pos_embedding_groups=4,
                        conv_bias=True, frontend_l0_analytic=None)
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        HubertModel(cfg2).init_params(jax.random.PRNGKey(0),
                                      example_len=4000)
    assert not any("frontend_l0_analytic" in str(w.message) for w in rec2)


def test_facade_merge_threshold_is_seeded():
    """The Sylber façade's merge-threshold draw comes from its own PRNG
    stream: same seed -> same draws; the global numpy RNG is untouched."""
    from sylber_tpu.models.sylber import Sylber
    from sylber_tpu.models.hubert import HubertConfig

    hc = HubertConfig(num_hidden_layers=1, hidden_size=32,
                      num_attention_heads=4, intermediate_size=64,
                      conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                      num_conv_pos_embedding_groups=4)
    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32)

    def draws(seed):
        m = Sylber(encoding_layer=1, hubert_config=hc, seed=seed,
                   merge_threshold_range=(0.5, 0.9))
        np.random.seed(1234)
        before = np.random.get_state()[1][:4].copy()
        feats, _, _ = m.segment(wav, normthreshold=0.1)
        np.random.seed(1234)
        after = np.random.get_state()[1][:4].copy()
        np.testing.assert_array_equal(before, after)
        # draw twice more via the private stream to fingerprint the sequence
        import jax as _jax

        return [float(_jax.random.uniform(m._next_rng())) for _ in range(3)]

    assert draws(5) == draws(5)
    assert draws(5) != draws(6)


def test_decode_audio_warns_on_random_init_vocoder():
    from sylber_tpu.vocoder import SparcDecoder

    dec = SparcDecoder()
    assert dec.random_init

    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig
    from sylber_tpu.models.voicebox import RegressorConfig

    cfg = SynthesisConfig(
        regressor=RegressorConfig(dim=32, depth=1, dim_head=8, heads=4,
                                  dim_in_proj=8, dim_cond_emb=16,
                                  num_register_tokens=0),
        input_output_dim=16, input_hidden_dims=(32,))
    synth = SegmentSynthesis(config=cfg)
    art = np.zeros((1, 10, 14), np.float32)
    spk = np.zeros((1, 64), np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        synth.decode_audio(art, spk, vocoder=dec)
    assert any("random-init" in str(w.message) for w in rec)

    # a decoder constructed with explicit params is treated as trained
    trained = SparcDecoder(params=dec.params)
    assert not trained.random_init
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        synth.decode_audio(art, spk, vocoder=trained)
    assert not any("random-init" in str(w.message) for w in rec2)


def test_expand_feature_batched_rows_differ():
    """Device-side expansion must honor per-row duration layouts (equal
    totals, different distributions)."""
    from sylber_tpu.synthesis import expand_feature

    fts = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    durs = np.array([[[2, 1], [1, 0], [3, 2]],
                     [[1, 0], [4, 1], [2, 1]]], np.int32)
    out = np.asarray(expand_feature(fts, jnp.asarray(durs)))
    assert out.shape == (2, 9, 4)

    def ref_row(f, d):
        segs = []
        for j in range(3):
            segs += [f[j]] * d[j][0] + [np.zeros(4)] * d[j][1]
        return np.stack(segs)

    for b in range(2):
        np.testing.assert_array_equal(out[b], ref_row(np.asarray(fts)[b],
                                                      durs[b]))


def test_fused_qkv_param_tree_and_output_parity():
    """fused_qkv=True keeps the exact q/k/v param tree and matches the
    unfused path at fp32/highest precision."""
    import dataclasses

    from sylber_tpu.models.hubert import HubertConfig, HubertModel

    base = HubertConfig(num_hidden_layers=2, hidden_size=64,
                        num_attention_heads=4, intermediate_size=128,
                        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                        num_conv_pos_embedding_groups=4,
                        precision="highest")
    fused = dataclasses.replace(base, fused_qkv=True)
    m0, m1 = HubertModel(base), HubertModel(fused)
    p0 = m0.init_params(jax.random.PRNGKey(0), example_len=4000)
    p1 = m1.init_params(jax.random.PRNGKey(0), example_len=4000)
    # identical tree structure AND identical initial values (same rng path)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    wav = jnp.asarray(np.random.RandomState(0).randn(2, 4000), jnp.float32)
    mask = jnp.ones((2, 4000), jnp.int32)
    y0 = m0.apply({"params": p0}, wav, mask)
    y1 = m1.apply({"params": p0}, wav, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)


def test_gelu_tanh_knob_resolution():
    """gelu_tanh=None auto-resolves per compute dtype (tanh off f32, on
    otherwise); forced values override; f32 parity paths keep exact erf."""
    from sylber_tpu.models.hubert import HubertConfig

    auto = HubertConfig()
    assert auto.gelu_approximate is False            # f32 default => erf
    assert auto.gelu_approx_for(jnp.float32) is False
    assert auto.gelu_approx_for(jnp.bfloat16) is True
    fast = HubertConfig(dtype=jnp.bfloat16)
    assert fast.gelu_approximate is True
    forced_off = HubertConfig(dtype=jnp.bfloat16, gelu_tanh=False)
    assert forced_off.gelu_approximate is False
    assert forced_off.gelu_approx_for(jnp.bfloat16) is False
    forced_on = HubertConfig(gelu_tanh=True)
    assert forced_on.gelu_approx_for(jnp.float32) is True


def test_gelu_tanh_changes_bf16_output_but_not_f32():
    """The knob must actually reach the compute graph: flipping it changes
    bf16-encoder outputs (tanh vs erf differ by ~1e-3 pre-rounding) and,
    with auto, the f32 path is bit-identical to forced-erf."""
    from sylber_tpu.models.hubert import HubertConfig, HubertModel

    base = dict(num_hidden_layers=1, hidden_size=32, num_attention_heads=4,
                intermediate_size=64, conv_dim=(16,) * 7,
                num_conv_pos_embeddings=16,
                num_conv_pos_embedding_groups=4)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(1, 4000).astype(np.float32))
    mask = jnp.ones((1, 4000), jnp.int32)

    cfg_f32 = HubertConfig(**base)
    p = HubertModel(cfg_f32).init_params(jax.random.PRNGKey(0),
                                         example_len=4000)
    y_auto = HubertModel(cfg_f32).apply({"params": p}, wav, mask)
    y_erf = HubertModel(HubertConfig(**base, gelu_tanh=False)).apply(
        {"params": p}, wav, mask)
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_erf))

    y_tanh = HubertModel(HubertConfig(**base, gelu_tanh=True)).apply(
        {"params": p}, wav, mask)
    diff = np.abs(np.asarray(y_tanh) - np.asarray(y_auto)).max()
    assert 0 < diff < 0.1, diff


def test_frozen_teacher_step_skips_ema_and_matches_decay_path():
    """ema_decay=1.0 short-circuits the EMA tree_map; the teacher tree must
    be the SAME object (no copy) and training semantics must match the
    pre-shortcut behavior (teacher frozen at init)."""
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.train.distill import (DistillConfig, init_train_state,
                                          make_train_step)

    hub = HubertConfig(num_hidden_layers=1, hidden_size=32,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4)
    cfg = DistillConfig(model=hub, ema_decay=1.0, lr=1e-3,
                        warmup_steps=0, total_steps=10, segment_online=True)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    batch = {
        "input_values": jnp.asarray(
            np.random.RandomState(1).randn(2, 8000).astype(np.float32)),
        "attention_mask": jnp.ones((2, 8000), jnp.int32),
    }
    s1, m1 = step(state, batch, jax.random.PRNGKey(2))
    leaves0 = jax.tree.leaves(state.ema_params)
    leaves1 = jax.tree.leaves(s1.ema_params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params actually moved (optimizer applied) and loss is finite
    assert np.isfinite(float(m1["loss"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(s1.params)))
    assert moved

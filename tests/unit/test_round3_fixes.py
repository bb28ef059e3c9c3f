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

"""Flow-matching stack tests: sampler, norms, regressor, quantizers, API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylber_tpu.flow.cfm import cfm_loss, mask_from_frac_lengths, sample_midpoint
from sylber_tpu.flow.quantizer import (
    GroupedResidualVQConfig, KMQuantizer, ResidualKMQuantizer,
    QuantizerConfig, quantizer_decode, quantizer_forward, quantizer_init,
    vq_decode, vq_encode, vq_forward, vq_init)
from sylber_tpu.models.voicebox import Regressor, RegressorConfig

TINY_REG = RegressorConfig(dim=32, depth=2, dim_head=8, heads=4,
                           dim_in_proj=8, dim_cond_emb=16, dim_out=14,
                           num_register_tokens=4,
                           conv_pos_embed_kernel_size=5)


def test_midpoint_sampler_exponential_flow():
    """dx/dt = x integrated from y0 over [0,1] -> e * y0 (midpoint is 2nd
    order: error ~ 1/steps^2)."""
    def field(x, t):
        return x

    y0_scale = 1.0
    cond = jnp.zeros((2, 3, 14))
    out_coarse = sample_midpoint(field, jax.random.PRNGKey(0), cond, 14,
                                 steps=5, rand_scale=y0_scale)
    out_fine = sample_midpoint(field, jax.random.PRNGKey(0), cond, 14,
                               steps=60, rand_scale=y0_scale)
    y0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 14)) * y0_scale
    np.testing.assert_allclose(np.asarray(out_fine), np.e * np.asarray(y0),
                               rtol=2e-3)
    err_c = np.abs(np.asarray(out_coarse) - np.e * np.asarray(y0)).max()
    err_f = np.abs(np.asarray(out_fine) - np.e * np.asarray(y0)).max()
    assert err_f < err_c


def test_midpoint_steps1_returns_y0():
    cond = jnp.zeros((1, 4, 14))
    out = sample_midpoint(lambda x, t: x * 100, jax.random.PRNGKey(3), cond,
                          14, steps=1, rand_scale=0.7)
    y0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 14)) * 0.7
    np.testing.assert_allclose(np.asarray(out), np.asarray(y0))


def test_mask_from_frac_lengths():
    m = mask_from_frac_lengths(jax.random.PRNGKey(0), 64, 100, (0.7, 1.0))
    m = np.asarray(m)
    lens = m.sum(1)
    assert (lens >= 69).all() and (lens <= 100).all()
    # contiguity: exactly one rising edge
    for row in m:
        d = np.diff(row.astype(int))
        assert (d == 1).sum() <= 1 and (d == -1).sum() <= 1


def test_regressor_shapes_and_time_conditioning():
    reg = Regressor(TINY_REG)
    x = jnp.ones((2, 7, 14))
    emb = jnp.ones((2, 7, 16))
    params = reg.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                      cond_emb=emb)["params"]
    o1 = reg.apply({"params": params}, x, jnp.asarray(0.1), cond_emb=emb)
    o2 = reg.apply({"params": params}, x, jnp.asarray(0.9), cond_emb=emb)
    assert o1.shape == (2, 7, 14)
    # AdaptiveRMSNorm is identity-initialized (zero gamma/beta kernels,
    # flowmatching.py:253-259), so time has no effect at init...
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    # ...but conditions the output once the gamma projection is non-zero.
    params = jax.tree.map(lambda x: x, params)
    params["transformer"]["attn_norm_0"]["to_gamma"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), (TINY_REG.time_hidden,
                                                   TINY_REG.dim)) * 0.1)
    o1 = reg.apply({"params": params}, x, jnp.asarray(0.1), cond_emb=emb)
    o2 = reg.apply({"params": params}, x, jnp.asarray(0.9), cond_emb=emb)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-5


def test_cfm_loss_decreases_on_toy_problem():
    import optax

    reg = Regressor(TINY_REG)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 14))
    emb = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 16))
    params = reg.init(rng, x1, jnp.zeros((1,)), cond_emb=emb)["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def apply_fn_builder(p):
        def apply_fn(w, times, c_x1, cond_emb, mask, cond_mask, kd, train):
            return reg.apply({"params": p}, w, times, cond=c_x1,
                             cond_emb=cond_emb, self_attn_mask=mask,
                             cond_mask=cond_mask, deterministic=True)
        return apply_fn

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return cfm_loss(apply_fn_builder(p), key, x1, cond_emb=emb)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_km_quantizer_nearest_and_decode():
    rng = np.random.RandomState(0)
    centroids = rng.randn(50, 16).astype(np.float32)
    q = KMQuantizer(centroids)
    x = rng.randn(3, 7, 16).astype(np.float32)
    idx = np.asarray(q.get_indices(jnp.asarray(x)))
    want = np.argmin(((x[..., None, :] - centroids) ** 2).sum(-1), axis=-1)
    assert (idx == want).all()
    dec = np.asarray(q.decode(jnp.asarray(idx)))
    np.testing.assert_allclose(dec, centroids[idx])


def test_residual_km_quantizer_improves_reconstruction():
    rng = np.random.RandomState(1)
    c1 = rng.randn(32, 8).astype(np.float32)
    c2 = rng.randn(32, 8).astype(np.float32) * 0.3
    q1 = KMQuantizer(c1)
    q2 = ResidualKMQuantizer(c1, c2)
    x = rng.randn(100, 8).astype(np.float32)
    e1 = np.abs(np.asarray(q1.decode(q1.get_indices(jnp.asarray(x)))) - x).mean()
    idx = q2.get_indices(jnp.asarray(x))
    e2 = np.abs(np.asarray(q2.decode(idx)) - x).mean()
    assert e2 < e1


def test_grouped_residual_vq_roundtrip():
    cfg = GroupedResidualVQConfig(dim=16, groups=2, num_quantizers=3,
                                  codebook_size=64)
    st = vq_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 9, 16)) * 0.02
    idx = vq_encode(st, cfg, x)
    assert idx.shape == (5, 9, 6)
    dec = vq_decode(st, cfg, idx)
    assert dec.shape == x.shape
    q, idx2, commit = vq_forward(st, cfg, x)
    assert (np.asarray(idx2) == np.asarray(idx)).all()
    assert float(commit) >= 0
    # straight-through: grads flow to x
    g = jax.grad(lambda xx: vq_forward(st, cfg, xx)[0].sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_trainable_quantizer_blank_zero():
    cfg = QuantizerConfig(input_dim=24, output_dim=16, hidden_dims=(32,),
                          pitch_emb_dim=4,
                          art_vq=GroupedResidualVQConfig(dim=12),
                          pitch_vq=GroupedResidualVQConfig(dim=4))
    st = quantizer_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 24))
    x = x.at[0, 2].set(0.0)  # blank token
    out = quantizer_forward(st, cfg, x)
    assert np.asarray(out["non_quantized"])[0, 2].sum() == 0.0
    dec = quantizer_decode(st, cfg, out["indices"])
    assert dec.shape == (2, 5, 16)


def test_segment_synthesis_api_smoke():
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig
    from sylber_tpu.models.hubert import HubertConfig

    cfg = SynthesisConfig(
        encoding_layer=1,
        hubert=HubertConfig(num_hidden_layers=1, hidden_size=32,
                            num_attention_heads=4, intermediate_size=64,
                            conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                            num_conv_pos_embedding_groups=4,
                            precision="default"),
        regressor=TINY_REG,
        input_output_dim=16, input_hidden_dims=(32,),
    )
    synth = SegmentSynthesis(config=cfg,
                             thresholder_configs={"threshold": 1.0})
    # feature path
    rng = np.random.RandomState(0)
    feats = rng.randn(1, 12, 32).astype(np.float32)
    feats[0, 4] = 0.0  # blank
    art, segs = synth.resynthesize(features=feats, steps=4, rand_scale=0.5)
    assert art.shape == (1, 12, 14) and segs is None
    assert np.isfinite(art).all()
    # wav path
    wav = rng.randn(1, 8000).astype(np.float32)
    art2, segs2 = synth.resynthesize(input_values=wav, steps=2)
    assert art2.shape[0] == 1 and art2.shape[2] == 14
    assert isinstance(segs2, list)


def test_synthesis_train_loss_decreases():
    import optax

    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig
    from sylber_tpu.models.hubert import HubertConfig

    cfg = SynthesisConfig(
        encoding_layer=1,
        hubert=HubertConfig(num_hidden_layers=1, hidden_size=32,
                            num_attention_heads=4, intermediate_size=64,
                            conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                            num_conv_pos_embedding_groups=4,
                            precision="default"),
        regressor=TINY_REG,
        input_output_dim=16, input_hidden_dims=(32,),
    )
    synth = SegmentSynthesis(config=cfg)
    rng = np.random.RandomState(0)
    batch = {
        "features": jnp.asarray(rng.randn(2, 10, 32).astype(np.float32)),
        "art": jnp.asarray(rng.randn(2, 10, 14).astype(np.float32)),
    }
    opt = optax.adam(1e-3)
    params = synth.params
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: synth.loss(p, batch, key))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(20):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_synthesis_train_step_api():
    from sylber_tpu.synthesis import (
        SegmentSynthesis, SynthesisConfig, init_synthesis_train_state,
        make_synthesis_optimizer, make_synthesis_train_step)
    from sylber_tpu.models.hubert import HubertConfig

    cfg = SynthesisConfig(
        encoding_layer=1,
        hubert=HubertConfig(num_hidden_layers=1, hidden_size=32,
                            num_attention_heads=4, intermediate_size=64,
                            conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                            num_conv_pos_embedding_groups=4,
                            precision="default"),
        regressor=TINY_REG,
        input_output_dim=16, input_hidden_dims=(32,),
    )
    synth = SegmentSynthesis(config=cfg)
    opt = make_synthesis_optimizer(lr=1e-3, warmup_steps=1)
    state = init_synthesis_train_state(synth, opt)
    step = jax.jit(make_synthesis_train_step(synth, opt))
    rng = np.random.RandomState(0)
    batch = {
        "features": jnp.asarray(rng.randn(2, 10, 32).astype(np.float32)),
        "art": jnp.asarray(rng.randn(2, 10, 14).astype(np.float32)),
    }
    hubert_before = state.params.hubert
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["cfm_loss"]))
    # frozen encoder: untouched
    same = jax.tree.map(lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
                        state.params.hubert, hubert_before)
    assert all(jax.tree.leaves(same))
    assert int(state.step) == 3


def test_ode_methods_agree_on_smooth_field():
    from sylber_tpu.flow.cfm import sample_midpoint

    cond = jnp.zeros((1, 4, 14))

    def field(x, t):
        return -x + 0.5

    outs = {m: np.asarray(sample_midpoint(field, jax.random.PRNGKey(0), cond,
                                          14, steps=40, rand_scale=1.0,
                                          method=m))
            for m in ("euler", "midpoint", "rk4")}
    np.testing.assert_allclose(outs["midpoint"], outs["rk4"], atol=1e-3)
    np.testing.assert_allclose(outs["euler"], outs["rk4"], atol=2e-2)


def test_kmeans_recovers_clusters():
    from sylber_tpu.flow.kmeans import fit_kmeans

    rng = np.random.RandomState(0)
    true = rng.randn(8, 16).astype(np.float32) * 5
    x = np.concatenate([true[i] + rng.randn(200, 16).astype(np.float32) * 0.1
                        for i in range(8)])
    centroids, inertia = fit_kmeans(x, 8, batch_size=256, n_epochs=8)
    assert centroids.shape == (8, 16)
    assert inertia < 0.5
    # every true center has a close learned centroid
    d = np.sqrt(((true[:, None] - centroids[None]) ** 2).sum(-1)).min(1)
    assert (d < 0.5).all(), d


def test_synthesis_orbax_roundtrip(tmp_path):
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig
    from sylber_tpu.models.hubert import HubertConfig

    cfg = SynthesisConfig(
        encoding_layer=1,
        hubert=HubertConfig(num_hidden_layers=1, hidden_size=32,
                            num_attention_heads=4, intermediate_size=64,
                            conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                            num_conv_pos_embedding_groups=4,
                            precision="default"),
        regressor=TINY_REG, input_output_dim=16, input_hidden_dims=(32,),
    )
    a = SegmentSynthesis(config=cfg)
    a.save(str(tmp_path / "ck"))
    b = SegmentSynthesis(config=cfg, model_ckpt=str(tmp_path / "ck"))
    for wa, wb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))


def test_expand_feature():
    from sylber_tpu.synthesis import expand_feature

    fts = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    # (voiced_len, gap_len) per segment; totals equal across batch
    durs = jnp.asarray(np.array([[[2, 1], [1, 0], [3, 2]]], np.int32))
    out = np.asarray(expand_feature(fts, durs))
    assert out.shape == (1, 9, 4)
    np.testing.assert_array_equal(out[0, 0], out[0, 1])      # repeat
    assert (out[0, 2] == 0).all()                            # gap token
    np.testing.assert_array_equal(out[0, 3], np.asarray(fts)[0, 1])
    assert (out[0, -2:] == 0).all()


def test_cfg_cond_scale_semantics():
    """Classifier-free guidance (`flowmatching.py:566-579,754`):
    cond_scale=1 is a single conditioned pass; cond_scale != 1 adds a
    null-conditioning pass combined as null + (cond - null) * scale."""
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig

    cfg = SynthesisConfig(regressor=TINY_REG, input_output_dim=16,
                          input_hidden_dims=(32,))
    synth = SegmentSynthesis(config=cfg)
    rng = np.random.RandomState(7)
    feats = rng.randn(2, 6, 768).astype(np.float32)

    # with rand_scale=0 and one euler interval (steps=2, ts=[0,1], h=1):
    # y1 = field(0, t=0) exactly
    cond = synth._cond_from_features(jnp.asarray(feats))
    x0 = jnp.zeros((2, 6, 14), jnp.float32)
    t0 = jnp.zeros(())
    out_c = synth.regressor.apply({"params": synth.params.regressor}, x0, t0,
                                  cond_emb=cond)
    out_n = synth.regressor.apply({"params": synth.params.regressor}, x0, t0,
                                  cond_emb=jnp.zeros_like(cond))

    for scale in (1.0, 2.5):
        expect = np.array(out_n + (out_c - out_n) * scale)
        expect[..., 12] /= cfg.pitch_amp
        got, _ = synth.resynthesize(features=feats, steps=2, method="euler",
                                    rand_scale=0.0, cond_scale=scale)
        # jit-vs-eager fusion differences at default matmul precision
        np.testing.assert_allclose(got, expect, rtol=5e-3, atol=2e-3)

    # guidance must actually move the output (the null pass is a real
    # conditioning drop, unlike the reference's unread cond_drop_prob)
    base, _ = synth.resynthesize(features=feats, steps=2, method="euler",
                                 rand_scale=0.0, cond_scale=1.0)
    guided, _ = synth.resynthesize(features=feats, steps=2, method="euler",
                                   rand_scale=0.0, cond_scale=2.5)
    assert np.abs(guided - base).max() > 0.1

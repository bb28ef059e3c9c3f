"""Vocoder: generator/discriminator shapes, torch parity, training smoke.

The torch-parity test builds a real PyTorch HiFi-GAN generator (jik876
layout: weight-normed Conv1d/ConvTranspose1d, flat resblock list) inline,
runs it, converts its state_dict with `hifigan_params_from_torch`, and
asserts the flax Generator reproduces the waveform — validating conv
transpose layout/flip, weight-norm folding, and MRF wiring in one shot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg(cond=0):
    from sylber_tpu.vocoder.hifigan import HiFiGANConfig

    return HiFiGANConfig(
        in_channels=14, cond_channels=cond, upsample_initial_channel=32,
        upsample_rates=(5, 4, 2), upsample_kernel_sizes=(11, 8, 4),
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)))


def test_generator_shapes_and_range():
    from sylber_tpu.vocoder.hifigan import Generator

    cfg = _tiny_cfg()
    gen = Generator(cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 25, 14), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), feats)["params"]
    wav = gen.apply({"params": params}, feats)
    assert wav.shape == (2, 25 * cfg.total_upsample)  # exact 40x upsampling
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_discriminators_shapes():
    from sylber_tpu.vocoder.hifigan import (MultiPeriodDiscriminator,
                                            MultiScaleDiscriminator)

    wav = jnp.asarray(np.random.RandomState(1).randn(2, 4000), jnp.float32)
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    lp, fp = mpd.apply({"params": mpd.init(jax.random.PRNGKey(0), wav)["params"]}, wav)
    assert len(lp) == 2 and all(l.shape[0] == 2 for l in lp)
    msd = MultiScaleDiscriminator(n_scales=2)
    ls, fs = msd.apply({"params": msd.init(jax.random.PRNGKey(1), wav)["params"]}, wav)
    assert len(ls) == 2 and len(fs[0]) == 7


def test_torch_generator_parity():
    import torch
    import torch.nn as tnn
    from torch.nn.utils import weight_norm

    from sylber_tpu.io.torch_convert import hifigan_params_from_torch
    from sylber_tpu.vocoder.hifigan import LRELU_SLOPE, Generator

    cfg = _tiny_cfg()
    torch.manual_seed(0)

    ups_rates, ups_ks = cfg.upsample_rates, cfg.upsample_kernel_sizes
    rb_ks, rb_ds = cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes

    class TorchResBlock(tnn.Module):
        def __init__(self, ch, k, dils):
            super().__init__()
            self.convs1 = tnn.ModuleList([
                weight_norm(tnn.Conv1d(ch, ch, k, dilation=d,
                                       padding=(k * d - d) // 2))
                for d in dils])
            self.convs2 = tnn.ModuleList([
                weight_norm(tnn.Conv1d(ch, ch, k, padding=k // 2))
                for _ in dils])

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                xt = c2(torch.nn.functional.leaky_relu(
                    c1(torch.nn.functional.leaky_relu(x, LRELU_SLOPE)),
                    LRELU_SLOPE))
                x = x + xt
            return x

    class TorchGen(tnn.Module):
        def __init__(self):
            super().__init__()
            ch0 = cfg.upsample_initial_channel
            self.conv_pre = weight_norm(tnn.Conv1d(14, ch0, 7, padding=3))
            self.ups = tnn.ModuleList()
            self.resblocks = tnn.ModuleList()
            ch = ch0
            for u, k in zip(ups_rates, ups_ks):
                self.ups.append(weight_norm(tnn.ConvTranspose1d(
                    ch, ch // 2, k, stride=u, padding=(k - u) // 2)))
                ch //= 2
                for rk, rd in zip(rb_ks, rb_ds):
                    self.resblocks.append(TorchResBlock(ch, rk, rd))
            self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, padding=3))

        def forward(self, x):
            x = self.conv_pre(x)
            nk = len(rb_ks)
            for i, up in enumerate(self.ups):
                x = up(torch.nn.functional.leaky_relu(x, LRELU_SLOPE))
                xs = None
                for j in range(nk):
                    out = self.resblocks[i * nk + j](x)
                    xs = out if xs is None else xs + out
                x = xs / nk
            x = torch.nn.functional.leaky_relu(x, LRELU_SLOPE)
            return torch.tanh(self.conv_post(x))

    tg = TorchGen().eval()
    feats = np.random.RandomState(2).randn(2, 25, 14).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(feats.transpose(0, 2, 1))).numpy()[:, 0]

    params = hifigan_params_from_torch(tg.state_dict(), cfg)
    got = np.asarray(Generator(cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(feats)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vocoder_training_smoke():
    """A few adversarial steps on a sine target: losses finite, mel-L1
    decreases, discriminator learns (d_loss falls from its 2-per-logit
    untrained value)."""
    from sylber_tpu.vocoder.hifigan import (VocoderTrainConfig,
                                            make_vocoder_train_step)
    from sylber_tpu.vocoder.mel import MelConfig

    cfg = VocoderTrainConfig(
        model=_tiny_cfg(), lr=1e-3,
        mel=MelConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20,
                      fmax=8000.0))
    init_fn, step_fn = make_vocoder_train_step(cfg)
    state = init_fn(jax.random.PRNGKey(0), t_frames=20, batch=2)

    rng = np.random.RandomState(0)
    T = 20
    up = cfg.model.total_upsample
    feats = jnp.asarray(rng.randn(2, T, 14), jnp.float32)
    t = np.arange(T * up) / 16000.0
    wav = jnp.asarray(np.stack([0.5 * np.sin(2 * np.pi * 220 * t),
                                0.5 * np.sin(2 * np.pi * 330 * t)]),
                      jnp.float32)

    step = jax.jit(step_fn)
    mels = []
    for i in range(8):
        state, m = step(state, feats, wav)
        mels.append(float(m["mel_l1"]))
        assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_loss"])
    assert mels[-1] < mels[0], mels


def test_harmonic_source_frequency_and_nyquist():
    """The NSF excitation's fundamental channel is a sine at exactly the
    conditioning f0; harmonics above Nyquist are zeroed."""
    import dataclasses

    from sylber_tpu.vocoder.hifigan import harmonic_noise_source

    cfg = dataclasses.replace(_tiny_cfg(), harmonic_source=True,
                              n_harmonics=4, source_noise=0.0)
    T, f0 = 50, 150.0
    feats = np.zeros((1, T, 14), np.float32)
    feats[..., cfg.pitch_channel] = np.log(f0 / 100.0)
    src = np.asarray(harmonic_noise_source(
        jnp.asarray(feats), cfg, jax.random.PRNGKey(0)))
    assert src.shape == (1, T * cfg.total_upsample, cfg.n_harmonics + 1)
    L = src.shape[1]
    freqs = np.fft.rfftfreq(L, 1.0 / cfg.sample_rate)
    for h in range(cfg.n_harmonics):
        spec = np.abs(np.fft.rfft(src[0, :, h] * np.hanning(L)))
        assert abs(freqs[spec.argmax()] - (h + 1) * f0) < 10.0, h
    assert np.allclose(src[0, :, -1], 0.0)  # noise channel silenced

    # harmonic above Nyquist is zeroed (f0 * h >= sr / 2)
    hot = np.zeros((1, T, 14), np.float32)
    hot[..., cfg.pitch_channel] = np.log(2500.0 / 100.0)  # 4th harm = 10 kHz
    src_hot = np.asarray(harmonic_noise_source(
        jnp.asarray(hot), cfg, jax.random.PRNGKey(0)))
    assert np.allclose(src_hot[0, :, 3], 0.0)
    assert not np.allclose(src_hot[0, :, 0], 0.0)


def test_harmonic_source_generator():
    """harmonic_source=True adds per-stage source convs (legacy tree
    unchanged when off), produces the same output shape, and the apply is
    deterministic without an explicit 'source' rng."""
    import dataclasses

    from sylber_tpu.vocoder.hifigan import Generator

    cfg = dataclasses.replace(_tiny_cfg(), harmonic_source=True)
    gen = Generator(cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 25, 14) * 0.1,
                        jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), feats)["params"]
    assert [k for k in params if k.startswith("source_")] == \
        [f"source_{i}" for i in range(len(cfg.upsample_rates))]
    wav = gen.apply({"params": params}, feats)
    wav2 = gen.apply({"params": params}, feats)
    assert wav.shape == (2, 25 * cfg.total_upsample)
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(wav2))

    legacy = Generator(_tiny_cfg()).init(jax.random.PRNGKey(0), feats)["params"]
    assert not any(k.startswith("source_") for k in legacy)


def test_sparc_decoder_api():
    from sylber_tpu.vocoder.hifigan import HiFiGANConfig
    from sylber_tpu.vocoder.sparc import SparcDecoder, SparcDecoderConfig

    cfg = SparcDecoderConfig(
        spk_emb_dim=8,
        generator=HiFiGANConfig(
            in_channels=14, cond_channels=8, upsample_initial_channel=32,
            upsample_rates=(5, 4, 2), upsample_kernel_sizes=(11, 8, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))
    dec = SparcDecoder(cfg)
    rng = np.random.RandomState(0)
    art = rng.randn(30, 14).astype(np.float32)  # unbatched input OK
    wav = dec(art, rng.randn(8).astype(np.float32), pitch_mean=140.0)
    assert wav.shape == (1, 30 * cfg.generator.total_upsample)
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0


def test_synthesis_decode_audio_end_to_end():
    """SegmentSynthesis.resynthesize -> decode_audio completes the full
    token->audio pipeline in-framework (untrained weights; checks shapes,
    finiteness, and the 320x frame->sample mapping)."""
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.models.voicebox import RegressorConfig
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig
    from sylber_tpu.vocoder.hifigan import HiFiGANConfig
    from sylber_tpu.vocoder.sparc import SparcDecoder, SparcDecoderConfig

    cfg = SynthesisConfig(
        encoding_layer=1,
        hubert=HubertConfig(num_hidden_layers=1, hidden_size=32,
                            num_attention_heads=4, intermediate_size=64,
                            conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                            num_conv_pos_embedding_groups=4,
                            precision="default"),
        regressor=RegressorConfig(dim=32, depth=1, dim_head=8, heads=4,
                                  dim_in_proj=8, dim_cond_emb=16,
                                  num_register_tokens=4,
                                  conv_pos_embed_kernel_size=5),
        input_output_dim=16, input_hidden_dims=(32,),
    )
    syn = SegmentSynthesis(config=cfg)
    feats = np.random.RandomState(0).randn(1, 10, 32).astype(np.float32)
    art, _ = syn.resynthesize(features=feats, steps=2)
    assert art.shape == (1, 10, 14)

    dec = SparcDecoder(SparcDecoderConfig(
        spk_emb_dim=8,
        generator=HiFiGANConfig(
            in_channels=14, cond_channels=8, upsample_initial_channel=64,
            upsample_rates=(5, 4, 4, 2, 2),
            upsample_kernel_sizes=(11, 8, 8, 4, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),))))
    wav = syn.decode_audio(art, np.zeros(8, np.float32), vocoder=dec)
    assert wav.shape == (1, 10 * 320)  # 50 Hz frames -> 16 kHz samples
    assert np.isfinite(wav).all()

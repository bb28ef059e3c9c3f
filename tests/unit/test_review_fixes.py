"""Regression tests for round-2 review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_prefetch_propagates_worker_exception():
    from sylber_tpu.data.dataset import prefetch

    def gen():
        yield 1
        yield 2
        raise RuntimeError("decoder exploded")

    it = prefetch(gen())
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="decoder exploded"):
        next(it)


def test_prefetch_propagates_transform_exception():
    from sylber_tpu.data.dataset import prefetch

    it = prefetch(iter([1, 2]), transform=lambda x: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        list(it)


def test_log_mel_win_length_shorter_than_nfft():
    from sylber_tpu.vocoder.mel import MelConfig, log_mel

    wav = jnp.asarray(np.random.RandomState(0).randn(2, 4000), jnp.float32)
    cfg = MelConfig(n_fft=1024, win_length=800, hop_length=256)
    mel = log_mel(wav, cfg)
    assert mel.shape[-1] == cfg.n_mels
    assert np.isfinite(np.asarray(mel)).all()


def test_period_discriminator_short_clip():
    from sylber_tpu.vocoder.hifigan import PeriodDiscriminator

    d = PeriodDiscriminator(period=11)
    wav = jnp.asarray(np.random.RandomState(1).randn(1, 5), jnp.float32)
    params = d.init(jax.random.PRNGKey(0), wav)["params"]
    logits, feats = d.apply({"params": params}, wav)
    assert np.isfinite(np.asarray(logits)).all()


def test_odeint_adaptive_budget_exhaustion_is_bounded():
    """With a tiny max_steps the solver must stop (no hang) and return
    finite state; the warning fires via jax.debug.print."""
    from sylber_tpu.flow.cfm import odeint_adaptive

    def stiff(y, t):
        return jnp.cos(200.0 * t) * (1.0 + y * y)

    y0 = jnp.ones((3,), jnp.float32)
    y1, (acc, rej, _t) = odeint_adaptive(stiff, y0, atol=1e-9, rtol=1e-9,
                                     max_steps=8, h0=1.0)
    assert int(acc) + int(rej) <= 8
    assert np.isfinite(np.asarray(y1)).all()
    # exhaustion is now detectable from the stats, not just the debug print
    assert float(_t) < 1.0


def test_sample_adaptive_exposes_completion_stats():
    from sylber_tpu.flow.cfm import sample_adaptive

    def field(x, t):
        return -x  # benign field, completes easily

    cond = jnp.zeros((1, 4, 3), jnp.float32)
    y, stats = sample_adaptive(field, jax.random.PRNGKey(0), cond, 3,
                               rand_scale=1.0, return_stats=True)
    assert bool(stats["complete"])
    assert int(stats["accepted"]) > 0

    def stiff(x, t):
        return jnp.cos(300.0 * t) * (1.0 + x * x)

    y, stats = sample_adaptive(stiff, jax.random.PRNGKey(0), cond, 3,
                               rand_scale=1.0, atol=1e-9, rtol=1e-9,
                               max_steps=4, return_stats=True)
    assert not bool(stats["complete"])


def test_flac_rejects_malformed_partition_order():
    from sylber_tpu.utils.flac import FlacError, _BitReader, _decode_residual

    # blocksize 100 with porder 3 -> 100 % 8 != 0 must be rejected, not
    # silently produce uninitialized residuals
    payload = bytes([0b00001100]) + b"\x00" * 64  # method=0, porder starts
    br = _BitReader(payload)
    with pytest.raises(FlacError):
        _decode_residual(br, blocksize=100, order=2)

"""Parity of the fused small-L attention kernel vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylber_tpu.ops.attention import dot_product_attention
from sylber_tpu.ops.pallas.smallattn import fused_attention_small


def _qkv(rng, B=2, H=4, L=250, D=64, dtype=jnp.float32):
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.randn(B, H, L, D).astype(np.float32), dtype)
    return mk(), mk(), mk()


def test_matches_xla_no_bias():
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng)
    out = fused_attention_small(q, k, v, interpret=True)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_matches_xla_key_padding_bias():
    """HF suffix-padding bias (the only form the model builds: frame masks
    are downsampled sample lengths) — the kernel converts it to per-batch
    kv lengths; non-contiguous masks are out of contract (XLA path)."""
    rng = np.random.RandomState(1)
    q, k, v = _qkv(rng, B=3, L=120)
    neg = jnp.finfo(jnp.float32).min
    lens = jnp.asarray([120, 73, 4])
    valid = jnp.arange(120)[None, :] < lens[:, None]
    bias = jnp.where(valid[:, None, None, :], 0.0, neg)
    out = fused_attention_small(q, k, v, bias=bias, interpret=True)
    ref = dot_product_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kv_len_direct_matches_bias_form():
    rng = np.random.RandomState(4)
    q, k, v = _qkv(rng, B=3, L=120)
    lens = jnp.asarray([120, 73, 4], jnp.int32)
    neg = jnp.finfo(jnp.float32).min
    valid = jnp.arange(120)[None, :] < lens[:, None]
    bias = jnp.where(valid[:, None, None, :], 0.0, neg)
    a = fused_attention_small(q, k, v, kv_len=lens, interpret=True)
    b = fused_attention_small(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_matches_xla_bf16():
    rng = np.random.RandomState(2)
    q, k, v = _qkv(rng, dtype=jnp.bfloat16)
    out = fused_attention_small(q, k, v, interpret=True)
    ref = dot_product_attention(q, k, v, precision="default")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_rejects_long_sequences():
    rng = np.random.RandomState(3)
    q, k, v = _qkv(rng, L=600)
    with pytest.raises(AssertionError):
        fused_attention_small(q, k, v, interpret=True)


def test_dispatch_impl_knob_cpu_stays_xla():
    """pallas_small is TPU-only: on CPU the dispatcher falls through to the
    XLA path (same results), so the knob is safe to set globally."""
    from sylber_tpu.ops import attention as A

    rng = np.random.RandomState(4)
    q, k, v = _qkv(rng, B=1, H=2, L=64, D=32)
    ref = dot_product_attention(q, k, v)
    old = A.get_attention_impl()
    try:
        A.set_attention_impl("pallas_small")
        out = dot_product_attention(q, k, v)
    finally:
        A.set_attention_impl(old)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

"""Pallas flash attention vs XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylber_tpu.ops.attention import dot_product_attention
from sylber_tpu.ops.pallas import flash as flash_mod


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on the CPU test backend."""
    from jax.experimental import pallas as pl
    import functools

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(flash_mod.pl, "pallas_call", patched)
    flash_mod._flash._clear_cache()
    yield
    flash_mod._flash._clear_cache()


@pytest.mark.parametrize("L", [128, 250, 400, 640])
def test_flash_matches_xla_no_mask(L):
    rng = jax.random.PRNGKey(0)
    B, H, D = 2, 4, 64
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, H, L, D))
               for i in range(3))
    want = dot_product_attention(q, k, v)
    got = flash_mod.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_matches_xla_key_padding():
    B, H, L, D = 2, 3, 300, 64
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, H, L, D))
               for i in range(3))
    valid = np.zeros((B, L), bool)
    valid[0, :211] = True
    valid[1, :300] = True
    big_neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(jnp.asarray(valid)[:, None, None, :], 0.0, big_neg)
    want = dot_product_attention(q, k, v, bias=bias)
    got = flash_mod.flash_attention(q, k, v, bias=bias)
    # compare only valid-query rows (reference computes garbage on padded
    # rows; kernel outputs zeros there)
    w = np.asarray(want)[0, :, :211]
    g = np.asarray(got)[0, :, :211]
    np.testing.assert_allclose(g, w, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[1], np.asarray(want)[1],
                               atol=2e-5, rtol=2e-5)


def test_flash_scale_override():
    B, H, L, D = 1, 2, 128, 32
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, H, L, D)) * 0.3
               for i in range(3))
    want = dot_product_attention(q, k, v, scale=10.0)
    got = flash_mod.flash_attention(q, k, v, scale=10.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

"""Frontend layer-0 fast paths: analytic GroupNorm + fused Pallas kernel.

The analytic path (`models/hubert.py::_analytic_l0_stats`) computes the
GroupNorm moments of conv1d(x, w) exactly from the input; enabled
automatically for bf16 frontends (`HubertConfig.frontend_l0_analytic`).
Measured 2.1x faster than the standard lowering on v5e (5.06 vs 10.6 ms at
B=32 x 5 s). The Pallas kernel (`ops/pallas/frontend.py`) is the fused
two-phase design, parity-tested here in interpret mode; it measured slower
than the analytic XLA path on the real chip and is not wired into the model
(see its docstring).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylber_tpu.models.hubert import ConvFeatureEncoder, HubertConfig, HubertModel
from sylber_tpu.ops.pallas.frontend import fused_conv0_gn_gelu

CFG = dict(hidden_size=48, num_attention_heads=4, intermediate_size=96,
           conv_dim=(32,) * 7, num_conv_pos_embeddings=16,
           num_conv_pos_embedding_groups=4, num_hidden_layers=2)


def _frontends(L=12800, B=3, seed=0):
    exact_cfg = HubertConfig(precision="highest", frontend_l0_analytic=False,
                             **CFG)
    analytic_cfg = HubertConfig(precision="highest",
                                frontend_l0_analytic=True, **CFG)
    x = jnp.asarray(np.random.RandomState(seed).randn(B, L), jnp.float32)
    fe = ConvFeatureEncoder(exact_cfg)
    params = fe.init(jax.random.PRNGKey(0), x)["params"]
    return x, params, fe, ConvFeatureEncoder(analytic_cfg)


def test_analytic_l0_matches_standard_path():
    x, params, fe_exact, fe_analytic = _frontends()
    want = np.asarray(fe_exact.apply({"params": params}, x))
    got = np.asarray(fe_analytic.apply({"params": params}, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_analytic_l0_padded_batch_matches_standard():
    """Zero-padded tails enter the GroupNorm moments (HF quirk) — the
    analytic path must reproduce that exactly, not mask them out."""
    x, params, fe_exact, fe_analytic = _frontends(L=9600, B=2, seed=3)
    x = np.array(x)  # writable copy
    x[1, 4000:] = 0.0  # batch item padded with zeros
    import jax.numpy as jnp

    x = jnp.asarray(x)
    want = np.asarray(fe_exact.apply({"params": params}, x))
    got = np.asarray(fe_analytic.apply({"params": params}, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_analytic_l0_param_tree_identical():
    """Both modes must init the exact same param tree (names, shapes) so
    checkpoints are interchangeable."""
    x, params, fe_exact, fe_analytic = _frontends(L=3200, B=1)
    p2 = fe_analytic.init(jax.random.PRNGKey(0), x[:1])["params"]
    t1 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), params)
    t2 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p2)
    assert t1 == t2


def test_analytic_l0_is_differentiable():
    x, params, _, fe_analytic = _frontends(L=6400, B=2)

    def loss(p):
        return (fe_analytic.apply({"params": p}, x) ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_analytic_l0_full_model_fast_mode_tolerance():
    """Through the full (tiny) model: the auto-enabled bf16 analytic
    frontend stays within fast-mode tolerance of the exact f32 path."""
    exact_cfg = HubertConfig(precision="highest", **CFG)
    fast_cfg = dataclasses.replace(exact_cfg, precision="default",
                                   dtype=jnp.bfloat16,
                                   frontend_dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 16000), jnp.float32)
    model = HubertModel(exact_cfg)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(HubertModel(fast_cfg).apply({"params": params}, x))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("B,L,D", [(2, 12805, 64), (1, 480, 32),
                                   (3, 16000, 128)])
def test_pallas_fused_kernel_interpret_parity(B, L, D):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L).astype(np.float32))
    w = jnp.asarray(rng.randn(10, 1, D).astype(np.float32) / 3)
    gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)

    y = jax.lax.conv_general_dilated(
        x[..., None], w, window_strides=(5,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), precision="highest")
    mean = y.mean(1, keepdims=True)
    var = ((y - mean) ** 2).mean(1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    want = np.asarray(jax.nn.gelu(y, approximate=False))

    got = np.asarray(fused_conv0_gn_gelu(x, w, gamma, beta, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

"""Structural validation of the SegmentSynthesis torch-checkpoint mapping.

The reference's flow-matching deps (torchdiffeq/torchode/beartype/gateloop)
are not in this image, so the torch Regressor cannot be instantiated for
numerical parity. Instead we build a state_dict with the reference's exact
parameter names/shapes (from `/root/reference/sylber/model/flowmatching.py`
and `segment_synthesis.py`) and assert the converted tree matches our init
tree leaf-for-leaf and runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylber_tpu.io.torch_convert import (
    input_mlp_params_from_torch, regressor_params_from_torch)
from sylber_tpu.models.voicebox import Regressor, RegressorConfig
from sylber_tpu.synthesis import InputMLP

CFG = RegressorConfig(dim=64, depth=2, dim_head=16, heads=4, dim_in_proj=8,
                      dim_cond_emb=24, dim_out=14, num_register_tokens=4,
                      conv_pos_embed_kernel_size=5)


def _fake_regressor_sd(rng, cfg: RegressorConfig, prefix="regressor."):
    """State dict with the reference Regressor's names and torch layouts."""
    inner = cfg.dim_head * cfg.heads
    ffn_inner = int(cfg.dim * cfg.ff_mult * 2 / 3)
    sd = {
        f"{prefix}proj_in.weight": rng.randn(cfg.dim_in_proj, cfg.dim_out),
        f"{prefix}proj_in.bias": rng.randn(cfg.dim_in_proj),
        f"{prefix}sinu_pos_emb.0.weights": rng.randn(cfg.dim // 2),
        f"{prefix}sinu_pos_emb.1.weight": rng.randn(cfg.time_hidden, cfg.dim),
        f"{prefix}sinu_pos_emb.1.bias": rng.randn(cfg.time_hidden),
        f"{prefix}to_embed.weight": rng.randn(
            cfg.dim, cfg.dim_in_proj * 2 + cfg.dim_cond_emb),
        f"{prefix}to_embed.bias": rng.randn(cfg.dim),
        f"{prefix}conv_embed.dw_conv1d.0.weight": rng.randn(
            cfg.dim, 1, cfg.conv_pos_embed_kernel_size),
        f"{prefix}conv_embed.dw_conv1d.0.bias": rng.randn(cfg.dim),
        f"{prefix}to_pred.weight": rng.randn(cfg.dim_out, cfg.dim),
        f"{prefix}transformer.register_tokens": rng.randn(
            cfg.num_register_tokens, cfg.dim),
        f"{prefix}transformer.final_norm.gamma": rng.randn(cfg.dim),
    }
    for i in range(cfg.depth):
        lp = f"{prefix}transformer.layers.{i}."
        sd.update({
            lp + "2.to_gamma.weight": rng.randn(cfg.dim, cfg.time_hidden),
            lp + "2.to_gamma.bias": rng.randn(cfg.dim),
            lp + "2.to_beta.weight": rng.randn(cfg.dim, cfg.time_hidden),
            lp + "2.to_beta.bias": rng.randn(cfg.dim),
            lp + "3.to_qkv.weight": rng.randn(inner * 3, cfg.dim),
            lp + "3.to_out.weight": rng.randn(cfg.dim, inner),
            lp + "3.q_norm.gamma": rng.randn(cfg.heads, 1, cfg.dim_head),
            lp + "3.k_norm.gamma": rng.randn(cfg.heads, 1, cfg.dim_head),
            lp + "4.to_gamma.weight": rng.randn(cfg.dim, cfg.time_hidden),
            lp + "4.to_gamma.bias": rng.randn(cfg.dim),
            lp + "4.to_beta.weight": rng.randn(cfg.dim, cfg.time_hidden),
            lp + "4.to_beta.bias": rng.randn(cfg.dim),
            lp + "5.0.weight": rng.randn(ffn_inner * 2, cfg.dim),
            lp + "5.0.bias": rng.randn(ffn_inner * 2),
            lp + "5.3.weight": rng.randn(cfg.dim, ffn_inner),
            lp + "5.3.bias": rng.randn(cfg.dim),
        })
    return {k: v.astype(np.float32) for k, v in sd.items()}


def _tree_shapes(tree):
    return {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_regressor_conversion_structure_and_apply():
    rng = np.random.RandomState(0)
    sd = _fake_regressor_sd(rng, CFG)
    params = regressor_params_from_torch(sd, depth=CFG.depth)

    reg = Regressor(CFG)
    x = jnp.zeros((2, 6, CFG.dim_out))
    emb = jnp.zeros((2, 6, CFG.dim_cond_emb))
    want = reg.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                    cond_emb=emb)["params"]
    assert _tree_shapes(params) == _tree_shapes(want)

    out = reg.apply({"params": params}, x + 1.0, jnp.asarray(0.5),
                    cond_emb=emb + 1.0)
    assert out.shape == (2, 6, CFG.dim_out)
    assert np.isfinite(np.asarray(out)).all()


def test_input_mlp_conversion_structure_and_apply():
    rng = np.random.RandomState(1)
    hidden = (20, 20)
    in_dim, out_dim = 12, 8
    sd = {}
    dims = [in_dim] + list(hidden)
    for i, h in enumerate(hidden):
        sd[f"input_model.mlp.{2 * i}.weight"] = rng.randn(h, dims[i])
        sd[f"input_model.mlp.{2 * i}.bias"] = rng.randn(h)
        for lin in ("linear1", "linear2"):
            sd[f"input_model.mlp.{2 * i + 1}.{lin}.weight"] = rng.randn(h, h)
            sd[f"input_model.mlp.{2 * i + 1}.{lin}.bias"] = rng.randn(h)
        sd[f"input_model.mlp.{2 * i + 1}.norm.weight"] = rng.randn(h)
        sd[f"input_model.mlp.{2 * i + 1}.norm.bias"] = rng.randn(h)
    sd[f"input_model.mlp.{2 * len(hidden)}.weight"] = rng.randn(out_dim, hidden[-1])
    sd[f"input_model.mlp.{2 * len(hidden)}.bias"] = rng.randn(out_dim)
    sd = {k: v.astype(np.float32) for k, v in sd.items()}

    params = input_mlp_params_from_torch(sd, n_hidden=len(hidden))
    mlp = InputMLP(output_dim=out_dim, hidden_dims=hidden)
    want = mlp.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 4, in_dim)))["params"]
    assert _tree_shapes(params) == _tree_shapes(want)
    out = mlp.apply({"params": params}, jnp.ones((2, 5, in_dim)))
    assert out.shape == (2, 5, out_dim)


def test_rff_matches_torch_block():
    """The RFF block itself can be checked numerically against torch."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    class TorchRFF(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.linear1 = tnn.Linear(dim, dim)
            self.linear2 = tnn.Linear(dim, dim)
            self.norm = tnn.LayerNorm(dim)

        def forward(self, x):
            x2 = self.linear2(torch.relu(self.linear1(x)))
            return self.norm(x + x2)

    torch.manual_seed(0)
    tm = TorchRFF(16).eval()
    from sylber_tpu.synthesis import RFF

    params = {
        "linear1": {"kernel": tm.linear1.weight.detach().numpy().T,
                    "bias": tm.linear1.bias.detach().numpy()},
        "linear2": {"kernel": tm.linear2.weight.detach().numpy().T,
                    "bias": tm.linear2.bias.detach().numpy()},
        "norm": {"scale": tm.norm.weight.detach().numpy(),
                 "bias": tm.norm.bias.detach().numpy()},
    }
    x = np.random.RandomState(2).randn(3, 7, 16).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(RFF(16).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_quantizer_state_conversion():
    """Structural: trainable-Quantizer ckpt names -> QuantizerState."""
    from sylber_tpu.flow.quantizer import (
        GroupedResidualVQConfig, QuantizerConfig, quantizer_forward)
    from sylber_tpu.io.torch_convert import quantizer_state_from_torch

    cfg = QuantizerConfig(
        input_dim=24, output_dim=16, hidden_dims=(20,), pitch_emb_dim=4,
        art_vq=GroupedResidualVQConfig(dim=12, groups=2, num_quantizers=2,
                                       codebook_size=32),
        pitch_vq=GroupedResidualVQConfig(dim=4, codebook_size=16))
    rng = np.random.RandomState(0)
    sd = {
        "encoder.mlp.0.weight": rng.randn(20, 24),
        "encoder.mlp.0.bias": rng.randn(20),
        "encoder.mlp.1.0.weight": rng.randn(20, 20),
        "encoder.mlp.1.0.bias": rng.randn(20),
        "encoder.mlp.1.3.weight": rng.randn(20, 20),
        "encoder.mlp.1.3.bias": rng.randn(20),
        "encoder.mlp.2.weight": rng.randn(16, 20),
        "encoder.mlp.2.bias": rng.randn(16),
    }
    for g in range(2):
        for q in range(2):
            sd[f"art_vq.rvqs.{g}.layers.{q}._codebook.embed"] = \
                rng.randn(1, 32, 6)
    sd["pitch_vq.rvqs.0.layers.0._codebook.embed"] = rng.randn(1, 16, 4)
    sd = {k: v.astype(np.float32) for k, v in sd.items()}

    state = quantizer_state_from_torch(sd, cfg)
    assert state.art_vq.codebooks.shape == (2, 2, 32, 6)
    assert state.pitch_vq.codebooks.shape == (1, 1, 16, 4)
    out = quantizer_forward(state, cfg,
                            jnp.asarray(rng.randn(2, 5, 24), jnp.float32))
    assert out["quantize"].shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out["quantize"])).all()

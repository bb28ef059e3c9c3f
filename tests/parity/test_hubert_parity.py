"""Parity: flax HuBERT vs torch/HF HubertModel on identical random weights.

The reference's encoder is `transformers.HubertModel` truncated to 9 layers
(`/root/reference/sylber/model/sylber.py:41`). We instantiate the torch model
with random init (no network access needed — HubertConfig() defaults equal
hubert-base), convert the state_dict, and assert fp32-tolerance equality of
hidden states for unpadded and padded batches.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import HubertConfig as HFConfig
from transformers import HubertModel as HFHubert

import jax.numpy as jnp

from sylber_tpu.models.hubert import HubertConfig, HubertModel
from sylber_tpu.io.torch_convert import hubert_params_from_torch

N_LAYERS = 2  # small for test speed; layer stack is homogeneous


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf_cfg = HFConfig(num_hidden_layers=N_LAYERS)
    hf = HFHubert(hf_cfg).eval()
    params = hubert_params_from_torch(hf.state_dict(), num_hidden_layers=N_LAYERS)
    jx = HubertModel(HubertConfig(num_hidden_layers=N_LAYERS))
    return hf, jx, params


def _run_torch(hf, wav, mask=None, mti=None):
    with torch.no_grad():
        kwargs = {}
        if mask is not None:
            kwargs["attention_mask"] = torch.from_numpy(mask)
        if mti is not None:
            kwargs["mask_time_indices"] = torch.from_numpy(mti)
        return hf(torch.from_numpy(wav), **kwargs).last_hidden_state.numpy()


def test_unpadded_parity(models):
    hf, jx, params = models
    rng = np.random.RandomState(1)
    wav = rng.randn(2, 16000).astype(np.float32)
    ref = _run_torch(hf, wav)
    out = np.asarray(jx.apply({"params": params}, jnp.asarray(wav)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_padded_batch_parity(models):
    """Padding + attention-mask semantics must match HF exactly."""
    hf, jx, params = models
    rng = np.random.RandomState(2)
    lens = [16000, 11200, 7043]
    max_len = max(lens)
    wav = np.zeros((len(lens), max_len), np.float32)
    mask = np.zeros((len(lens), max_len), np.int64)
    for i, l in enumerate(lens):
        wav[i, :l] = rng.randn(l)
        mask[i, :l] = 1
    ref = _run_torch(hf, wav, mask)
    out = np.asarray(
        jx.apply({"params": params}, jnp.asarray(wav), jnp.asarray(mask))
    )
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-4)
    # non-attended frames must be (near-)identically handled
    from sylber_tpu.models.hubert import feature_vector_attention_mask

    fm = np.asarray(
        feature_vector_attention_mask(
            HubertConfig(num_hidden_layers=N_LAYERS), jnp.asarray(mask), out.shape[1]
        )
    )
    assert fm.sum(1).tolist() == [(l - 80) // 320 for l in lens]


def test_mask_time_indices_parity(models):
    """masked_spec_embed substitution path (training student forward)."""
    hf, jx, params = models
    rng = np.random.RandomState(3)
    wav = rng.randn(2, 16000).astype(np.float32)
    n_frames = (16000 - 80) // 320
    mti = rng.rand(2, n_frames) < 0.3
    ref = _run_torch(hf, wav, mti=mti)
    out = np.asarray(
        jx.apply(
            {"params": params},
            jnp.asarray(wav),
            None,
            jnp.asarray(mti),
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_bf16_frontend_close_to_f32(models):
    """Fast-mode frontend (convs 1-6 in bf16) must track the fp32 path
    closely enough that norm-gate decisions are stable (rel err ~1e-2)."""
    import jax.numpy as jnp_

    hf, _, params = models
    fast = HubertModel(HubertConfig(num_hidden_layers=N_LAYERS,
                                    precision="default",
                                    frontend_dtype=jnp_.bfloat16))
    exact = HubertModel(HubertConfig(num_hidden_layers=N_LAYERS))
    rng = np.random.RandomState(9)
    wav = rng.randn(1, 16000).astype(np.float32)
    a = np.asarray(exact.apply({"params": params}, jnp.asarray(wav)))
    b = np.asarray(fast.apply({"params": params}, jnp.asarray(wav)))
    na = np.sqrt((a ** 2).sum(-1))
    nb = np.sqrt((b ** 2).sum(-1))
    rel = np.abs(na - nb) / np.maximum(na, 1e-6)
    assert rel.max() < 0.05, rel.max()

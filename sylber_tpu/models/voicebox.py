"""Voicebox-style flow-matching vector-field network (flax.linen).

TPU-native re-design of the reference Regressor/Transformer
(`/root/reference/sylber/model/flowmatching.py:344-686`, itself derived from
lucidrains' voicebox-pytorch): RoPE attention with optional per-head QK
RMSNorm (scale 10), AdaptiveRMSNorm conditioned on the flow time embedding,
GEGLU feed-forward, register tokens at RoPE position -10000, optional U-Net
skip connections. Resynthesis config: depth 8, dim 512, heads 8, dim_head 64,
dim_in_proj 64, dim_cond_emb 256 (`sylber_configs/sylber_resynthesis.yaml`).

All control flow is static; sampling loops live in
:mod:`sylber_tpu.flow.cfm` as `lax.scan`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.gateloop import gate_loop_operator


@dataclasses.dataclass(frozen=True)
class RegressorConfig:
    dim: int = 512
    depth: int = 8
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    dim_out: int = 14            # 12 EMA dims + log-pitch + loudness
    dim_in_proj: int = 64
    dim_cond_emb: int = 256
    conv_pos_embed_kernel_size: int = 31
    num_register_tokens: int = 16
    attn_qk_norm: bool = True
    qk_norm_scale: float = 10.0
    use_unet_skip_connection: bool = False
    use_gateloop_layers: bool = False
    skip_connect_scale: Optional[float] = None
    rope_theta: float = 50000.0
    time_hidden_dim: Optional[int] = None  # default dim * 4
    frac_lengths_mask: tuple = (0.7, 1.0)
    sigma: float = 0.0
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    precision: str = "default"
    dtype: jnp.dtype = jnp.float32

    @property
    def time_hidden(self) -> int:
        return self.time_hidden_dim or self.dim * 4


def rope_frequencies(positions: jnp.ndarray, dim_head: int,
                     theta: float) -> jnp.ndarray:
    """(L,) positions -> (L, dim_head) rotary angles (freqs duplicated,
    matching the reference's cat((freqs, freqs), -1))."""
    inv = 1.0 / (theta ** (jnp.arange(0, dim_head, 2, dtype=jnp.float32)
                           / dim_head))
    f = positions.astype(jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([f, f], axis=-1)


def apply_rope(pos: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """t: (..., L, dim_head); pos: (L, dim_head) angles."""
    d = t.shape[-1]
    t1, t2 = t[..., : d // 2], t[..., d // 2:]
    rotated = jnp.concatenate([-t2, t1], axis=-1)
    return t * jnp.cos(pos) + rotated * jnp.sin(pos)


def _l2norm(x, eps=1e-12):
    # torch F.normalize: x / max(||x||, eps)
    n = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(-1, keepdims=True))
    return (x / jnp.maximum(n, eps)).astype(x.dtype)


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return _l2norm(x) * (self.dim ** 0.5) * gamma


class AdaptiveRMSNorm(nn.Module):
    """gamma/beta from the time embedding; init = identity
    (`flowmatching.py:240-267`)."""

    dim: int
    cond_dim: int

    @nn.compact
    def __call__(self, x, cond):
        normed = _l2norm(x) * (self.dim ** 0.5)
        gamma = nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones, name="to_gamma")(cond)
        beta = nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="to_beta")(cond)
        return normed * gamma[:, None, :] + beta[:, None, :]


class Attention(nn.Module):
    cfg: RegressorConfig

    @nn.compact
    def __call__(self, x, mask=None, rope=None, deterministic=True):
        c = self.cfg
        inner = c.dim_head * c.heads
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=c.dtype,
                       precision=c.precision, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, c.heads, c.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        scale = None
        if c.attn_qk_norm:
            # per-head RMSNorm on q and k, fixed softmax scale
            qg = self.param("q_norm_gamma", nn.initializers.ones,
                            (c.heads, 1, c.dim_head))
            kg = self.param("k_norm_gamma", nn.initializers.ones,
                            (c.heads, 1, c.dim_head))
            q = _l2norm(q) * (c.dim_head ** 0.5) * qg
            k = _l2norm(k) * (c.dim_head ** 0.5) * kg
            scale = c.qk_norm_scale
        if rope is not None:
            q = apply_rope(rope, q)
            k = apply_rope(rope, k)

        bias = None
        if mask is not None:
            big_neg = jnp.finfo(jnp.float32).min
            bias = jnp.where(mask[:, None, None, :], 0.0, big_neg)

        out = dot_product_attention(q, k, v, bias=bias, scale=scale,
                                    precision=c.precision)
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        return nn.Dense(c.dim, use_bias=False, dtype=c.dtype,
                        precision=c.precision, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    cfg: RegressorConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.cfg
        inner = int(c.dim * c.ff_mult * 2 / 3)
        h = nn.Dense(inner * 2, dtype=c.dtype, precision=c.precision,
                     name="proj_in")(x)
        # torch chunk order: (x, gate)
        val, gate = jnp.split(h, 2, axis=-1)
        h = nn.gelu(gate, approximate=False) * val
        h = nn.Dropout(c.ff_dropout)(h, deterministic=deterministic)
        return nn.Dense(c.dim, dtype=c.dtype, precision=c.precision,
                        name="proj_out")(h)


class SimpleGateLoop(nn.Module):
    """One-headed GateLoop block (`flowmatching.py:390`: SimpleGateLoopLayer
    with post_ln=True): RMSNorm pre-norm, a single Dense -> (q, kv, gate)
    split, sigmoid gate, per-channel linear recurrence evaluated as a
    parallel associative scan, post-LayerNorm. Residual is added by the
    caller (`flowmatching.py:457`: ``x = gateloop(x) + x``)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(self.dim, name="norm")(x)
        qkva = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype,
                        name="to_qkva")(h)
        q, kv, a = jnp.split(qkva, 3, axis=-1)
        out = gate_loop_operator(q, kv, jax.nn.sigmoid(a))
        return nn.LayerNorm(name="post_ln")(out)


class VoiceboxTransformer(nn.Module):
    """Pre-norm transformer with AdaptiveRMSNorm, register tokens, RoPE."""

    cfg: RegressorConfig

    @nn.compact
    def __call__(self, x, mask=None, time_cond=None, deterministic=True):
        c = self.cfg
        B, L, _ = x.shape
        n_reg = c.num_register_tokens

        if n_reg > 0:
            reg = self.param("register_tokens", nn.initializers.normal(1.0),
                             (n_reg, c.dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(reg, (B, n_reg, c.dim)).astype(x.dtype), x],
                axis=1)
            if mask is not None:
                mask = jnp.concatenate(
                    [jnp.ones((B, n_reg), mask.dtype), mask], axis=1)
            positions = jnp.concatenate([
                jnp.full((n_reg,), -10000.0),
                jnp.arange(L, dtype=jnp.float32)])
        else:
            positions = jnp.arange(L, dtype=jnp.float32)
        rope = rope_frequencies(positions, c.dim_head, c.rope_theta)

        skip_scale = (c.skip_connect_scale if c.skip_connect_scale is not None
                      else 2 ** -0.5)
        skips = []
        for ind in range(c.depth):
            layer = ind + 1
            has_skip = c.use_unet_skip_connection and layer > (c.depth // 2)
            if not has_skip:
                skips.append(x)
            else:
                skip = skips.pop() * skip_scale
                x = nn.Dense(c.dim, dtype=c.dtype, precision=c.precision,
                             name=f"skip_combiner_{ind}")(
                    jnp.concatenate([x, skip], axis=-1))

            if c.use_gateloop_layers:
                x = SimpleGateLoop(c.dim, dtype=c.dtype,
                                   name=f"gateloop_{ind}")(x) + x

            attn_in = AdaptiveRMSNorm(c.dim, c.time_hidden,
                                      name=f"attn_norm_{ind}")(x, time_cond)
            x = Attention(c, name=f"attn_{ind}")(
                attn_in, mask=mask, rope=rope,
                deterministic=deterministic) + x
            ff_in = AdaptiveRMSNorm(c.dim, c.time_hidden,
                                    name=f"ff_norm_{ind}")(x, time_cond)
            x = GEGLUFeedForward(c, name=f"ff_{ind}")(
                ff_in, deterministic=deterministic) + x

        if n_reg > 0:
            x = x[:, n_reg:]
        return RMSNorm(c.dim, name="final_norm")(x)


class Regressor(nn.Module):
    """Vector-field net: (x_t, cond, cond_emb, t) -> dx/dt prediction.

    `/root/reference/sylber/model/flowmatching.py:474-686`. The reference's
    text-token embedding path (`to_cond_emb`) is unused by SegmentSynthesis
    (cond_emb is always passed directly) and is not replicated; the unused
    ``cond_drop_prob`` CFG argument (never read in the reference forward) is
    likewise omitted.
    """

    cfg: RegressorConfig

    @nn.compact
    def __call__(self, x, times, cond=None, cond_emb=None, self_attn_mask=None,
                 cond_mask=None, deterministic=True):
        c = self.cfg
        B, L, _ = x.shape
        proj_in = nn.Dense(c.dim_in_proj, dtype=c.dtype, precision=c.precision,
                           name="proj_in")
        x = proj_in(x)
        if cond is None:
            cond = jnp.zeros_like(x)
        else:
            cond = proj_in(cond)  # shared weights (flowmatching.py:596-601)
        if cond_mask is not None:
            # "as described in section 3.2": zero the conditioning inside the
            # region to infill (flowmatching.py:626-630)
            cond = cond * (~cond_mask)[..., None].astype(cond.dtype)

        if times.ndim == 0:
            times = jnp.broadcast_to(times, (B,))

        # learned sinusoidal time embedding -> Dense -> SiLU
        w = self.param("time_freqs", nn.initializers.normal(1.0),
                       (c.dim // 2,))
        f = times.astype(jnp.float32)[:, None] * w[None, :] * 2 * math.pi
        temb = jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1)
        temb = nn.Dense(c.time_hidden, name="time_mlp")(temb)
        temb = jax.nn.silu(temb)

        parts = [x]
        if cond_emb is not None:
            parts.append(cond_emb.astype(x.dtype))
        parts.append(cond)
        h = jnp.concatenate(parts, axis=-1)
        h = nn.Dense(c.dim, dtype=c.dtype, precision=c.precision,
                     name="to_embed")(h)

        # depthwise conv positional embedding, kernel 31, GELU, residual
        if self_attn_mask is not None:
            h = h * self_attn_mask[..., None].astype(h.dtype)
        pos = nn.Conv(c.dim, kernel_size=(c.conv_pos_embed_kernel_size,),
                      feature_group_count=c.dim, padding="SAME",
                      dtype=c.dtype, precision=c.precision,
                      name="conv_pos_embed")(h)
        pos = nn.gelu(pos, approximate=False)
        if self_attn_mask is not None:
            pos = pos * self_attn_mask[..., None].astype(pos.dtype)
        h = pos + h

        h = VoiceboxTransformer(c, name="transformer")(
            h, mask=self_attn_mask, time_cond=temb,
            deterministic=deterministic)
        return nn.Dense(c.dim_out, use_bias=False, dtype=c.dtype,
                        precision=c.precision, name="to_pred")(h)

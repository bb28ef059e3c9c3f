"""TPU-native HuBERT encoder (flax.linen).

Re-implements the architecture consumed by the reference Sylber
(`/root/reference/sylber/model/sylber.py:41` builds
``transformers.HubertModel(HubertConfig.from_pretrained("facebook/hubert-base-ls960",
num_hidden_layers=9))``). The layer semantics below mirror HF's
``modeling_hubert.py`` exactly (post-LN encoder variant,
``do_stable_layer_norm=False``) so that converted PyTorch checkpoints produce
fp32-tolerance-identical hidden states:

- waveform frontend: 7 Conv1d layers (512ch), strides [5,2,2,2,2,2,2],
  kernels [10,3,3,3,3,2,2], GroupNorm(512 groups) after layer 0 only, GELU,
  no bias. Total stride 320 -> 50 Hz frames.
- feature projection: LayerNorm -> Linear 512->768 (-> dropout).
- optional span masking: learned ``masked_spec_embed`` substituted at
  ``mask_time_indices``.
- conv positional embedding: Conv1d(768,768,k=128,groups=16) (weight-norm is
  folded into a plain kernel at checkpoint-conversion time), trailing sample
  removed (HF SamePad for even kernels), GELU, additive.
- 9 post-LN transformer layers: MHA 12 heads, FFN 3072, GELU, LN eps 1e-5.
- attention_mask semantics: sample-level mask downsampled through the conv
  stack; non-attended frames zeroed before the positional conv; additive
  -inf attention bias per layer.

Everything is expressed with static shapes and jit-friendly control flow.
Attention dispatches through :mod:`sylber_tpu.ops.attention` so a Pallas
flash-attention kernel can be swapped in on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    """Architecture hyper-parameters (hubert-base-ls960 defaults).

    Mirrors the pinned HF config the reference uses; the reference truncates
    ``num_hidden_layers`` to 9 (`/root/reference/sylber/model/sylber.py:41`).
    """

    hidden_size: int = 768
    num_hidden_layers: int = 9
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_proj_layer_norm: bool = True
    # dropout rates (training only; eval path is deterministic)
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    # compute dtype for the transformer stack; frontend always runs fp32 to
    # preserve GroupNorm precision (SURVEY.md "hard parts").
    dtype: jnp.dtype = jnp.float32
    # matmul/conv precision: "highest" gives true-fp32 MXU passes (parity
    # mode); "default" lets XLA use bf16 MXU inputs (fast mode).
    precision: str = "highest"
    # dtype for frontend convs 1..6 (conv 0 + GroupNorm always run fp32 for
    # normalization stability). The fp32 frontend is ~40% of inference FLOPs
    # on the MXU (f32 passes are 8x bf16), so bfloat16 here roughly doubles
    # throughput; fp32 default preserves checkpoint parity.
    frontend_dtype: jnp.dtype = jnp.float32
    # rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades ~33% more FLOPs for O(depth) less activation memory — needed
    # for the reference's batch-100 training recipe on a single chip.
    remat: bool = False
    # fuse the q/k/v projections into one (d, 3d) matmul per encoder layer
    # (param tree unchanged: separate q/k/v leaves concatenated at apply
    # time). Off by default pending a measured win; see ops/attention.py.
    fused_qkv: bool = False
    # dynamic W8A8 int8 encoder matmuls (inference serving mode): the v5e
    # MXU runs int8 at 2x its bf16 rate; weights are quantized in-graph
    # (per-output-channel), activations per-token (ops/int8.py). Param tree
    # unchanged. Accuracy is gated by the fast-vs-exact boundary-F1 harness
    # (measured 0.992-0.9997 on the trained 768-d fixture); training paths
    # must keep this off. Measured speed at 768-d is NEUTRAL on v5e
    # (0.94-1.0x vs bf16, scripts/int8_probe.py): the per-token quantize
    # VPU passes offset the MXU gain at these matmul shapes. Kept as a
    # correct, gated mode for wider models where projections dominate.
    int8_encoder: bool = False
    # analytic-GroupNorm fast path for frontend layer 0 (the most expensive
    # op in the network: its output is the largest tensor, 16 kHz/5, and the
    # op is VPU-bound on the GELU — measured 10.6 ms of a 32 ms forward at
    # B=32 x 5 s). GroupNorm moments are computed exactly from the *input*
    # (sum: strided column sums @ W; sum-of-squares: 10x10 patch Gram matrix
    # contracted with W^T W) so the conv output is materialized once, in
    # frontend_dtype, with the normalize+GELU epilogue fused at that dtype
    # (5.1 ms measured — 2.1x). None = auto (on when frontend_dtype is not
    # f32); exact/parity f32 mode keeps the standard lowering.
    frontend_l0_analytic: Optional[bool] = None
    # tanh-approximate GELU in the encoder FFN + positional-conv epilogue.
    # The exact-erf GELU on the (B, L, 3072) FFN tensor is the single
    # largest non-matmul cost in an encoder layer on v5e (op probe: 0.60 ms
    # vs 0.08 ms tanh per layer application at B=32 L=250 bf16 — LayerNorm
    # and the fused softmax are each <0.02 ms by comparison), and tanh
    # deviates from erf by ~1e-3 absolute — far below bf16's ~3e-2
    # resolution. None = auto (tanh when ``dtype`` is not f32); f32 parity
    # paths keep exact erf. The frontend has its own analytic-l0 epilogue
    # with the same auto rule.
    gelu_tanh: Optional[bool] = None

    def gelu_approx_for(self, dtype) -> bool:
        """tanh-vs-erf GELU choice for an op running at ``dtype``."""
        if self.gelu_tanh is None:
            return dtype != jnp.float32
        return self.gelu_tanh

    @property
    def gelu_approximate(self) -> bool:
        return self.gelu_approx_for(self.dtype)

    @property
    def total_stride(self) -> int:
        s = 1
        for st in self.conv_stride:
            s *= st
        return s

    def feat_extract_output_length(self, input_length):
        """Conv output length, chained floor((L - k) / s) + 1 (HF formula)."""
        length = input_length
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length


def feature_vector_attention_mask(
    config: HubertConfig, attention_mask: jnp.ndarray, num_frames: int
) -> jnp.ndarray:
    """Downsample a sample-level mask to frame level (HF semantics).

    HF marks frames ``< output_length`` as attended where
    ``output_length = _get_feat_extract_output_lengths(mask.sum(-1))``.
    """
    lengths = attention_mask.sum(axis=-1)
    out_lengths = config.feat_extract_output_length(lengths)
    frame_idx = jnp.arange(num_frames)[None, :]
    return (frame_idx < out_lengths[:, None]).astype(jnp.int32)


class _ConvKernelParam(nn.Module):
    """Bare conv kernel with nn.Conv's param name/init, for paths that
    consume the weight directly (analytic layer-0). Checkpoint-compatible
    with nn.Conv (param path `<name>/kernel`, lecun_normal init)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _GroupNormParams(nn.Module):
    """GroupNorm affine params with nn.GroupNorm's names/inits."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


def _analytic_l0_stats(x: jnp.ndarray, w_kd: jnp.ndarray, k: int, s: int,
                       t0: int, eps: float):
    """Exact GroupNorm moments of ``conv1d(x, w)`` computed from the input.

    For y[t, c] = sum_j x[s*t + j] w[j, c]:
      sum_t y[t, c]   = u @ W           with u_j    = sum_t x[s*t + j]
      sum_t y[t, c]^2 = diag(W^T G W)_c with G[j,l] = sum_t x[s*t+j] x[s*t+l]
    u and the (k x k) Gram matrix G cost O(L * k) reads of x — no (B, T, D)
    intermediate. Requires k <= 2*s (two stride-blocks per window).
    Moments include zero-padded frames, matching the HF GroupNorm quirk.
    """
    B = x.shape[0]
    need = (t0 + 1) * s
    xp = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[1]))))[:, :need]
    # lane-friendly strided view: (B, 2s, t0) with row j = x[s*t + j].
    # Keeping t on the minor (lane) axis matters: a (B, t0, s) layout pads
    # s=5 lanes to 128 and every reduction pays 25x the traffic (measured
    # 3.7 ms vs ~0.3 ms for this formulation at B=32 x 5 s).
    xt = jnp.swapaxes(xp.reshape(B, t0 + 1, s), 1, 2)  # (B, s, t0+1)
    xs = jnp.concatenate([xt[:, :, :t0], xt[:, :, 1:]], axis=1)  # (B,2s,t0)
    u = xs.sum(-1)                                            # (B, 2s)
    G = jax.lax.dot_general(                                  # (B, 2s, 2s)
        xs, xs, (((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)
    w2 = jnp.zeros((2 * s, w_kd.shape[-1]), jnp.float32).at[:k].set(w_kd)
    mean = (u @ w2) / t0                                      # (B, D)
    s2 = jnp.einsum("bij,id,jd->bd", G, w2, w2,
                    precision=jax.lax.Precision.HIGHEST)
    var = s2 / t0 - mean * mean
    return mean, jax.lax.rsqrt(var + eps)


class ConvFeatureEncoder(nn.Module):
    """Waveform frontend: 7 strided Conv1d layers, GroupNorm on layer 0."""

    config: HubertConfig

    @nn.compact
    def __call__(self, input_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = input_values[..., None].astype(jnp.float32)
        k0, s0, d0 = cfg.conv_kernel[0], cfg.conv_stride[0], cfg.conv_dim[0]
        analytic = cfg.frontend_l0_analytic
        if analytic is None:
            analytic = cfg.frontend_dtype != jnp.float32
        eligible = (not cfg.conv_bias and k0 <= 2 * s0
                    and x.shape[1] >= k0 + s0)
        if analytic and not eligible and cfg.frontend_l0_analytic:
            # forced-on knob demoted: tell the user instead of silently
            # running the standard path (trace-time, so it fires once per
            # compiled shape, not per step)
            import warnings

            warnings.warn(
                "frontend_l0_analytic=True requested but the analytic "
                f"layer-0 path requires conv_bias=False, kernel<=2*stride "
                f"and input length >= {k0 + s0} (got conv_bias="
                f"{cfg.conv_bias}, k0={k0}, s0={s0}, len={x.shape[1]}); "
                "falling back to the standard conv+GroupNorm path",
                stacklevel=2)
        analytic = analytic and eligible

        if analytic:
            # layer 0 via analytic GroupNorm moments: conv output hits HBM
            # once, in frontend_dtype, with normalize+GELU fused at that
            # dtype. Param tree is identical to the nn.Conv/nn.GroupNorm
            # path (kernel/scale/bias names, shapes, inits).
            w = _ConvKernelParam((k0, 1, d0), name="conv_0")()
            gamma, beta = _GroupNormParams(d0, name="group_norm")()
            t0 = (x.shape[1] - k0) // s0 + 1
            mean, inv = _analytic_l0_stats(x[..., 0], w.reshape(k0, d0),
                                           k0, s0, t0, cfg.layer_norm_eps)
            dt = cfg.frontend_dtype
            y = jax.lax.conv_general_dilated(
                x.astype(dt), w.astype(dt), window_strides=(s0,),
                padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
            scale = (inv * gamma).astype(dt)
            off = (beta - mean * inv * gamma).astype(dt)
            # tanh-GELU in bf16: the exact erf form costs ~3.8 ms more on
            # the VPU at B=32 x 5 s while deviating by ~1e-3 absolute — an
            # order of magnitude below bf16 rounding (~3e-2) already
            # accepted in this mode; the fast-vs-exact boundary-F1 gates
            # cover it. A forced-analytic f32 run keeps the exact form.
            x = nn.gelu(y * scale[:, None, :] + off[:, None, :],
                        approximate=dt != jnp.float32)
            start = 1
        else:
            start = 0

        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            if i < start:
                continue
            layer_dtype = jnp.float32 if i == 0 else cfg.frontend_dtype
            x = nn.Conv(
                features=dim,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=cfg.conv_bias,
                dtype=layer_dtype,
                precision=cfg.precision,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                # GroupNorm(512 groups, 512 ch) == per-channel instance norm
                # over the length dim, affine. Matches torch GroupNorm.
                x = nn.GroupNorm(
                    num_groups=dim,
                    epsilon=cfg.layer_norm_eps,
                    dtype=jnp.float32,
                    name="group_norm",
                )(x)
            # Frontend GELUs run over the largest tensors in the network
            # (~259M elements across layers 1-6 at B=32 x 5 s) and the
            # exact-erf form is VPU-bound at ~24 ps/element (op probe) —
            # several ms per forward. Same auto-tanh rule as the encoder,
            # keyed on each layer's compute dtype (layer 0 standard path is
            # always f32 => exact, preserving checkpoint parity).
            x = nn.gelu(x, approximate=cfg.gelu_approx_for(layer_dtype))
        return x.astype(jnp.float32)


class FeatureProjection(nn.Module):
    config: HubertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        if cfg.feat_proj_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, precision=cfg.precision,
                     name="projection")(x)
        x = nn.Dropout(cfg.feat_proj_dropout)(x, deterministic=deterministic)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped Conv1d positional embedding (weight-norm folded at load)."""

    config: HubertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        out = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(k,),
            padding=((k // 2, k // 2),),
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            use_bias=True,
            dtype=cfg.dtype,
            precision=cfg.precision,
            name="conv",
        )(x)
        if k % 2 == 0:
            # HF SamePadLayer: drop the trailing frame for even kernels.
            out = out[:, :-1, :]
        return nn.gelu(out, approximate=cfg.gelu_approximate)


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (HF `HubertEncoderLayer`)."""

    config: HubertConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        attn_out = multi_head_attention(
            x,
            num_heads=cfg.num_attention_heads,
            dtype=cfg.dtype,
            precision=cfg.precision,
            bias=attn_bias,
            dropout_rate=cfg.attention_dropout,
            deterministic=deterministic,
            fused_qkv=cfg.fused_qkv,
            int8=cfg.int8_encoder,
            name="attention",
        )
        attn_out = nn.Dropout(cfg.hidden_dropout)(
            attn_out, deterministic=deterministic
        )
        x = x + attn_out
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)

        if cfg.int8_encoder:
            from ..ops.attention import _DenseParams
            from ..ops.int8 import int8_dense

            wi, bi = _DenseParams(cfg.hidden_size, cfg.intermediate_size,
                                  name="intermediate_dense")()
            h = int8_dense(x, wi, bi, out_dtype=cfg.dtype)
        else:
            h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                         precision=cfg.precision,
                         name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=cfg.gelu_approximate)
        h = nn.Dropout(cfg.activation_dropout)(h, deterministic=deterministic)
        if cfg.int8_encoder:
            wo, bo = _DenseParams(cfg.intermediate_size, cfg.hidden_size,
                                  name="output_dense")()
            h = int8_dense(h, wo, bo, out_dtype=cfg.dtype)
        else:
            h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                         precision=cfg.precision, name="output_dense")(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        x = x + h
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="final_layer_norm")(x)
        return x


class HubertModel(nn.Module):
    """Full HuBERT encoder: waveform in, frame features out.

    ``__call__(input_values (B, L), attention_mask (B, L) or None,
    mask_time_indices (B, T) bool or None)`` -> last_hidden_state (B, T, 768).
    """

    config: HubertConfig

    @nn.compact
    def __call__(
        self,
        input_values: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        mask_time_indices: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        feats = ConvFeatureEncoder(cfg, name="feature_extractor")(input_values)
        num_frames = feats.shape[1]

        frame_mask = None
        if attention_mask is not None:
            frame_mask = feature_vector_attention_mask(
                cfg, attention_mask, num_frames
            )

        x = FeatureProjection(cfg, name="feature_projection")(
            feats.astype(cfg.dtype), deterministic=deterministic
        )

        # created unconditionally so the param tree is call-shape independent
        masked_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0),
            (cfg.hidden_size,),
            jnp.float32,
        ).astype(cfg.dtype)
        if mask_time_indices is not None:
            x = jnp.where(mask_time_indices[..., None], masked_embed, x)

        attn_bias = None
        if frame_mask is not None:
            # make sure padded frames output 0 (HF zeroes them pre pos-conv)
            x = x * frame_mask[..., None].astype(x.dtype)
            big_neg = jnp.finfo(jnp.float32).min
            attn_bias = jnp.where(
                frame_mask[:, None, None, :] > 0, 0.0, big_neg
            ).astype(jnp.float32)

        x = x + PositionalConvEmbedding(cfg, name="pos_conv_embed")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="encoder_layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        layer_cls = EncoderLayer
        if cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        for i in range(cfg.num_hidden_layers):
            x = layer_cls(cfg, name=f"layer_{i}")(
                x, attn_bias, deterministic
            )
        return x

    def init_params(self, rng: jax.Array, example_len: int = 16000):
        wav = jnp.zeros((1, example_len), jnp.float32)
        return self.init(rng, wav)["params"]

"""Fused conv-frontend layer 0: Conv1d(k=10, s=5) + GroupNorm + GELU.

Layer 0 of the HuBERT waveform frontend is the single slowest op in the
model's forward pass on TPU: measured 9.1-10.6 ms of a ~32 ms forward at
B=32 x 5 s (scripts/frontend_l0_probe.py) for 0.7% of the FLOPs. Every XLA
formulation (strided conv, block conv, block matmul; f32 and bf16) lands
within 15% of the same wall time because the pipeline is HBM-bound: the XLA
schedule materializes the (B, T, 512) conv output, re-reads it for GroupNorm
statistics, and re-reads/writes it again for normalize+GELU — ~3-4 GB of
traffic for a 10 MB input.

This kernel removes all intermediate materialization. Two passes over a
host-built patch view (the only HBM-resident intermediate, 2x the input
size):

  pass 1 (stats):     y = patches @ W   computed in VMEM, only per-channel
                      sum / sum-of-squares leave the kernel  (reads ~40 MB)
  pass 2 (normalize): y recomputed in VMEM (FLOPs are trivial), GroupNorm
                      affine + exact GELU applied, single cast write of the
                      (B, T, 512) result                     (writes once)

GroupNorm(512 groups over 512 channels) == per-(batch, channel) moments over
the full time axis — including zero padded frames, matching the HF quirk the
model preserves (see models/hubert.py docstring). Statistics accumulate in
f32; variance = E[y^2] - E[y]^2 over T ~ 16k frames, within f32 headroom for
zero-mean audio.

Reference behavior replaced: `/root/reference/sylber/model/sylber.py:41`
(transformers HubertModel feature_extractor conv_layers[0] + GroupNorm +
GELU). Forward-only.

MEASURED OUTCOME (v5e, B=32 x 5 s): this kernel runs at 7.5-13 ms depending
on tile/dtype — it does NOT beat XLA, because the op turns out to be
VPU-bound on the GELU over the network's largest tensor (263 M elements),
not HBM-bound as the traffic analysis assumed; Mosaic's elementwise
throughput here is below XLA's fused epilogue. The shipped fast path is the
*analytic GroupNorm* XLA formulation instead (5.06 ms vs the 10.6 ms
baseline): moments computed exactly from the input via strided column sums
and the (k x k) patch Gram matrix, conv materialized once in bf16 with a
fused bf16 normalize+GELU epilogue — see
`models/hubert.py::_analytic_l0_stats` / `HubertConfig.frontend_l0_analytic`.
This kernel is retained as the Pallas reference implementation of the fused
design (parity-tested in interpret mode) for future Mosaic revisits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 1024
PATCH_PAD = 16  # patch width k=10 zero-padded to a friendlier lane count


def _erf(x):
    """f32-accurate erf (Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7).

    Mosaic has no erf/erfc lowering; this keeps the kernel's GELU exact to
    f32 round-off vs jax.nn.gelu(approximate=False)."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _stats_kernel(patches_ref, w_ref, nvalid_ref, stats_ref, *, tile_t):
    """Accumulate per-channel sum and sum-of-squares of the conv output.

    grid = (B, n_chunks); chunk index iterates fastest, so the (b,)-mapped
    stats block is revisited sequentially and accumulation is race-free.
    """
    t = pl.program_id(1)

    # HIGHEST: the MXU truncates f32 operands to bf16 at default precision
    y = jnp.dot(patches_ref[0], w_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (TILE_T, D)
    # rows at global index >= T0 can contain partial windows over real
    # samples (patch t covers [s*t, s*t + 2s)); they are not part of the
    # conv output and must not pollute the moments.
    row = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + t * tile_t
    y = jnp.where(row < nvalid_ref[0], y, 0.0)

    s1 = jnp.sum(y, axis=0, keepdims=True)        # (1, D)
    s2 = jnp.sum(y * y, axis=0, keepdims=True)    # (1, D)
    inc = jnp.concatenate([s1, s2], axis=0)       # (2, D)

    @pl.when(t == 0)
    def _():
        stats_ref[0] = inc

    @pl.when(t > 0)
    def _():
        stats_ref[0] += inc


def _normalize_kernel(patches_ref, w_ref, nvalid_ref, stats_ref, gamma_ref,
                      beta_ref, eps_ref, out_ref):
    """Recompute the conv tile, apply GroupNorm affine + exact GELU, write."""
    y = jnp.dot(patches_ref[0], w_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (TILE_T, D)
    n = nvalid_ref[0].astype(jnp.float32)
    mean = stats_ref[0, 0:1] / n                     # (1, D)
    var = stats_ref[0, 1:2] / n - mean * mean
    inv = jax.lax.rsqrt(var + eps_ref[0])
    out = (y - mean) * (inv * gamma_ref[:]) + beta_ref[:]
    out = 0.5 * out * (1.0 + _erf(out * (2.0 ** -0.5)))
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "kernel_size", "eps", "out_dtype", "tile_t",
                     "interpret"))
def fused_conv0_gn_gelu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    stride: int = 5,
    kernel_size: int = 10,
    eps: float = 1e-5,
    out_dtype=jnp.float32,
    tile_t: int = TILE_T,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x (B, L) -> gelu(groupnorm(conv1d(x, w))) (B, T, D)``.

    ``w``: (k, 1, D) flax Conv kernel (no bias); ``gamma``/``beta``: (D,)
    GroupNorm affine. Requires ``kernel_size <= 2 * stride`` (every patch
    spans at most two stride-blocks; holds for HuBERT's (10, 5)).
    """
    B, L = x.shape
    k, s, D = kernel_size, stride, w.shape[-1]
    assert w.shape[:2] == (k, 1), w.shape
    assert k <= 2 * s, (k, s)
    T0 = (L - k) // s + 1
    n_chunks = -(-T0 // tile_t)
    T_pad = n_chunks * tile_t

    # host-side patch view: (B, T_pad, 2s) zero-padded to PATCH_PAD lanes.
    # XLA fuses pad+reshape+concat into one ~2x-input-size materialization.
    need = (T_pad + 1) * s
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, need - L)))
    xb = xp.reshape(B, T_pad + 1, s)
    patches = jnp.concatenate([xb[:, :-1], xb[:, 1:]], axis=-1)
    patches = jnp.pad(patches, ((0, 0), (0, 0), (0, PATCH_PAD - 2 * s)))

    w2 = jnp.zeros((PATCH_PAD, D), jnp.float32).at[:k].set(
        w.reshape(k, D).astype(jnp.float32))
    nvalid = jnp.full((1,), T0, jnp.int32)
    eps_arr = jnp.full((1,), eps, jnp.float32)

    patch_spec = pl.BlockSpec((1, tile_t, PATCH_PAD),
                              lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((PATCH_PAD, D), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    stats_spec = pl.BlockSpec((1, 2, D), lambda b, t: (b, 0, 0),
                              memory_space=pltpu.VMEM)

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, tile_t=tile_t),
        grid=(B, n_chunks),
        in_specs=[patch_spec, w_spec, n_spec],
        out_specs=stats_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2, D), jnp.float32),
        interpret=interpret,
    )(patches, w2, nvalid)

    vec_spec = pl.BlockSpec((D,), lambda b, t: (0,),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _normalize_kernel,
        grid=(B, n_chunks),
        in_specs=[patch_spec, w_spec, n_spec, stats_spec, vec_spec, vec_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tile_t, D), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T0, D), jnp.dtype(out_dtype)),
        interpret=interpret,
    )(patches, w2, nvalid, stats, gamma.astype(jnp.float32),
      beta.astype(jnp.float32), eps_arr)
    return out

"""Fused single-block attention kernel for short sequences (L <= ~512).

The encoder runs attention at L=250 (5-s crops, 50 Hz) where the blocked
flash kernel's online-softmax machinery is pure overhead and XLA's fused
path measures ~0.14 ms per application on v5e (~23% of peak; the residue is
softmax + layout transposes between the fused matmuls —
`scripts/encoder_op_probe.py`). This kernel computes the whole
QK^T -> mask -> softmax -> PV chain for one batch item (all heads) in one
VMEM-resident program instance: no HBM round-trip for the score matrix and
no inter-op relayouts. Grid = (B,); per instance VMEM is
3*(H, L, D) bf16 + (H, L, L) fp32 scores (~4 MB at B-block granularity for
H=12, L=250, D=64) — well inside the ~16 MB budget, and Pallas
double-buffers the HBM->VMEM streams across grid steps.

Masking: key padding only, expressed as a per-batch valid KV length
(scalar-prefetch + in-kernel ``broadcasted_iota`` compare). The HF additive
(B, 1, 1, L) bias form is converted at the wrapper: in this framework that
bias always encodes a contiguous-suffix key padding (frame masks are
downsampled sample lengths, `models/hubert.py`), so ``kv_len`` is exactly
equivalent. The earlier in-kernel ``s + bias`` broadcast form compiled in
interpret mode but CHECK-crashed Mosaic's vector layout pass on real v5e
hardware (``vector_extract limits 32 vs dim 1``, 2026-08): broadcasting a
unit sublane dim of a (1, L) vector into (H, L, L) is the unsupported bit —
hence the iota/where design. Callers with richer biases or probability
dropout use the XLA path (`ops/attention.py` dispatch).

Measured on v5e (scripts/attn_core_probe.py, scan-amortized ITERS=128,
adjacent A/B, bf16, B=32 H=12 L=250 D=64 — the stage-2 training shape):
XLA fused path 0.299 ms/application vs this kernel 0.352 ms (0.85x), with
BIT-IDENTICAL outputs (same fp32 matmul/softmax chain, max |diff| = 0).
Both paths are VPU-bound on the fp32 softmax at this shape; the single-block
kernel only removes layout transposes XLA already amortizes, and adds grid
overhead. Conclusion: XLA stays the default at practical lengths — this
kernel is kept as the measured-and-beaten experiment that closes the
"is the attention-core residue irreducible?" question (round-3 verdict #6).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this, the (H, L, L) fp32 score block outgrows a sane VMEM slice;
# the blocked flash kernel (flash.py) is the long-L design
MAX_SEQ = 512

_NEG = -1e30  # exp(s + _NEG - max) == 0 in fp32, like HF's finfo.min bias


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    # refs are (H, L, D): the batch dim is dropped via None block dims —
    # indexing a leading unit dim out of a 4D vector trips the same Mosaic
    # vector-extract CHECK as the bias broadcast (fine in interpret mode).
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (H, L, L)
    kv_len = len_ref[pl.program_id(0)]
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(idx < kv_len, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (H, L, D)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention_small(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kv_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, L, D) fused attention; numerics match the XLA path (q scaled
    before the matmul, fp32 softmax).

    ``bias``: HF key-padding form (B, 1, 1, L), 0 = attend / very-negative =
    masked, encoding a contiguous valid prefix — converted in-graph to
    ``kv_len``. Pass ``kv_len`` (B,) int32 directly to skip the conversion.
    """
    B, H, L, D = q.shape
    assert L <= MAX_SEQ, (L, MAX_SEQ)
    if scale is None:
        scale = D ** -0.5
    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
    if kv_len is None:
        if bias is None:
            kv_len = jnp.full((B,), L, jnp.int32)
        else:
            assert bias.shape[-3:] == (1, 1, L) or bias.shape[1:] == (1, 1, L), \
                f"key-padding bias (B,1,1,L) only, got {bias.shape}"
            b = jnp.broadcast_to(bias, (B, 1, 1, L)).reshape(B, L)
            kv_len = jnp.sum((b > -1.0).astype(jnp.int32), axis=-1)
    kv_len = kv_len.astype(jnp.int32)

    blk = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, lens: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[blk(None, H, L, D), blk(None, H, L, D), blk(None, H, L, D)],
        out_specs=blk(None, H, L, D),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        interpret=interpret,
    )(kv_len, qs, k, v)

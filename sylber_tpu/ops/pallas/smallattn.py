"""Fused single-block attention kernel for short sequences (L <= ~512).

The encoder runs attention at L=250 (5-s crops, 50 Hz) where the blocked
flash kernel's online-softmax machinery is pure overhead and XLA's fused
path measures ~0.14 ms per application on v5e (~23% of peak; the residue is
softmax + layout transposes between the fused matmuls —
`scripts/encoder_op_probe.py`). This kernel computes the whole
QK^T -> bias -> softmax -> PV chain for one batch item (all heads) in one
VMEM-resident program instance: no HBM round-trip for the score matrix and
no inter-op relayouts. Grid = (B,); per instance VMEM is
3*(H, L, D) bf16 + (H, L, L) fp32 scores (~4 MB at B-block granularity for
H=12, L=250, D=64) — well inside the ~16 MB budget, and Pallas
double-buffers the HBM->VMEM streams across grid steps.

Bias: the HF key-padding form (B, 1, 1, L) only (what HubertModel builds);
callers with richer biases or probability-dropout use the XLA path.

Measured on v5e (see CLAUDE.md): this kernel vs the XLA fused path at
L=250 B=32 H=12 D=64 — numbers recorded by scripts/attn_core_probe.py.
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


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
    q = q_ref[0]  # (H, L, D), query pre-scaled by the caller
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (H, L, L)
    s = s + b_ref[0, 0]                              # (1, L) -> broadcast
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (H, L, D)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention_small(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, L, D) fused attention; numerics match the XLA path (q scaled
    before the matmul, fp32 softmax)."""
    B, H, L, D = q.shape
    assert L <= MAX_SEQ, (L, MAX_SEQ)
    if scale is None:
        scale = D ** -0.5
    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
    if bias is None:
        bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    else:
        assert bias.shape[-3:] == (1, 1, L) or bias.shape[1:] == (1, 1, L), \
            f"key-padding bias (B,1,1,L) only, got {bias.shape}"
        bias = jnp.broadcast_to(bias, (B, 1, 1, L)).astype(jnp.float32)

    blk = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[blk(1, H, L, D), blk(1, H, L, D), blk(1, H, L, D),
                  blk(1, 1, 1, L)],
        out_specs=blk(1, H, L, D),
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        interpret=interpret,
    )(qs, k, v, bias)

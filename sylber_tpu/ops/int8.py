"""Dynamic W8A8 int8 matmul for TPU inference.

The v5e MXU executes int8xint8->int32 at ~2x its bf16 FLOP rate (394 vs 197
T-ops/s), so the encoder's projection/FFN matmuls — the bulk of inference
device time once the frontend is amortized — can run close to twice as fast
under 8-bit quantization. This module implements the standard dynamic
scheme used for transformer post-training quantization:

- weights: symmetric per-output-channel scales (max-abs / 127);
- activations: symmetric per-token (per-row) scales computed on the fly;
- accumulation in int32 on the MXU (``preferred_element_type``), rescaled
  by the outer product of the two scale vectors.

Both quantizations happen *in-graph*: weights are jit arguments (not
constants), so re-quantizing costs one VPU pass over the ~64 M encoder
params (~0.1 ms/forward) — negligible against the matmul savings and it
keeps the checkpoint/param-tree format unchanged (no surgery, EMA/TP specs
untouched). Inference-only: no straight-through estimators here; the
training path stays bf16/f32.

No reference counterpart (the reference serves fp32 torch,
`/root/reference/sylber/model/sylber.py:122`); accuracy is gated the same
way as the bf16 fast path — boundary-F1 against the exact fp32 program on
a trained model (bench.py fast-vs-exact harness).

Measured outcome (scripts/int8_probe.py, v5e, trained 768-d fixture,
B=32): boundary-F1 vs exact fp32 = 0.992/0.999/0.9997 at 4/8/16 s, but
RTFx is NEUTRAL-to-slower vs bf16 (0.998/0.987/0.939x) — at 768-d the
dynamic per-token quantize/rescale VPU passes cancel the int8 MXU-rate
gain. The mode is kept (correct, gated, param-tree-compatible) because the
crossover favors int8 as hidden width grows and matmuls dominate; it is
NOT the default serving mode at this model size.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jnp.ndarray, axis) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization along ``axis`` (the contracted dim).

    Returns ``(q, scale)`` with ``q ~ round(x / scale)`` in int8 and
    ``scale`` shaped like ``x`` reduced over ``axis`` (kept dims).
    Zero rows/columns quantize to zeros with a unit-epsilon scale.
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """``x @ w + b`` with dynamic W8A8 int8 quantization.

    ``x``: (..., K) float; ``w``: (K, N) float; returns (..., N) in
    ``out_dtype`` (defaults to ``x.dtype``). The contraction runs int8 on
    the MXU with int32 accumulation — exact given the quantized operands —
    then rescales by per-row (activation) and per-column (weight) scales.
    """
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_symmetric(x.astype(jnp.float32), axis=-1)
    wq, sw = quantize_symmetric(w.astype(jnp.float32), axis=0)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * sx * sw  # sx: (..., 1), sw: (1, N) -> outer-product rescale
    if b is not None:
        y = y + b
    return y.astype(out_dtype)

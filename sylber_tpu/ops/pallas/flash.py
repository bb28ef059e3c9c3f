"""Blocked flash attention for TPU (Pallas).

Replaces the reference's torch-SDPA shim (`/root/reference/sylber/model/attend.py`)
on the TPU hot path: online-softmax streaming over key blocks keeps the
(L, L) score matrix out of HBM — scores live in VMEM one (BQ, BK) tile at a
time.

Kernel structure: grid (batch*heads, num_q_blocks, num_k_blocks) with the
k dimension innermost, so Mosaic double-buffers the K/V block DMAs while the
MXU computes; the running max / normalizer / accumulator live in VMEM
scratch and persist across the k grid steps (same q block is revisited).
This is the canonical performant TPU layout — an earlier variant with an
in-kernel fori_loop over a fully-resident K was measured 17x slower.

Supports the two bias patterns this framework produces:
- key-padding bias broadcastable as (B, 1, 1, L) (HuBERT frame masks);
- no bias (voicebox with qk-norm scale override).
Anything else falls back to the XLA path in the caller.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _flash_kernel(q_ref, k_ref, v_ref, kmask_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, scale):
    # q_ref (1, BQ, D) revisited over k; k_ref/v_ref (1, BK, D);
    # kmask_ref (1, 1, BK); o_ref (1, BQ, D); scratch: acc (BQ, D),
    # m/l (BQ, 128) broadcast across lanes.
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    mask = kmask_ref[0, 0, :]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BK)
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    # explicit zeroing: for rows whose every key so far is masked,
    # s - m_new == 0 and exp would contribute weight-1 garbage
    p = jnp.where(mask[None, :] > 0, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)

    l_ref[:] = jnp.broadcast_to(
        l_ref[:, :1] * alpha + p.sum(axis=-1, keepdims=True), l_ref.shape)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _finish():
        # fully-masked query rows (padding) -> 0, not NaN
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash(q, k, v, kmask, scale, block_q=512, block_k=512):
    BH, L, D = q.shape
    bq = min(block_q, L)
    bk = next(b for b in (block_k, 512, 256, 128, bq) if L % b == 0)
    grid = (BH, L // bq, L // bk)

    kernel = functools.partial(_flash_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # bh/q blocks are independent; the k dim accumulates in scratch.
            # Without these semantics Mosaic serializes the whole grid
            # conservatively (measured 10-20x slower).
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * L * L * D,
            bytes_accessed=BH * L * D * 4 * 4,
            transcendentals=BH * L * L,
        ),
    )(q, k, v, kmask)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """(B, H, L, D) attention; ``bias`` None or key-padding (B, 1, 1, L)."""
    B, H, L, D = q.shape
    if scale is None:
        scale = D ** -0.5

    if bias is not None:
        assert bias.shape[-1] == L and bias.shape[-2] == 1, bias.shape
        kmask = (bias.reshape(B, L) >= -1e20).astype(jnp.int32)
    else:
        kmask = jnp.ones((B, L), jnp.int32)

    Lp = _round_up(L, 128)
    if Lp > block_q:
        Lp = _round_up(Lp, block_q)
    if Lp != L:
        pad = Lp - L
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kmask = jnp.pad(kmask, ((0, 0), (0, pad)))

    qf = q.reshape(B * H, Lp, D)
    kf = k.reshape(B * H, Lp, D)
    vf = v.reshape(B * H, Lp, D)
    km = jnp.repeat(kmask[:, None, None, :], H, axis=1).reshape(B * H, 1, Lp)

    out = _flash(qf, kf, vf, km, float(scale), block_q, block_k)
    out = out.reshape(B, H, Lp, D)
    return out[:, :, :L, :]

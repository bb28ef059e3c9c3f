"""Conditional flow matching: training loss + fixed-grid ODE sampling.

Replaces the reference CFM wrapper
(`/root/reference/sylber/model/flowmatching.py:695-871`):

- loss: t ~ U[0,1], w = (1 - (1 - sigma) t) x0 + t x1, flow = x1 - (1-sigma) x0,
  masked-L1 regression of the predicted vector field (eq. 5-6 of the
  Voicebox paper, `flowmatching.py:826-871`). The reference's released
  SegmentSynthesis training forward is broken dead code (SURVEY.md §2.4.3);
  here the conditioning follows the voicebox infilling setup: ``cond = x1``
  masked by a random frac-length span.
- sampling: y0 = randn * rand_scale, fixed-grid *midpoint* integration over
  t = linspace(0, 1, steps) expressed as a `lax.scan` — equivalent to the
  reference's torchdiffeq ``method='midpoint'`` on the same grid (fixed-step
  solvers ignore atol/rtol), with no host round-trips per step. ``steps=1``
  returns y0 (reference behavior).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def mask_from_frac_lengths(rng: jax.Array, batch: int, seq_len: int,
                           frac_range=(0.7, 1.0)) -> jnp.ndarray:
    """Random contiguous span covering a fraction of the sequence
    (`flowmatching.py:112-141`)."""
    k1, k2 = jax.random.split(rng)
    frac = jax.random.uniform(k1, (batch,)) * (frac_range[1] - frac_range[0]) \
        + frac_range[0]
    lengths = (frac * seq_len).astype(jnp.int32)
    max_start = seq_len - lengths
    start = jnp.maximum(
        (max_start * jax.random.uniform(k2, (batch,))), 0.0)
    end = start + lengths
    seq = jnp.arange(seq_len)[None, :]
    return (seq >= start[:, None].astype(jnp.int32)) & (seq < end[:, None])


def cfm_loss(
    apply_fn: Callable,
    rng: jax.Array,
    x1: jnp.ndarray,
    cond_emb: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    sigma: float = 0.0,
    frac_lengths_mask=(0.7, 1.0),
    train: bool = True,
) -> jnp.ndarray:
    """``apply_fn(x, times, cond, cond_emb, self_attn_mask, cond_mask,
    rngs) -> pred``; returns the scalar masked-L1 flow-matching loss."""
    B, L, _ = x1.shape
    k0, kt, km, kd = jax.random.split(rng, 4)
    x0 = jax.random.normal(k0, x1.shape, x1.dtype)
    times = jax.random.uniform(kt, (B,), x1.dtype)
    t = times[:, None, None]
    w = (1.0 - (1.0 - sigma) * t) * x0 + t * x1
    flow = x1 - (1.0 - sigma) * x0

    cond_mask = mask_from_frac_lengths(km, B, L, frac_lengths_mask)
    pred = apply_fn(w, times, x1, cond_emb, mask, cond_mask, kd, train)

    loss_mask = cond_mask if mask is None else (cond_mask & (mask > 0))
    per_frame = jnp.abs(pred - flow).mean(-1)
    per_frame = jnp.where(loss_mask, per_frame, 0.0)
    num = per_frame.sum(-1)
    den = jnp.maximum(loss_mask.sum(-1).astype(per_frame.dtype), 1e-5)
    return (num / den).mean()


def sample_midpoint(
    apply_fn: Callable,
    rng: jax.Array,
    cond_emb: jnp.ndarray,
    dim_out: int,
    steps: int = 5,
    rand_scale: float = 0.0,
    method: str = "midpoint",
) -> jnp.ndarray:
    """Integrate the learned vector field on a fixed grid.

    ``apply_fn(x, times) -> dx/dt`` (conditioning closed over).
    ``method``: "midpoint" (default, matches the reference's torchdiffeq
    solver on t = linspace(0, 1, steps)), "euler", or "rk4" (covers the
    reference's adaptive-torchode accuracy regime with a fixed grid —
    adaptivity buys nothing under jit with these small step counts).
    """
    B, L, _ = cond_emb.shape
    y0 = jax.random.normal(rng, (B, L, dim_out), jnp.float32) * rand_scale
    if steps <= 1:
        return y0
    ts = jnp.linspace(0.0, 1.0, steps)

    def body(y, i):
        t0, t1 = ts[i], ts[i + 1]
        h = t1 - t0
        k1 = apply_fn(y, t0)
        if method == "euler":
            y_new = y + h * k1
        elif method == "midpoint":
            k2 = apply_fn(y + 0.5 * h * k1, t0 + 0.5 * h)
            y_new = y + h * k2
        elif method == "rk4":
            k2 = apply_fn(y + 0.5 * h * k1, t0 + 0.5 * h)
            k3 = apply_fn(y + 0.5 * h * k2, t0 + 0.5 * h)
            k4 = apply_fn(y + h * k3, t1)
            y_new = y + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        else:
            raise ValueError(f"unknown ODE method {method!r}")
        return y_new, None

    y, _ = jax.lax.scan(body, y0, jnp.arange(steps - 1))
    return y

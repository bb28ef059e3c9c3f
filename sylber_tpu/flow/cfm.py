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
- adaptive sampling (:func:`sample_adaptive`): embedded RK pairs (dopri5 /
  tsit5) with error-controlled step size under a `lax.while_loop` — the
  TPU-native counterpart of the reference's torchdiffeq adaptive path and
  torchode Tsit5 + torch.compile path (`flowmatching.py:796,806-824`,
  ``atol=rtol=1e-5``). One shared step size for the whole batch (torchdiffeq
  semantics: it integrates the flattened batch as a single ODE state;
  torchode steps per-sample, a throughput optimization for ragged batches —
  with equal-length resynthesis batches the accepted trajectories coincide
  within tolerance).
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


# ---------------------------------------------------------------------------
# Adaptive embedded Runge-Kutta (dopri5 / tsit5), lax.while_loop driven.
# ---------------------------------------------------------------------------

# Dormand-Prince 5(4) — torchdiffeq's default adaptive solver. FSAL: the
# 7th stage at t+h equals the next step's first stage; b == a[6].
_DOPRI5_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DOPRI5_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DOPRI5_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DOPRI5_B_ERR = tuple(
    b - bs for b, bs in zip(
        _DOPRI5_B,
        (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
         187 / 2100, 1 / 40)))

# Tsitouras 5(4) (2011) — the torchode method class used by the reference
# (`flowmatching.py:806-824`). Also FSAL.
_TSIT5_C = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
_TSIT5_A = (
    (),
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525),
    (5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383),
    (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774),
)
_TSIT5_B = _TSIT5_A[6] + (0.0,)
# btilde = b - b* (error-estimate weights), OrdinaryDiffEq.jl convention
_TSIT5_B_ERR = (-0.00178001105222577714, -0.0008164344596567469,
                0.007880878010261995, -0.1447110071732629,
                0.5823571654525552, -0.45808210592918697,
                1 / 66)

_TABLEAUS = {"dopri5": (_DOPRI5_C, _DOPRI5_A, _DOPRI5_B, _DOPRI5_B_ERR),
             "tsit5": (_TSIT5_C, _TSIT5_A, _TSIT5_B, _TSIT5_B_ERR)}


def odeint_adaptive(
    f: Callable,
    y0: jnp.ndarray,
    t0: float = 0.0,
    t1: float = 1.0,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    method: str = "tsit5",
    max_steps: int = 1024,
    safety: float = 0.9,
    ifactor: float = 10.0,
    dfactor: float = 0.2,
    h0: float = 0.01,
):
    """Integrate ``dy/dt = f(y, t)`` from t0 to t1 with an embedded RK pair
    and error-proportional step control (accept if the RMS of
    ``err / (atol + rtol * max(|y|, |y_new|))`` is <= 1; next
    ``h *= clip(safety * err^(-1/5), dfactor, ifactor)`` — torchdiffeq's
    controller). Static shapes, bounded by ``max_steps`` loop trips; jittable.

    Returns ``(y1, stats)`` with ``stats = (n_accepted, n_rejected,
    t_reached)``; ``t_reached < t1`` means the step budget ran out and ``y1``
    is the state at ``t_reached``, not the endpoint.
    """
    cs, a_rows, bs, b_errs = _TABLEAUS[method]
    n_stages = len(cs)
    y0 = y0.astype(jnp.float32)
    t0 = jnp.float32(t0)
    t1 = jnp.float32(t1)

    def err_norm(err, y_old, y_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
        r = err / scale
        return jnp.sqrt((r * r).mean())

    def one_step(y, t, h, k1):
        ks = [k1]
        for i in range(1, n_stages):
            yi = y + h * sum(a * k for a, k in zip(a_rows[i], ks)
                             if a != 0.0)
            ks.append(f(yi, t + cs[i] * h))
        y_new = y + h * sum(b * k for b, k in zip(bs, ks) if b != 0.0)
        err = h * sum(be * k for be, k in zip(b_errs, ks) if be != 0.0)
        return y_new, err, ks[-1]  # FSAL: last stage = f(y_new, t + h)

    def cond(carry):
        y, t, h, k1, acc, rej = carry
        return (t < t1) & (acc + rej < max_steps)

    def body(carry):
        y, t, h, k1, acc, rej = carry
        h_eff = jnp.minimum(h, t1 - t)
        y_new, err, k_last = one_step(y, t, h_eff, k1)
        en = err_norm(err, y, y_new)
        accept = en <= 1.0
        factor = jnp.clip(safety * jnp.maximum(en, 1e-10) ** -0.2,
                          dfactor, ifactor)
        h_next = h_eff * factor
        y = jnp.where(accept, y_new, y)
        t = jnp.where(accept, t + h_eff, t)
        k1 = jnp.where(accept, k_last, k1)
        return (y, t, h_next, k1,
                acc + accept.astype(jnp.int32),
                rej + (~accept).astype(jnp.int32))

    k1 = f(y0, t0)
    init = (y0, t0, jnp.float32(h0), k1, jnp.int32(0), jnp.int32(0))
    y, t, h, k1, acc, rej = jax.lax.while_loop(cond, body, init)

    def _warn(t_reached):
        jax.debug.print(
            "odeint_adaptive: step budget exhausted at t={t} < {t1} "
            "(accepted+rejected = max_steps); result is the state at t, "
            "not t1 — loosen atol/rtol or raise max_steps", t=t_reached,
            t1=t1)
        return t_reached

    # surface budget exhaustion instead of silently returning a partial
    # trajectory (torchdiffeq raises here; under jit we warn + expose stats)
    t = jax.lax.cond(t < t1, _warn, lambda tt: tt, t)
    return y, (acc, rej, t)


def sample_adaptive(
    apply_fn: Callable,
    rng: jax.Array,
    cond_emb: jnp.ndarray,
    dim_out: int,
    rand_scale: float = 0.0,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    method: str = "tsit5",
    max_steps: int = 1024,
    return_stats: bool = False,
):
    """Adaptive-step counterpart of :func:`sample_midpoint`: integrate the
    learned vector field from t=0 to 1 with torchode/torchdiffeq-equivalent
    error control (reference default atol=rtol=1e-5).

    With ``return_stats`` returns ``(y1, stats)`` where ``stats`` is a dict of
    ``accepted``/``rejected`` step counts and a ``complete`` flag — False when
    the ``max_steps`` budget ran out before t=1 and ``y1`` is the state at the
    last accepted time, not the endpoint (torchdiffeq raises in that case;
    under jit we expose it as data)."""
    B, L, _ = cond_emb.shape
    y0 = jax.random.normal(rng, (B, L, dim_out), jnp.float32) * rand_scale
    y1, (acc, rej, t) = odeint_adaptive(apply_fn, y0, atol=atol, rtol=rtol,
                                        method=method, max_steps=max_steps)
    if return_stats:
        stats = {"accepted": acc, "rejected": rej, "complete": t >= 1.0}
        return y1, stats
    return y1

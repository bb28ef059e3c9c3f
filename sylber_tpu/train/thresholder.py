"""Online norm-threshold estimation as a pure stats pytree.

Functional re-expression of the reference's Parameter-hack Thresholder
(`/root/reference/sylber/utils/segment_utils.py:6-64`): EMA-tracked
signal/noise Gaussians over frame norms, with the decision threshold at the
root of the quadratic obtained by equating the two Gaussian likelihoods.
Living in-graph (pure functions of norms) removes the reference's per-step
GPU->CPU `.item()` sync (`sylber/model/sylber.py:220,262`).

Stage-2 init: signal(6.10, 0.87), noise(0.34, 0.34)
(`sylber_configs/sylber_base_stage2.yaml:17-21`), decay 0.9999, eta 1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ThresholderState(NamedTuple):
    signal_mean: jnp.ndarray
    signal_var: jnp.ndarray
    noise_mean: jnp.ndarray
    noise_var: jnp.ndarray
    # fixed threshold (NaN = estimate from stats), mirrors the reference's
    # `threshold=...` constructor branch (segment_utils.py:18-25)
    fixed: jnp.ndarray


def thresholder_init(
    signal_mean: float = 6.10,
    signal_var: float = 0.87,
    noise_mean: float = 0.34,
    noise_var: float = 0.34,
    threshold: Optional[float] = None,
) -> ThresholderState:
    return ThresholderState(
        jnp.float32(signal_mean),
        jnp.float32(signal_var),
        jnp.float32(noise_mean),
        jnp.float32(noise_var),
        jnp.float32(jnp.nan if threshold is None else threshold),
    )


def get_threshold(state: ThresholderState, eta: float = 1.0) -> jnp.ndarray:
    """Gaussian likelihood-ratio threshold (segment_utils.py:27-52)."""
    mu_s, mu_n = state.signal_mean, state.noise_mean
    sig_s = jnp.sqrt(state.signal_var + 1e-8)
    sig_n = jnp.sqrt(state.noise_var + 1e-8)
    a = sig_s ** 2 - sig_n ** 2
    b = -2.0 * sig_s ** 2 * mu_n + 2.0 * sig_n ** 2 * mu_s
    c = (
        sig_s ** 2 * mu_n ** 2
        - sig_n ** 2 * mu_s ** 2
        - 2.0 * sig_n ** 2 * sig_s ** 2 * (jnp.log(eta) + jnp.log(sig_s / sig_n))
    )
    disc = b ** 2 - 4.0 * a * c
    take_pos = (mu_s > mu_n).astype(jnp.float32)
    quad = jnp.where(
        disc > 0,
        (-b + take_pos * jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a),
        -b / (2.0 * a),
    )
    linear = -c / b
    thr = jnp.where(a != 0, quad, linear)
    return jnp.where(jnp.isnan(state.fixed), thr, state.fixed)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> tuple:
    cnt = mask.sum()
    mean = jnp.where(cnt > 0, (x * mask).sum() / jnp.maximum(cnt, 1), 0.0)
    return mean, cnt


def update_stats(
    state: ThresholderState,
    signal: Optional[jnp.ndarray] = None,
    signal_mask: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
    noise_mask: Optional[jnp.ndarray] = None,
    decay: float = 0.9999,
) -> ThresholderState:
    """EMA stats update (segment_utils.py:55-64). ``signal``/``noise`` are
    flat norm tensors with boolean masks selecting the contributing entries
    (the reference passes pre-filtered tensors; masks keep shapes static).
    Empty selections leave stats unchanged. Variance uses the *updated* mean,
    matching the reference exactly."""
    sm, sv, nm, nv = (state.signal_mean, state.signal_var,
                      state.noise_mean, state.noise_var)
    if signal is not None:
        mask = (signal_mask if signal_mask is not None
                else jnp.ones_like(signal)).astype(jnp.float32)
        mean, cnt = _masked_mean(signal, mask)
        new_sm = decay * sm + (1 - decay) * mean
        var, _ = _masked_mean((signal - new_sm) ** 2, mask)
        new_sv = decay * sv + (1 - decay) * var
        sm = jnp.where(cnt > 0, new_sm, sm)
        sv = jnp.where(cnt > 0, new_sv, sv)
    if noise is not None:
        mask = (noise_mask if noise_mask is not None
                else jnp.ones_like(noise)).astype(jnp.float32)
        mean, cnt = _masked_mean(noise, mask)
        new_nm = decay * nm + (1 - decay) * mean
        var, _ = _masked_mean((noise - new_nm) ** 2, mask)
        new_nv = decay * nv + (1 - decay) * var
        nm = jnp.where(cnt > 0, new_nm, nm)
        nv = jnp.where(cnt > 0, new_nv, nv)
    # fixed-threshold mode never updates (segment_utils.py:56-57)
    est = jnp.isnan(state.fixed)
    return ThresholderState(
        jnp.where(est, sm, state.signal_mean),
        jnp.where(est, sv, state.signal_var),
        jnp.where(est, nm, state.noise_mean),
        jnp.where(est, nv, state.noise_var),
        state.fixed,
    )

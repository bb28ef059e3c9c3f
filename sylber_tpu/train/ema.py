"""EMA teacher as a param pytree (replaces the reference's fairseq-derived
module-deepcopy EMA, `/root/reference/sylber/model/ema_module.py:34-211`).

The teacher is just a second pytree updated functionally inside the jitted
train step — no module copying, no per-parameter in-place loops. Note both
reference training configs freeze the teacher (``ema_decay: 1.0``,
`sylber_configs/sylber_base.yaml:4`); decay < 1 is fully supported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params, fp32_shadow: bool = False):
    """Teacher starts as a copy of the student (ema_module.py:57-59).

    ``fp32_shadow=True`` keeps the EMA master in float32 even when the
    student params are bf16 — the reference's fp32 shadow params
    (`ema_module.py:79-109`). With decay close to 1, per-step increments
    ``(1-decay)*param`` underflow bf16's 8-bit mantissa and the teacher
    freezes/drifts; the f32 master accumulates them correctly. Cast back
    with :func:`ema_restore` when bf16 teacher weights are needed.
    """
    if fp32_shadow:
        return jax.tree.map(
            lambda p: p.astype(jnp.float32)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
    return jax.tree.map(lambda p: p, params)


def ema_update(ema_params, params, decay):
    """ema = decay * ema + (1 - decay) * param, per leaf (accumulated in the
    EMA leaf's dtype — float32 when initialized with ``fp32_shadow``)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )


def ema_restore(ema_params, params_like):
    """Cast the (possibly fp32-shadow) EMA tree back to the student param
    dtypes — the reference's ``EMAModule.restore``/``reverse`` consumer path
    (`ema_module.py:180-211`): used to materialize teacher weights in the
    model's storage precision."""
    return jax.tree.map(
        lambda e, p: e.astype(p.dtype), ema_params, params_like)

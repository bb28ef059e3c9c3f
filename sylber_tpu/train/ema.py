"""EMA teacher as a param pytree (replaces the reference's fairseq-derived
module-deepcopy EMA, `/root/reference/sylber/model/ema_module.py:34-211`).

The teacher is just a second pytree updated functionally inside the jitted
train step — no module copying, no per-parameter in-place loops. Note both
reference training configs freeze the teacher (``ema_decay: 1.0``,
`sylber_configs/sylber_base.yaml:4`); decay < 1 is fully supported.
"""

from __future__ import annotations

import jax


def ema_init(params):
    """Teacher starts as a copy of the student (ema_module.py:57-59)."""
    return jax.tree.map(lambda p: p, params)


def ema_update(ema_params, params, decay):
    """ema = decay * ema + (1 - decay) * param, per leaf."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )

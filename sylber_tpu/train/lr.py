"""Learning-rate schedule: linear warmup -> cosine to a floor, with hold.

Matches the reference `COSLRLAMBDA` exactly
(`/root/reference/sylber/utils/lr_schedule.py:22-37`). Both stages configure
``min_factor: 1`` -> effectively constant LR after warmup
(`sylber_configs/sylber_base.yaml:19`). The reference's `LRLAMBDA` (`:3-19`)
is dead/buggy (its decay term is identically ~0) and deliberately not
replicated.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_factor: float = 0.05,
    hold_steps: int = 0,
):
    """Returns an optax-compatible ``step -> lr`` callable (traceable)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, float(warmup_steps))
        net = jnp.maximum(0.0, step - warmup_steps - hold_steps)
        cos = min_factor + (1.0 - min_factor) * (
            1.0 + jnp.cos(net / max(1, total_steps) * jnp.pi)
        ) / 2.0
        factor = jnp.where(
            step < warmup_steps,
            warm,
            jnp.where(step > (total_steps + hold_steps + warmup_steps),
                      min_factor, cos),
        )
        return base_lr * factor

    return schedule

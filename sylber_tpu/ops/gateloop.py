"""GateLoop: data-dependent gated linear recurrence as an associative scan.

The reference Transformer can interleave ``SimpleGateLoopLayer`` blocks from
the ``gateloop-transformer`` package before each attention block
(`/root/reference/sylber/model/flowmatching.py:26,390,456-457`), gated by
``use_gateloop_layers`` — which every shipped reference config leaves False.
This module provides the TPU-native counterpart so the knob exists here too.

The simple (one-headed, per-channel scalar state) GateLoop recurrence is

    s_t = a_t * s_{t-1} + kv_t          (s_0 = 0,  a_t = sigmoid(gate_t))
    o_t = q_t * s_t

per channel. On TPU this is a textbook first-order linear recurrence: the
pairs ``(a, kv)`` form a monoid under ``(a2*a1, a2*kv1 + kv2)``, so the whole
sequence evaluates in O(log L) depth with `jax.lax.associative_scan` — no
serial loop, fully fused by XLA (the reference package itself falls back to
a jax.lax.associative_scan when asked, `flowmatching.py:363,390`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gate_loop_operator(q: jnp.ndarray, kv: jnp.ndarray,
                       a: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the gated linear recurrence along axis 1.

    q, kv, a: (B, L, D); ``a`` already in (0, 1). Returns (B, L, D) with
    ``out[:, t] = q[:, t] * sum_{u<=t} (prod_{v=u+1..t} a[:, v]) * kv[:, u]``.
    """
    a32 = a.astype(jnp.float32)
    kv32 = kv.astype(jnp.float32)

    def combine(x, y):
        a_i, kv_i = x
        a_j, kv_j = y
        return a_i * a_j, a_j * kv_i + kv_j

    _, state = jax.lax.associative_scan(combine, (a32, kv32), axis=1)
    return (q.astype(jnp.float32) * state).astype(q.dtype)


def gate_loop_operator_ref(q, kv, a):
    """Sequential reference (numpy semantics) for tests: O(L) serial form of
    the same recurrence."""
    import numpy as np

    q, kv, a = (np.asarray(x, np.float64) for x in (q, kv, a))
    out = np.zeros_like(q)
    state = np.zeros_like(q[:, 0])
    for t in range(q.shape[1]):
        state = a[:, t] * state + kv[:, t]
        out[:, t] = q[:, t] * state
    return out

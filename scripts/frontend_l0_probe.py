"""Probe layer-0 of the conv frontend: conv(1->512, k=10, s=5) + GroupNorm +
GELU variants on TPU.

Per-layer attribution (frontend_s2d_probe.py S2D_PREFIXES=1) showed layer 0
is ~7.5 ms of the ~13.7 ms frontend forward at B=32 x 5 s — 55% of the time
for 0.7% of the FLOPs (C_in=1 starves any matmul/MXU lowering; f32 in/out
traffic is ~1 GB). Variants:

  conv-f32      baseline: lax.conv NWC f32 (what the model runs today)
  conv-bf16     conv computes/writes bf16; GroupNorm stats still f32
  block-conv    reshape (B, L/5, 5) then VALID conv k=2 s=1 (dense, C_in=5)
  block-matmul  concat adjacent blocks -> (B, L/5-1, 10) @ (10, 512)

All include the GroupNorm(512 groups == per-channel over length) + GELU that
follow layer 0 in the real model, so fusion effects are captured.
Equivalence of the block forms is exact (same multiplies).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass

import jax
import jax.numpy as jnp

B = int(os.environ.get("L0_B", 32))
L = 5 * 16000 + 320
K, S, D = 10, 5, 512
ITERS = int(os.environ.get("SYLBER_PROBE_ITERS", 8))
# NOTE: the per-call tunnel RTT (~27 ms) divided by ITERS is an additive
# floor on every amortized number; raise ITERS to >=64 for sub-10 ms ops.


def group_norm_gelu(y, gamma, beta, eps=1e-5):
    y32 = y.astype(jnp.float32)
    mean = y32.mean(axis=1, keepdims=True)
    var = ((y32 - mean) ** 2).mean(axis=1, keepdims=True)
    out = (y32 - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return jax.nn.gelu(out, approximate=False)


def conv_l0(x, w, gamma, beta, dtype):
    y = jax.lax.conv_general_dilated(
        x[..., None].astype(dtype), w.astype(dtype), window_strides=(S,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
    return group_norm_gelu(y, gamma, beta)


def block_conv_l0(x, w, gamma, beta, dtype):
    m = L // S
    xb = x[:, : m * S].reshape(x.shape[0], m, S)
    w2 = w.reshape(2, S, D)  # K = 2*S exactly
    y = jax.lax.conv_general_dilated(
        xb.astype(dtype), w2.astype(dtype), window_strides=(1,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
    return group_norm_gelu(y, gamma, beta)


def block_matmul_l0(x, w, gamma, beta, dtype):
    m = L // S
    xb = x[:, : m * S].reshape(x.shape[0], m, S)
    xcat = jnp.concatenate([xb[:, :-1], xb[:, 1:]], axis=-1).astype(dtype)
    y = xcat @ w.reshape(K, D).astype(dtype)
    return group_norm_gelu(y, gamma, beta)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / ITERS


def scan_n(body):
    def outer(c0, x, w, gamma, beta):
        def step(c, _):
            out = body(x + c, w, gamma, beta)
            return c0 + out.mean() * 1e-20, None
        c, _ = jax.lax.scan(step, c0, jnp.arange(ITERS))
        return c
    return jax.jit(outer)


def main():
    print(f"backend: {jax.default_backend()}  B={B}")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L).astype(np.float32))
    w = jnp.asarray(rng.randn(K, 1, D).astype(np.float32) / np.sqrt(K))
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)

    ref = np.asarray(jax.jit(
        lambda *a: conv_l0(*a, jnp.float32))(x[:2], w, gamma, beta))
    for name, fn in [("block-conv", block_conv_l0),
                     ("block-matmul", block_matmul_l0)]:
        got = np.asarray(jax.jit(
            lambda *a: fn(*a, jnp.float32))(x[:2], w, gamma, beta))
        rel = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name} f32 max rel err vs conv: {rel:.2e}  shape {got.shape}")

    results = {}
    variants = [("conv-f32", conv_l0, jnp.float32),
                ("conv-bf16", conv_l0, jnp.bfloat16),
                ("block-conv-f32", block_conv_l0, jnp.float32),
                ("block-conv-bf16", block_conv_l0, jnp.bfloat16),
                ("block-matmul-f32", block_matmul_l0, jnp.float32),
                ("block-matmul-bf16", block_matmul_l0, jnp.bfloat16)]
    for name, fn, dt in variants:
        t = timeit(scan_n(lambda *a, fn=fn, dt=dt: fn(*a, dt)),
                   jnp.float32(0.0), x, w, gamma, beta)
        results[name] = round(t * 1e3, 2)
        print(f"{name:18s} {t*1e3:7.2f} ms", flush=True)

        def loss(xx, ww, fn=fn, dt=dt):
            return (fn(xx, ww, gamma, beta, dt) ** 2).mean()

        g = scan_n(lambda xx, ww, gg, bb, fn=fn, dt=dt:
                   jax.grad(lambda w_: (fn(xx, w_, gg, bb, dt) ** 2).mean())(ww))
        t = timeit(g, jnp.float32(0.0), x, w, gamma, beta)
        results[name + "+grad"] = round(t * 1e3, 2)
        print(f"{name:18s} +grad {t*1e3:6.2f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Probe: space-to-depth (block-matmul) conv frontend vs XLA conv on TPU.

Every frontend layer has kernel <= 2*stride (k,s in (10,5),(3,2),(2,2)), so a
VALID strided conv equals at most TWO dense matmuls over a reshaped
(L/s, s*C) block view — no im2col duplication (the earlier im2col experiment
materialized (L, k*C) patches and measured 4.5x slower, CLAUDE.md):

    out[t] = blocks[t] @ W2[0] + blocks[t+1] @ W2[1]
    W2 = zero-pad conv kernel (k, C, D) to (2s, C, D), reshape (2, s*C, D)

Compares wall time (fwd, fwd+grad) and numerics vs the nn.Conv path.
Usage: python scripts/frontend_s2d_probe.py
"""

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

CONV_DIM = (512, 512, 512, 512, 512, 512, 512)
CONV_K = (10, 3, 3, 3, 3, 2, 2)
CONV_S = (5, 2, 2, 2, 2, 2, 2)
B = int(os.environ.get("S2D_B", 32))
L = 5 * 16000 + 320
ITERS = int(os.environ.get("SYLBER_PROBE_ITERS", 8))
# NOTE: the per-call tunnel RTT (~27 ms) divided by ITERS is an additive
# floor on every amortized number; raise ITERS to >=64 for sub-10 ms ops.
DTYPE = jnp.bfloat16


def init_kernels(rng):
    ks = []
    c_in = 1
    for d, k in zip(CONV_DIM, CONV_K):
        ks.append(jnp.asarray(
            rng.randn(k, c_in, d).astype(np.float32) / np.sqrt(k * c_in)))
        c_in = d
    return ks


def conv_frontend(x, kernels, dtype=DTYPE):
    x = x[..., None]
    for i, (kern, k, s) in enumerate(zip(kernels, CONV_K, CONV_S)):
        dt = jnp.float32 if i == 0 else dtype
        x = jax.lax.conv_general_dilated(
            x.astype(dt), kern.astype(dt), window_strides=(s,),
            padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
        x = jax.nn.gelu(x, approximate=False)
    return x.astype(jnp.float32)


def s2d_layer(x, kernel, k, s, dtype):
    B_, L_, C = x.shape
    D = kernel.shape[-1]
    out_len = (L_ - k) // s + 1
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    if k <= s:
        xb = x[:, : out_len * s].reshape(B_, out_len, s * C)
        return xb @ kernel.reshape(k * C, D)
    total = (out_len + 1) * s
    if total > L_:
        x = jnp.pad(x, ((0, 0), (0, total - L_), (0, 0)))
    else:
        x = x[:, :total]
    xb = x.reshape(B_, total // s, s * C)
    w2 = jnp.zeros((2 * s, C, D), dtype).at[:k].set(kernel)
    w2 = w2.reshape(2, s * C, D)
    return xb[:, :-1] @ w2[0] + xb[:, 1:] @ w2[1]


def s2d_frontend(x, kernels, dtype=DTYPE):
    x = x[..., None]
    for i, (kern, k, s) in enumerate(zip(kernels, CONV_K, CONV_S)):
        dt = jnp.float32 if i == 0 else dtype
        x = s2d_layer(x, kern, k, s, dt)
        x = jax.nn.gelu(x, approximate=False)
    return x.astype(jnp.float32)


def hybrid_frontend(x, kernels, dtype=DTYPE, n_conv=1):
    """First ``n_conv`` layers via XLA conv (layer 0's contraction dim is
    s*C_in = 5, hopeless for a 128-wide MXU matmul), the rest via s2d
    block-matmuls (contraction 1024)."""
    x = x[..., None]
    for i, (kern, k, s) in enumerate(zip(kernels, CONV_K, CONV_S)):
        dt = jnp.float32 if i == 0 else dtype
        if i < n_conv:
            x = jax.lax.conv_general_dilated(
                x.astype(dt), kern.astype(dt), window_strides=(s,),
                padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
        else:
            x = s2d_layer(x, kern, k, s, dt)
        x = jax.nn.gelu(x, approximate=False)
    return x.astype(jnp.float32)


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
    def outer(c0, x, kernels):
        def step(c, _):
            out = body(x + c, kernels)
            return c0 + out.mean() * 1e-20, None
        c, _ = jax.lax.scan(step, c0, jnp.arange(ITERS))
        return c
    return jax.jit(outer)


def main():
    print(f"backend: {jax.default_backend()}  B={B}")
    rng = np.random.RandomState(0)
    kernels = init_kernels(rng)
    x = jnp.asarray(rng.randn(B, L).astype(np.float32))

    # numerics: f32 highest
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(jax.jit(
            lambda x, ks: conv_frontend(x, ks, jnp.float32))(x[:2], kernels))
        got = np.asarray(jax.jit(
            lambda x, ks: s2d_frontend(x, ks, jnp.float32))(x[:2], kernels))
    rel = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    print(f"f32 max rel err conv vs s2d: {rel:.2e}")
    assert ref.shape == got.shape, (ref.shape, got.shape)

    flops = 0
    l = L
    c_in = 1
    for d, k, s in zip(CONV_DIM, CONV_K, CONV_S):
        l = (l - k) // s + 1
        flops += 2 * l * k * c_in * d
        c_in = d
    flops *= B
    # per-layer-prefix attribution for the conv path
    if os.environ.get("S2D_PREFIXES", "0") == "1":
        for n in range(1, 8):
            def prefix(x, ks, n=n):
                xx = x[..., None]
                for i in range(n):
                    dt = jnp.float32 if i == 0 else DTYPE
                    xx = jax.lax.conv_general_dilated(
                        xx.astype(dt), ks[i].astype(dt),
                        window_strides=(CONV_S[i],), padding="VALID",
                        dimension_numbers=("NWC", "WIO", "NWC"))
                    xx = jax.nn.gelu(xx, approximate=False)
                return xx.astype(jnp.float32)
            dt = timeit(scan_n(prefix), jnp.float32(0.0), x, kernels)
            print(f"conv prefix 0..{n-1}: {dt*1e3:7.2f} ms", flush=True)

    results = {}
    for name, fn in [("xla conv", conv_frontend), ("s2d", s2d_frontend),
                     ("hybrid1", lambda x, ks: hybrid_frontend(x, ks)),
                     ("hybrid2",
                      lambda x, ks: hybrid_frontend(x, ks, n_conv=2))]:
        dt = timeit(scan_n(fn), jnp.float32(0.0), x, kernels)
        results[f"{name} fwd"] = dt
        print(f"{name:10s} fwd        {dt*1e3:7.2f} ms   "
              f"{flops/dt/1e12:6.1f} TFLOPS", flush=True)

        def loss(x, ks):
            return (fn(x, ks) ** 2).mean()

        def gradfn(xx, ks):
            return jax.grad(loss, argnums=1)(xx, ks)[0]

        g = scan_n(lambda xx, ks: gradfn(xx, ks))
        dt = timeit(g, jnp.float32(0.0), x, kernels)
        results[f"{name} fwd+grad"] = dt
        print(f"{name:10s} fwd+grad   {dt*1e3:7.2f} ms   "
              f"{3*flops/dt/1e12:6.1f} TFLOPS", flush=True)
    import json
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()

"""Op-level timing of one encoder layer at the training shape (VERDICT r2 #4).

The block-level attribution (scripts/mfu_breakdown.py) puts the residual MFU
gap at the encoder; this probe times the encoder-layer *components* as
separate scan-amortized programs at the stage-2 training shape
(B=32, L=250, d=768, bf16, precision=default) to show where the non-matmul
time goes: LayerNorms, softmax, GELU, reshapes — the VPU-bound residue that
bounds MFU on short sequences.

Each row is a standalone jitted program; compositions do not sum exactly to
the layer time (XLA fuses across boundaries), but the ordering and rough
magnitudes identify the dominant non-MXU costs. ITERS defaults to 64:
sub-ms ops need the tunnel RTT (~27 ms/call) amortized far below the
measurement (CLAUDE.md measurement discipline).

Usage: python scripts/encoder_op_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform

apply_jax_platform()

ITERS = int(os.environ.get("SYLBER_PROBE_ITERS", 64))
B = int(os.environ.get("SYLBER_PROBE_B", 32))
L = int(os.environ.get("SYLBER_PROBE_L", 250))
D = 768
FF = 3072
H = 12


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.ops.attention import (MultiHeadSelfAttention,
                                          dot_product_attention)

    dt = jnp.bfloat16
    results = {}

    def timeit(fn, *args, reps=5):
        # fn returns a SCALAR — fetching a full tensor over the axon tunnel
        # (~25 MB/s D2H) costs 5-70 ms and was once misread as compute: the
        # original version fetched the (B,L,D) carry and every row showed a
        # ~5 ms/iter "floor" that was really a 12-96 MB transfer / ITERS.
        out = fn(*args)
        _ = np.asarray(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / ITERS

    def scan_n(body):
        # NOTE: return ys=None — stacking the body output across ITERS
        # allocates ITERS x |out| and the probe measures those writes, not
        # the op (first version of this script did exactly that: softmax
        # "cost" 171 ms = 64 stacked 96 MB copies). The scalar poison keeps
        # a true iteration-to-iteration dependence so XLA cannot hoist/CSE
        # the body, and works for bodies whose output shape differs from
        # the carry.
        def outer(x0, params):
            def step(c, i):
                out = body(c, params)
                poison = (out.ravel()[0] * jnp.asarray(1e-20, out.dtype)
                          ).astype(x0.dtype)
                return x0 + poison, None
            c, _ = jax.lax.scan(step, x0, jnp.arange(ITERS))
            # Return a SCALAR: the caller's completion fetch is a D2H
            # np.asarray, and the tunnel moves ~25 MB/s — returning the
            # full carry would add a transfer floor larger than most ops.
            return c.ravel()[0].astype(jnp.float32)
        return jax.jit(outer)

    def report(name, dt_s, flops=None):
        ms = dt_s * 1e3
        results[name] = round(ms, 4)
        line = f"{name:44s} {ms:9.4f} ms"
        if flops:
            # v5e bf16 peak 394 TFLOP/s
            line += f"  ({flops / dt_s / 394e12 * 100:5.1f}% of bf16 peak)"
        print(line, flush=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, D), dt)

    # --- null program: measures per-call dispatch+fetch overhead (tunnel
    # RTT) expressed per-iteration, i.e. the additive floor on every row ---
    null = jax.jit(lambda c: c.ravel()[0].astype(jnp.float32))
    report("null program (tunnel RTT / ITERS)", timeit(null, x))

    # --- full encoder layer (post-LN, as shipped) ---
    from sylber_tpu.models.hubert import EncoderLayer

    for fused in (False, True):
        cfg = HubertConfig(dtype=dt, precision="default", fused_qkv=fused)
        layer = EncoderLayer(cfg)
        params = layer.init(jax.random.PRNGKey(0), x, None)["params"]
        f = scan_n(lambda c, p: layer.apply({"params": p}, c, None))
        label = "encoder layer" + (" (fused qkv)" if fused else "")
        layer_flops = 2 * B * L * D * (4 * D + 2 * FF) + 4 * B * H * L * L * (D // H)
        report(label, timeit(f, x, params), layer_flops)

    cfg = HubertConfig(dtype=dt, precision="default")

    # --- attention block only ---
    attn = MultiHeadSelfAttention(num_heads=H, dtype=dt, precision="default")
    ap = attn.init(jax.random.PRNGKey(1), x)["params"]
    f = scan_n(lambda c, p: attn.apply({"params": p}, c))
    report("attention block (qkv+attn+out)", timeit(f, x, ap),
           2 * B * L * D * 4 * D + 4 * B * H * L * L * (D // H))

    attn_f = MultiHeadSelfAttention(num_heads=H, dtype=dt,
                                    precision="default", fused_qkv=True)
    f = scan_n(lambda c, p: attn_f.apply({"params": p}, c))
    report("attention block (fused qkv)", timeit(f, x, ap),
           2 * B * L * D * 4 * D + 4 * B * H * L * L * (D // H))

    # --- attention core only (no projections) ---
    q = jnp.asarray(rng.randn(B, H, L, D // H), dt)
    f = scan_n(lambda c, p: dot_product_attention(c, p[0], p[1],
                                                  precision="default"))
    report("attention core (QK^T+softmax+PV)",
           timeit(f, q, (q + 1, q - 1)), 4 * B * H * L * L * (D // H))

    # --- FFN only ---
    class FFN(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.Dense(FF, dtype=dt, precision="default", name="up")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(D, dtype=dt, precision="default", name="down")(h)

    ffn = FFN()
    fp = ffn.init(jax.random.PRNGKey(2), x)["params"]
    f = scan_n(lambda c, p: ffn.apply({"params": p}, c))
    report("FFN (up+GELU+down)", timeit(f, x, fp), 2 * B * L * D * 2 * FF)

    # --- GELU alone on the FF-width tensor ---
    xb = jnp.asarray(rng.randn(B, L, FF), dt)
    f = scan_n(lambda c, p: nn.gelu(c, approximate=False))
    report("exact GELU on (B,L,3072)", timeit(f, xb, ()))
    f = scan_n(lambda c, p: nn.gelu(c, approximate=True))
    report("tanh GELU on (B,L,3072)", timeit(f, xb, ()))

    # --- LayerNorm alone (two per layer) ---
    ln = nn.LayerNorm(epsilon=1e-5, dtype=dt)
    lp = ln.init(jax.random.PRNGKey(3), x)["params"]
    f = scan_n(lambda c, p: ln.apply({"params": p}, c))
    report("LayerNorm on (B,L,768)", timeit(f, x, lp))

    # --- softmax alone at attention shape ---
    s = jnp.asarray(rng.randn(B, H, L, L), jnp.float32)
    f = scan_n(lambda c, p: jax.nn.softmax(c, axis=-1))
    report("fp32 softmax on (B,12,250,250)", timeit(f, s, ()))

    # --- single matmul reference points ---
    a = jnp.asarray(rng.randn(B * L, D), dt)
    w = jnp.asarray(rng.randn(D, FF), dt)
    f = scan_n(lambda c, p: jnp.dot(c, p, precision="default"))
    report("bare matmul (8000x768)@(768x3072)", timeit(f, a, w),
           2 * B * L * D * FF)
    w3 = jnp.asarray(rng.randn(D, 3 * D), dt)
    f = scan_n(lambda c, p: jnp.dot(c, p, precision="default"))
    report("bare matmul (8000x768)@(768x2304)", timeit(f, a, w3),
           2 * B * L * D * 3 * D)
    w1 = jnp.asarray(rng.randn(D, D), dt)
    f = scan_n(lambda c, p: jnp.dot(c, p, precision="default"))
    report("bare matmul (8000x768)@(768x768)", timeit(f, a, w1),
           2 * B * L * D * D)

    print(json.dumps(results))
    with open("/tmp/encoder_op_probe.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

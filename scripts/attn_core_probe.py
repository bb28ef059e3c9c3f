"""TPU A/B: fused small-L attention kernel vs XLA fused path at L=250.

Measurement discipline (CLAUDE.md): amortize inside ONE jitted program via
lax.scan with a true data dependence between iterations, ITERS >= 64 so the
~27 ms per-dispatch tunnel RTT floor is < 0.5 ms/iter; completion forced by
fetching a SCALAR. Also checks numerical agreement of the two paths on the
same inputs.

Usage: python scripts/attn_core_probe.py   (REAL TPU; one client at a time)
Env: ATTN_B (32), ATTN_H (12), ATTN_L (250), ATTN_D (64), ATTN_ITERS (128),
     ATTN_DTYPE (bfloat16)
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from sylber_tpu.utils.platform import apply_jax_platform  # noqa: E402

apply_jax_platform()


def main():
    import jax
    import jax.numpy as jnp

    from sylber_tpu.ops.attention import dot_product_attention
    from sylber_tpu.ops.pallas.smallattn import fused_attention_small

    B = int(os.environ.get("ATTN_B", 32))
    H = int(os.environ.get("ATTN_H", 12))
    L = int(os.environ.get("ATTN_L", 250))
    D = int(os.environ.get("ATTN_D", 64))
    iters = int(os.environ.get("ATTN_ITERS", 128))
    dtype = jnp.dtype(os.environ.get("ATTN_DTYPE", "bfloat16"))
    prec = "default" if dtype == jnp.bfloat16 else "highest"

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, D).astype(np.float32), dtype)
    k = jnp.asarray(rng.randn(B, H, L, D).astype(np.float32), dtype)
    v = jnp.asarray(rng.randn(B, H, L, D).astype(np.float32), dtype)

    def amortized(fn):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                out = fn(c, k, v)
                # true data dependence: next iteration's q depends on out
                return (c + out.astype(c.dtype) * 1e-20), ()
            c, _ = jax.lax.scan(body, q, None, length=iters)
            return c.sum()
        return run

    def timeit(fn, label):
        run = amortized(fn)
        _ = float(run(q, k, v))  # compile + warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(run(q, k, v))  # scalar fetch forces completion
            reps.append((time.perf_counter() - t0) / iters * 1e3)
        ms = float(np.median(reps))
        flops = 2 * 2 * B * H * L * L * D
        peak = 197e12 if dtype == jnp.bfloat16 else 98e12
        print(f"{label}: {ms:.4f} ms/app  "
              f"({flops / (ms / 1e3) / peak * 100:.1f}% peak)  "
              f"reps={['%.4f' % r for r in reps]}", flush=True)
        return ms

    xla = lambda q, k, v: dot_product_attention(  # noqa: E731
        q, k, v, precision=prec)
    small = lambda q, k, v: fused_attention_small(q, k, v)  # noqa: E731

    # agreement first (same inputs, one application)
    a = np.asarray(xla(q, k, v), np.float32)
    b = np.asarray(small(q, k, v), np.float32)
    err = float(np.max(np.abs(a - b)))
    print(f"max |xla - pallas_small| = {err:.3e}", flush=True)

    ms_x = timeit(xla, f"xla       B{B} H{H} L{L} D{D} {dtype}")
    ms_p = timeit(small, f"pallas_sm B{B} H{H} L{L} D{D} {dtype}")
    ms_x2 = timeit(xla, "xla (re-run, drift check)")
    print(json.dumps({"xla_ms": ms_x, "pallas_small_ms": ms_p,
                      "xla_rerun_ms": ms_x2, "max_abs_err": err,
                      "speedup": round(ms_x / ms_p, 3)}))


if __name__ == "__main__":
    main()

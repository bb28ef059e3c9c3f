"""Stage-2 train-step time breakdown on the real chip (VERDICT r1 #3).

Times nested subsets of the full-size stage-2 training step (B=32 x 5 s,
bf16, 9L-768) as separate jitted programs, each amortized with a
``lax.scan`` over ITERS applications carrying a true data dependence (see
CLAUDE.md measurement discipline). Differences between consecutive rows
attribute wall time to: teacher forward, on-device segmentation + fill,
student forward, backward+optimizer. Also times remat on/off and the
f32-vs-bf16 hidden-state handoff into segmentation.

Usage: SYLBER_TPU_DONATE=0 python scripts/mfu_breakdown.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import apply_jax_platform

apply_jax_platform()  # axon ignores $JAX_PLATFORMS; must go through jax.config

ITERS = int(os.environ.get("SYLBER_PROBE_ITERS", 8))
# NOTE: the per-call tunnel RTT (~27 ms) divided by ITERS is an additive
# floor on every amortized number; raise ITERS to >=64 for sub-10 ms ops.
B = int(os.environ.get("SYLBER_MFU_B", 32))
SECS = 5.0
ONLY_FULL = os.environ.get("SYLBER_MFU_ONLY_FULL", "0") == "1"


def timeit(fn, *args, reps=3):
    """Median wall time of fn(*args), completion forced via D2H fetch."""
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # compile+complete
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / ITERS


def main():
    global jax
    import jax
    import jax.numpy as jnp
    import optax

    from sylber_tpu.data.noise import mix_noise
    from sylber_tpu.models.hubert import (HubertConfig, HubertModel,
                                          feature_vector_attention_mask)
    from sylber_tpu.ops.segment import averaged_target_fill, segment_batch
    from sylber_tpu.train.distill import (DistillConfig, init_train_state,
                                          make_train_step)
    from sylber_tpu.train.thresholder import get_threshold, update_stats
    from sylber_tpu.utils.profiling import hubert_train_flops, mfu

    results = {}

    def report(name, dt, cfg=None):
        results[name] = round(dt * 1000, 2)
        line = f"{name:42s} {dt * 1000:8.2f} ms/step"
        if cfg is not None:
            fl = hubert_train_flops(cfg, B, int(SECS * 16000) + 320)
            line += f"  ({mfu(fl, dt, jax.devices()[0].device_kind, 1) * 100:.1f}% MFU)"
        print(line, flush=True)

    rng = np.random.RandomState(0)
    L = int(SECS * 16000) + 320
    wav = jnp.asarray(rng.randn(B, L).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    noise = jnp.asarray(rng.randn(B, L).astype(np.float32) * 0.1)

    def build(remat=False, dtype="bfloat16", fused_qkv=False, gelu_tanh=None):
        hub = HubertConfig(num_hidden_layers=9, dtype=jnp.dtype(dtype),
                           precision="default",
                           frontend_dtype=jnp.dtype(dtype), remat=remat,
                           fused_qkv=fused_qkv, gelu_tanh=gelu_tanh)
        cfg = DistillConfig(
            model=hub, segment_online=True, use_train_thrupdate=True,
            merge_threshold_range=(0.8, 0.9), do_noise_augment=True,
            lr=5e-5, warmup_steps=0, total_steps=1000)
        state = init_train_state(
            cfg, jax.random.PRNGKey(0),
            thresholder_kwargs=dict(signal_mean=6.1, signal_var=0.87,
                                    noise_mean=0.34, noise_var=0.34))
        return hub, cfg, state

    hub, cfg, state = build()
    model = HubertModel(hub)
    batch = {"input_values": wav, "attention_mask": mask, "noise": noise}

    def scan_n(body):
        """Amortize: scan body over ITERS with a poison-carry dependence.
        Params are explicit jit arguments — closed-over device arrays would
        be baked into the HLO as constants and overflow the axon tunnel's
        compile-request size limit (observed HTTP 413)."""
        def outer(c0, rng, params, ema_params):
            def step(c, i):
                krng = jax.random.fold_in(rng, i)
                out = body(c, krng, params, ema_params)
                # true data dependence between iterations, numerically inert
                return c0 + out * 1e-20, out
            c, outs = jax.lax.scan(step, c0, jnp.arange(ITERS))
            return c
        return jax.jit(outer)

    def report_maybe(name, timed_fn, cfg=None):
        if not ONLY_FULL:
            report(name, timed_fn(), cfg)

    # 1. teacher forward only (bf16 out, cast f32 as the train step does)
    def t_fwd(c, krng, params, ema_params):
        h = model.apply({"params": ema_params},
                        wav + c, mask).astype(jnp.float32)
        return h.mean()
    report_maybe("teacher fwd", lambda: timeit(
        scan_n(t_fwd), jnp.float32(0.0), jax.random.PRNGKey(1),
        state.params, state.ema_params), hub)

    # 2. + norms/threshold/segmentation/target fill (the stage-2 extras)
    def t_seg(c, krng, params, ema_params):
        h = model.apply({"params": ema_params},
                        wav + c, mask).astype(jnp.float32)
        nt = get_threshold(state.thresholder)
        norms = jnp.sqrt((h ** 2).sum(-1) + 1e-8)
        fv = feature_vector_attention_mask(hub, mask, h.shape[1]).astype(bool)
        mt = jax.random.uniform(krng, ()) * 0.1 + 0.8
        res = segment_batch(h, nt, mt, frame_valid=fv, norms=norms)
        fill = averaged_target_fill(h, res.segments, res.num_segments)
        return fill.mean() + res.num_segments.sum() * 1e-9
    report_maybe("teacher fwd + segment + fill", lambda: timeit(
        scan_n(t_seg), jnp.float32(0.0), jax.random.PRNGKey(2),
        state.params, state.ema_params), hub)

    # 3. + student forward (no grad)
    def t_both(c, krng, params, ema_params):
        h = model.apply({"params": ema_params},
                        wav + c, mask).astype(jnp.float32)
        nt = get_threshold(state.thresholder)
        norms = jnp.sqrt((h ** 2).sum(-1) + 1e-8)
        fv = feature_vector_attention_mask(hub, mask, h.shape[1]).astype(bool)
        mt = jax.random.uniform(krng, ()) * 0.1 + 0.8
        res = segment_batch(h, nt, mt, frame_valid=fv, norms=norms)
        fill = averaged_target_fill(h, res.segments, res.num_segments)
        sin = mix_noise(krng, wav + c, noise, cfg.noise_mixer)
        hs = model.apply({"params": params}, sin, mask,
                         deterministic=False,
                         rngs={"dropout": krng}).astype(jnp.float32)
        return ((hs - fill) ** 2).sum(-1).mean()
    report_maybe("+ student fwd (loss, no grad)", lambda: timeit(
        scan_n(t_both), jnp.float32(0.0), jax.random.PRNGKey(3),
        state.params, state.ema_params), hub)

    # 3b. same but student dropout disabled — isolates dropout-mask RNG cost
    def t_both_det(c, krng, params, ema_params):
        h = model.apply({"params": ema_params},
                        wav + c, mask).astype(jnp.float32)
        nt = get_threshold(state.thresholder)
        norms = jnp.sqrt((h ** 2).sum(-1) + 1e-8)
        fv = feature_vector_attention_mask(hub, mask, h.shape[1]).astype(bool)
        mt = jax.random.uniform(krng, ()) * 0.1 + 0.8
        res = segment_batch(h, nt, mt, frame_valid=fv, norms=norms)
        fill = averaged_target_fill(h, res.segments, res.num_segments)
        sin = mix_noise(krng, wav + c, noise, cfg.noise_mixer)
        hs = model.apply({"params": params}, sin, mask,
                         deterministic=True).astype(jnp.float32)
        return ((hs - fill) ** 2).sum(-1).mean()
    report_maybe("+ student fwd (no dropout)", lambda: timeit(
        scan_n(t_both_det), jnp.float32(0.0), jax.random.PRNGKey(3),
        state.params, state.ema_params), hub)

    # 3c. dropout with the fast TPU-native RBG bit generator instead of the
    # default threefry (dropout masks don't need counter-based splitting
    # guarantees; rbg is hardware-accelerated)
    def t_both_rbg(c, krng, params, ema_params):
        return t_both(c, krng, params, ema_params)
    report_maybe("+ student fwd (rbg dropout)", lambda: timeit(
        scan_n(t_both_rbg), jnp.float32(0.0),
        jax.random.key(3, impl="rbg"), state.params, state.ema_params), hub)

    # 4. full train step (grad + AdamW), as shipped
    def full_step_timer(cfg, state, label, key=None):
        step_fn = make_train_step(cfg)

        def body(carry, rng):
            st = carry
            st2, metrics = step_fn(st, batch, rng)
            return st2, metrics["loss"]

        def outer(st, rng):
            def step(c, i):
                return body(c, jax.random.fold_in(rng, i))
            st2, losses = jax.lax.scan(step, st, jnp.arange(ITERS))
            return losses
        f = jax.jit(outer)
        key = jax.random.PRNGKey(4) if key is None else key
        report(label, timeit(f, state, key), cfg.model)

    if not ONLY_FULL:
        full_step_timer(cfg, state, "full step (bf16, no remat)")
    full_step_timer(cfg, state, f"full step (bf16, rbg rng, B={B})",
                    key=jax.random.key(4, impl="rbg"))

    if not ONLY_FULL:
        hub_r, cfg_r, state_r = build(remat=True)
        full_step_timer(cfg_r, state_r, "full step (bf16, remat)")

    # 5. fused-QKV A/B (one (d, 3d) qkv matmul per layer; VERDICT r2 #4)
    hub_f, cfg_f, state_f = build(fused_qkv=True)
    full_step_timer(cfg_f, state_f, f"full step (bf16, rbg, fused qkv)",
                    key=jax.random.key(5, impl="rbg"))

    # 5b. GELU A/B: the bf16 default is now tanh-GELU (auto); time the
    # exact-erf variant to attribute the difference (op probe: the erf GELU
    # on the FFN tensor is the dominant non-matmul op in a layer).
    hub_g, cfg_g, state_g = build(gelu_tanh=False)
    full_step_timer(cfg_g, state_g, f"full step (bf16, rbg, exact-erf gelu)",
                    key=jax.random.key(7, impl="rbg"))

    # 6. XLA cost-analysis cross-check of the analytic FLOP count the MFU
    # numbers are derived from (utils/profiling.py approximations)
    if os.environ.get("SYLBER_MFU_COST_ANALYSIS", "1") == "1":
        step_fn = make_train_step(cfg)
        compiled = jax.jit(step_fn).lower(
            state, batch, jax.random.key(6, impl="rbg")).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_xla = float(ca.get("flops", float("nan")))
        flops_analytic = float(hubert_train_flops(hub, B, L))
        results["xla_cost_analysis_flops"] = flops_xla
        results["analytic_flops"] = flops_analytic
        results["flops_ratio_analytic_over_xla"] = round(
            flops_analytic / flops_xla, 4) if flops_xla == flops_xla else None
        print(f"XLA cost_analysis flops: {flops_xla:.3e}  "
              f"analytic: {flops_analytic:.3e}  "
              f"ratio analytic/xla: {flops_analytic / flops_xla:.3f}")

    print(json.dumps(results))
    with open("/tmp/mfu_breakdown.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

"""Attribute the train-loop-vs-device-step gap (VERDICT r4 item 7).

r3/r4 measured the full-size stage-2 *device* step at 84.3 ms (46.9% MFU)
but only ~8.65 steps/s (~115 ms effective) through the host loop with
steps_per_dispatch=8 — a ~27% loss. This probe separates:

  A. device ceiling: the loop's exact K-step scan program, dispatched
     back-to-back with the host running ahead (block only at the end);
  B. loop-identical driving: per window, the same host work train() does —
     index stack, ``jnp.asarray(idx)`` H2D put, ``replicated(rng, mesh)``
     key upload, dispatch, periodic metrics fetch — each phase timed;
  C. B with the candidate fixes: RNG key uploaded ONCE (it is loop-
     invariant) and the next window's index vector uploaded right after
     the previous dispatch (the put then overlaps device compute).

Run: SYLBER_TPU_DONATE=0 python scripts/loop_gap_probe.py
Knobs: SYLBER_LOOP_WINDOWS (default 24), SYLBER_LOOP_B (32), SYLBER_LOOP_SPD (8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylber_tpu.utils.platform import (apply_jax_platform,
                                        enable_compilation_cache)

apply_jax_platform()
enable_compilation_cache()

WINDOWS = int(os.environ.get("SYLBER_LOOP_WINDOWS", 24))
B = int(os.environ.get("SYLBER_LOOP_B", 32))
SPD = int(os.environ.get("SYLBER_LOOP_SPD", 8))
LOG_EVERY = 50  # matches the shipped recipe's metric cadence


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sylber_tpu.data.dataset import SyntheticSpeechDataset
    from sylber_tpu.data.device import _gather, index_stream, precollate
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.parallel.mesh import make_mesh, replicated, fetch_replicated
    from sylber_tpu.train.distill import (DistillConfig, init_train_state,
                                          make_train_step)
    from sylber_tpu.utils.profiling import hubert_train_flops, mfu

    mesh = make_mesh()
    hub = HubertConfig(num_hidden_layers=9, dtype=jnp.dtype("bfloat16"),
                       frontend_dtype=jnp.dtype("bfloat16"),
                       precision="default")
    cfg = DistillConfig(model=hub, segment_online=True,
                        use_train_thrupdate=True,
                        merge_threshold_range=(0.8, 0.9),
                        do_noise_augment=True, lr=5e-5, warmup_steps=0,
                        total_steps=100_000)
    rng = jax.random.key(0, impl="rbg")
    state = init_train_state(
        cfg, jax.random.PRNGKey(0),
        thresholder_kwargs=dict(signal_mean=6.1, signal_var=0.87,
                                noise_mean=0.34, noise_var=0.34))
    state = jax.tree.map(lambda x: replicated(x, mesh), state)

    ds = SyntheticSpeechDataset(n_utts=max(4 * B, 128), max_len=80_000,
                                with_segments=False, seed=0)
    data = precollate(ds, transfer="int16")
    present = {k: v for k, v in data.items() if v is not None}
    absent = [k for k, v in data.items() if v is None]
    specs = {k: NamedSharding(mesh, P("dp", *[None] * (v.ndim - 1)))
             for k, v in present.items()}
    raw_step = make_train_step(cfg)

    def _multi(st, rng_key, idx_kb, d):
        def body(s, idx_b):
            b = {k: jax.lax.with_sharding_constraint(v[idx_b], specs[k])
                 for k, v in d.items()}
            for k in absent:
                b[k] = None
            return raw_step(s, b, jax.random.fold_in(rng_key, s.step))
        return jax.lax.scan(body, st, idx_kb)

    multi_fn = jax.jit(_multi)
    idx_gen = index_stream(len(ds), B, shuffle=True, seed=0)
    rng_dev = replicated(rng, mesh)

    def fresh_idx():
        return np.stack([next(idx_gen) for _ in range(SPD)])

    crop = present["input_values"].shape[-1]
    flops = hubert_train_flops(hub, B, crop)
    kind = jax.devices()[0].device_kind
    results = {"spd": SPD, "batch": B, "crop": crop, "windows": WINDOWS}

    # warm: compile + one window
    st = state
    st, ms = multi_fn(st, rng_dev, jnp.asarray(fresh_idx()), present)
    _ = fetch_replicated(ms["loss"])
    print("compiled; warm window done", flush=True)

    def report(name, dt_step, extra=""):
        m = mfu(flops, dt_step, kind, mesh.shape["dp"])
        results[name] = round(dt_step * 1000, 2)
        results[name + "_mfu"] = round(m * 100, 2)
        print(f"{name:34s} {dt_step * 1000:7.2f} ms/step "
              f"({m * 100:.1f}% MFU) {extra}", flush=True)

    # --- A: device ceiling — pre-upload every idx, dispatch all, block once
    idx_dev = [jax.device_put(jnp.asarray(fresh_idx())) for _ in range(WINDOWS)]
    jax.block_until_ready(idx_dev)
    t0 = time.perf_counter()
    for w in range(WINDOWS):
        st, ms = multi_fn(st, rng_dev, idx_dev[w], present)
    _ = fetch_replicated(ms["loss"])  # force completion (block_until_ready
    # alone is unreliable over the axon tunnel — CLAUDE.md)
    report("A_device_ceiling", (time.perf_counter() - t0) / (WINDOWS * SPD))

    # --- B: loop-identical host pattern, phases timed
    t_idx = t_put = t_key = t_disp = t_fetch = 0.0
    t0 = time.perf_counter()
    for w in range(WINDOWS):
        t = time.perf_counter(); idx = fresh_idx(); t_idx += time.perf_counter() - t
        t = time.perf_counter(); key = replicated(rng, mesh); t_key += time.perf_counter() - t
        t = time.perf_counter(); idx_j = jnp.asarray(idx); t_put += time.perf_counter() - t
        t = time.perf_counter(); st, ms = multi_fn(st, key, idx_j, present); t_disp += time.perf_counter() - t
        s_end = (w + 1) * SPD
        if (s_end // LOG_EVERY) != (s_end - SPD) // LOG_EVERY:
            t = time.perf_counter(); _ = fetch_replicated(ms); t_fetch += time.perf_counter() - t
    t = time.perf_counter(); _ = fetch_replicated(ms["loss"]); t_fetch += time.perf_counter() - t
    wall = time.perf_counter() - t0
    report("B_loop_identical", wall / (WINDOWS * SPD))
    n = WINDOWS * SPD
    for k, v in [("idx_gen", t_idx), ("key_upload", t_key),
                 ("idx_upload", t_put), ("dispatch", t_disp),
                 ("metrics_fetch", t_fetch)]:
        results[f"B_{k}_ms_per_step"] = round(v / n * 1000, 2)
        print(f"  {k:22s} {v / n * 1000:7.2f} ms/step", flush=True)

    # --- C: fixes — hoisted key (rng_dev), idx uploaded one window ahead
    t_idx = t_put = t_disp = t_fetch = 0.0
    next_idx = jax.device_put(jnp.asarray(fresh_idx()))
    jax.block_until_ready(next_idx)
    t0 = time.perf_counter()
    for w in range(WINDOWS):
        idx_j = next_idx
        t = time.perf_counter(); st, ms = multi_fn(st, rng_dev, idx_j, present); t_disp += time.perf_counter() - t
        t = time.perf_counter(); idx = fresh_idx(); t_idx += time.perf_counter() - t
        t = time.perf_counter(); next_idx = jax.device_put(jnp.asarray(idx)); t_put += time.perf_counter() - t
        s_end = (w + 1) * SPD
        if (s_end // LOG_EVERY) != (s_end - SPD) // LOG_EVERY:
            t = time.perf_counter(); _ = fetch_replicated(ms); t_fetch += time.perf_counter() - t
    t = time.perf_counter(); _ = fetch_replicated(ms["loss"]); t_fetch += time.perf_counter() - t
    wall = time.perf_counter() - t0
    report("C_fixed_loop", wall / (WINDOWS * SPD))
    for k, v in [("idx_gen", t_idx), ("idx_upload", t_put),
                 ("dispatch", t_disp), ("metrics_fetch", t_fetch)]:
        results[f"C_{k}_ms_per_step"] = round(v / n * 1000, 2)
        print(f"  {k:22s} {v / n * 1000:7.2f} ms/step", flush=True)

    print(json.dumps(results))
    with open("/tmp/loop_gap_probe.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

"""Training orchestration: config -> data -> sharded jitted loop -> Orbax.

Replaces the reference's Hydra + Lightning Trainer stack
(`/root/reference/train.py:34-105`): explicit step loop, DP sharding over the
device mesh (instead of DDP process spawning), async Orbax checkpointing with
auto-resume, JSONL metrics, optional jax.profiler traces.
"""

from __future__ import annotations

import gc
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SpeechDataset, SyntheticSpeechDataset, load_manifest, prefetch
from ..data.noise import NoiseMixerConfig
from ..io.checkpoint import TrainCheckpointManager
from ..models.hubert import HubertConfig
from ..parallel.mesh import (fetch_global, fetch_replicated, make_mesh,
                             maybe_distributed_init, replicated, shard_batch,
                             shard_params)
from .distill import DistillConfig, TrainState, init_train_state, make_eval_step, make_train_step


def distill_config_from_dict(model_cfg: Dict[str, Any]) -> DistillConfig:
    """Map reference-style `model:` yaml keys onto DistillConfig."""
    m = dict(model_cfg)
    extra = {k: tuple(v) if isinstance(v, list) else v
             for k, v in m.get("hubert", {}).items()}
    if "frontend_dtype" in m:  # model-level knob (bf16 fast frontend)
        extra.setdefault("frontend_dtype", jnp.dtype(m["frontend_dtype"]))
    hubert = HubertConfig(
        num_hidden_layers=m.get("encoding_layer", 9),
        dtype=jnp.dtype(m.get("dtype", "float32")),
        precision=m.get("precision", "default"),
        **extra,
    )
    noise = NoiseMixerConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in m.get("noise_mixer_configs", {}).items()
    })
    return DistillConfig(
        model=hubert,
        ema_decay=m.get("ema_decay", 1.0),
        segment_online=m.get("segment_online", False),
        merge_threshold_range=tuple(m.get("merge_threshold_range", (0.5, 0.7))),
        use_train_thrupdate=m.get("use_train_thrupdate", False),
        mask_prob=m.get("mask_prob", 0.0),
        min_mask_n=m.get("min_mask_n", 0),
        max_mask_set=m.get("max_mask_set", 1),
        do_noise_augment=m.get("do_noise_augment", False),
        noise_mixer=noise,
        lr=m.get("lr", 1e-4),
        warmup_steps=m.get("warmup_steps", 500),
        total_steps=m.get("total_steps", 200_000),
        min_factor=m.get("min_factor", 1.0),
        hold_steps=m.get("hold_steps", 0),
        loss_scale=m.get("loss_coefs", {}).get("distillation_loss", 1.0),
        accumulate_grad_batches=m.get("accumulate_grad_batches", 1),
    )


def build_dataset(data_cfg: Dict[str, Any], split: str = "train",
                  seed: int = 0) -> SpeechDataset:
    d = dict(data_cfg)
    if d.get("synthetic"):
        return SyntheticSpeechDataset(
            n_utts=d.get("n_utts", 64), max_len=d.get("max_len", 80_000),
            with_segments=not d.get("segment_online_data", False),
            seed=seed, style=d.get("style", "v1"))
    files_key = {"train": "train_files", "valid": "val_files",
                 "test": "test_files"}[split]
    tags = load_manifest(d[files_key])
    return SpeechDataset(
        wav_dirs=d["wav_dirs"], tags=tags, data_dir=d.get("data_dir"),
        max_len=d.get("max_len", 80_000), dummy_len=d.get("dummy_len", 300_000),
        noise_dir=d.get("noise_dir"), seed=seed)


def _epoch_stream(dataset: SpeechDataset, batch_size: int, shuffle: bool,
                  transfer: str = "float32", workers: int = 0
                  ) -> Iterator[Dict[str, np.ndarray]]:
    while True:
        yield from dataset.batches(batch_size, shuffle=shuffle,
                                   transfer=transfer, workers=workers)


class MetricLogger:
    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self._f = open(os.path.join(out_dir, "metrics.jsonl"), "a")

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "train"):
        row = {"step": step, "prefix": prefix, "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        return row


def train(
    cfg: Dict[str, Any],
    out_dir: str = "runs/sylber",
    max_steps: Optional[int] = None,
    log_every: int = 50,
    ckpt_every: int = 1000,
    val_every: Optional[int] = None,
    limit_val_batches: int = 100,
    init_params: Any = None,
    profile_steps: Optional[tuple] = None,
) -> TrainState:
    model_cfg = dict(cfg.get("model", {}))
    # reference yaml keeps accumulate_grad_batches at top level (train.py:101)
    if "accumulate_grad_batches" in cfg:
        model_cfg.setdefault("accumulate_grad_batches",
                             cfg["accumulate_grad_batches"])
    dcfg = distill_config_from_dict(model_cfg)
    data_cfg = cfg.get("data", {})
    batch_size = data_cfg.get("batch_size", 8)
    max_steps = max_steps or cfg.get("max_steps", dcfg.total_steps)

    # mesh: {dp: -1|N, mp: M} yaml knob; dp -1/absent fills the remaining
    # devices. mp > 1 turns on Megatron-style tensor parallelism over the
    # encoder (parallel/mesh.py TP_RULES). An optional distributed: block
    # (or SYLBER_TPU_DIST=1 / SYLBER_TPU_COORDINATOR env) initializes
    # jax.distributed first so the mesh spans hosts (ICI within a slice,
    # DCN across).
    maybe_distributed_init(cfg.get("distributed"))
    mesh_cfg = dict(cfg.get("mesh", {}))
    mp = int(mesh_cfg.get("mp", 1))
    dp_req = mesh_cfg.get("dp", -1)
    mesh = make_mesh(dp=None if dp_req in (-1, None) else int(dp_req), mp=mp)
    use_tp = mp > 1
    dp = mesh.shape["dp"]
    # mesh: {fsdp: true} shards params + EMA + optimizer moments over the
    # dp axis as well (ZeRO-3/FSDP via GSPMD — parallel/mesh.py
    # _fsdp_extend): XLA all-gathers weights per use and reduce-scatters
    # grads, cutting per-device state memory ~dp x. Composes with mp.
    use_fsdp = bool(mesh_cfg.get("fsdp", False)) and dp > 1
    from ..parallel.mesh import FSDP_MIN_SIZE
    fsdp_min = int(mesh_cfg.get("fsdp_min_size", FSDP_MIN_SIZE))
    assert batch_size % dp == 0, (batch_size, dp)
    # Multi-process (multi-host) runs: every process executes this same
    # loop; the data pipeline is seeded identically so each host builds the
    # same global batch and put_global places its addressable dp-slice
    # (parallel/mesh.py). Logging/printing happens on process 0 only;
    # checkpoint saves pass GLOBAL jax arrays so Orbax coordinates the
    # distributed write itself.
    is_main = jax.process_index() == 0

    # rng_impl "rbg" uses the TPU-hardware RngBitGenerator for all training
    # randomness (dropout masks, merge draws, noise mixing). Measured on
    # v5e: threefry dropout-mask generation costs +78 ms on the B=32 x 5 s
    # stage-2 step (133 -> 112.6 ms full step with rbg, 29.7% -> 35.1% MFU;
    # scripts/mfu_breakdown.py). Default stays threefry (bit-stable across
    # platforms); shipped TPU recipes set rng_impl: rbg.
    rng_impl = cfg.get("rng_impl", "threefry")
    if rng_impl in ("threefry", "threefry2x32"):
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
    else:
        rng = jax.random.key(cfg.get("seed", 0), impl=rng_impl)
    thr_kwargs = cfg.get("model", {}).get("thresholder_configs") or {}
    state = init_train_state(dcfg, rng, params=init_params,
                             thresholder_kwargs=thr_kwargs)
    if use_fsdp:
        # optimizer moments/accumulators mirror the param tree (their paths
        # end with the param path), so the same spec fn shards them
        # consistently with the params; scalar counts replicate.
        from ..parallel.mesh import hubert_param_specs, put_global

        opt_specs = hubert_param_specs(state.opt_state, use_tp=use_tp,
                                       fsdp_dp=dp, fsdp_min_size=fsdp_min)
        opt_state = jax.tree.map(lambda x, s: put_global(x, mesh, s),
                                 state.opt_state, opt_specs)
    else:
        opt_state = jax.tree.map(lambda x: replicated(x, mesh),
                                 state.opt_state)
    state = state._replace(
        params=shard_params(state.params, mesh, use_tp=use_tp,
                            fsdp=use_fsdp, fsdp_min_size=fsdp_min),
        ema_params=shard_params(state.ema_params, mesh, use_tp=use_tp,
                                fsdp=use_fsdp, fsdp_min_size=fsdp_min),
        opt_state=opt_state,
        step=replicated(state.step, mesh),
        thresholder=jax.tree.map(lambda x: replicated(x, mesh),
                                 state.thresholder),
    )

    mgr = TrainCheckpointManager(os.path.join(out_dir, "ckpts"),
                                 save_interval_steps=ckpt_every)
    if mgr.latest_step is not None:
        state = mgr.restore(state)
        if is_main:
            print(f"resumed from step {mgr.latest_step}")

    logger = MetricLogger(out_dir) if is_main else None
    start = int(fetch_replicated(state.step))
    # On resume, reseed the data stream from the restored step so steps
    # start..N don't replay the exact batches (shuffle order, crops, noise
    # draws) already consumed by steps 0..(N-start).
    data_seed = cfg.get("seed", 0) + (1_000_003 * start if start else 0)
    train_ds = build_dataset(data_cfg, "train", seed=data_seed)
    # device transfer happens inside the prefetch worker so H2D overlaps
    # the previous step's compute (double buffering); `transfer: int16`
    # ships raw PCM and normalizes on device (2.6x fewer bytes per step).
    # `device_resident` (default on for the in-memory synthetic corpus)
    # pre-collates the whole dataset onto the device and gathers batches
    # in-graph — per-step H2D drops to the index vector, which both removes
    # the tunnel from the critical path and sidesteps the axon client's
    # permanent retention of every uploaded host buffer (data/device.py).
    transfer = data_cfg.get("transfer", "float32")
    device_resident = data_cfg.get("device_resident",
                                   bool(data_cfg.get("synthetic")))
    if device_resident and jax.process_count() > 1:
        # the resident corpus + in-graph gather assumes a single-process
        # addressable mesh; multi-host runs stream per-step batches instead
        if is_main:
            print("multi-process run: device_resident data disabled, "
                  "using the host-streamed prefetch path")
        device_resident = False
    # steps_per_dispatch (K): fold K training steps into ONE jitted
    # lax.scan program. Per-step host work (index upload, dispatch, Python
    # bookkeeping) drops to 1/K, which matters wherever dispatch latency is
    # visible — the axon tunnel's ~27 ms RTT most of all, but also plain
    # host-loop overhead on real pods. Requires device-resident data (the
    # scan gathers each step's batch in-graph) and identical math: batch
    # order comes from the same index_stream and the per-step key is
    # fold_in(rng, state.step), exactly the host loop's key schedule.
    spd = int(cfg.get("steps_per_dispatch", 1))
    if spd > 1 and (not device_resident or profile_steps):
        if is_main:
            print("steps_per_dispatch > 1 needs device-resident data and no "
                  "profile hooks; falling back to 1")
        spd = 1

    stream = _present = _absent = idx_gen = None
    if device_resident and spd > 1:
        from ..data.device import index_stream, precollate

        if len(train_ds) < batch_size:
            raise ValueError(
                f"dataset has {len(train_ds)} items < batch_size "
                f"{batch_size}; the drop-last epoch loop would yield none")
        _data = precollate(train_ds, transfer=transfer)
        _present = {k: v for k, v in _data.items() if v is not None}
        _absent = [k for k, v in _data.items() if v is None]
        idx_gen = index_stream(len(train_ds), batch_size, shuffle=True,
                               seed=data_seed)
    elif device_resident:
        from ..data.device import device_stream

        stream = device_stream(train_ds, batch_size, mesh, transfer=transfer,
                               shuffle=True, seed=data_seed)
    else:
        # data.num_workers (reference sylber_base.yaml:37): forked
        # process-pool batch assembly — FLAC decode dominates host-streamed
        # ingestion (~10 ms/item) and scales with cores, not threads
        stream = prefetch(
            _epoch_stream(train_ds, batch_size, shuffle=True,
                          transfer=transfer,
                          workers=int(data_cfg.get("num_workers", 0))),
            transform=lambda b: shard_batch(b, mesh))

    # buffer donation halves train-state memory on TPU; the XLA CPU runtime
    # deadlocks in collective thunks when arguments are donated (observed on
    # the simulated multi-device CPU mesh) and the axon-tunneled TPU backend
    # rejects donated executions with an opaque InvalidArgument at
    # result-fetch time — auto-off on both; SYLBER_TPU_DONATE overrides
    # (=1 forces on, =0 forces off).
    env = os.environ.get("SYLBER_TPU_DONATE")
    if env is not None:
        donatable = env != "0"
    else:
        version = getattr(jax.devices()[0].client, "platform_version", "")
        donatable = (jax.default_backend() != "cpu"
                     and "axon" not in version)
    donate = (0,) if donatable else ()
    raw_step = make_train_step(dcfg)
    step_fn = jax.jit(raw_step, donate_argnums=donate)
    eval_fn = jax.jit(make_eval_step(dcfg))

    multi_fn = None
    if spd > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        specs = {k: NamedSharding(mesh, P("dp", *[None] * (v.ndim - 1)))
                 for k, v in _present.items()}

        # data/_present are ARGUMENTS, not closure constants: the axon
        # tunnel rejects programs with multi-MB constants baked into the
        # HLO (HTTP 413), and arguments let XLA keep one resident copy.
        def _multi(st, rng_key, idx_kb, data):
            def body(s, idx_b):
                b = {k: jax.lax.with_sharding_constraint(v[idx_b], specs[k])
                     for k, v in data.items()}
                for k in _absent:
                    b[k] = None
                # same key schedule as the host loop: fold_in(rng, step)
                return raw_step(s, b, jax.random.fold_in(rng_key, s.step))

            return jax.lax.scan(body, st, idx_kb)

        multi_fn = jax.jit(_multi, donate_argnums=donate)

    from ..utils.profiling import hubert_train_flops, mfu

    def _log_row(s_end, m, crop_len, steps_per_sec=None):
        """``steps_per_sec=None`` measures since the last log; the
        multi-dispatch path passes the window-level rate instead (per-row
        sub-window timings inside one scan program would be fiction) and
        advances the bookkeeping itself."""
        nonlocal t_last, s_last
        if steps_per_sec is None:
            now = time.perf_counter()
            steps_per_sec = (s_end - s_last) / (now - t_last)
            t_last, s_last = now, s_end
        m["steps_per_sec"] = steps_per_sec
        m["mfu"] = mfu(
            hubert_train_flops(dcfg.model, batch_size, crop_len),
            1.0 / max(steps_per_sec, 1e-9),
            jax.devices()[0].device_kind, dp)
        if is_main:
            row = logger.log(s_end, m)
            print(f"step {s_end}: " + " ".join(
                f"{k}={v:.4g}" for k, v in row.items()
                if k not in ("time", "prefix")))

    t_last, s_last = time.perf_counter(), start
    val_ds = None
    with jax.set_mesh(mesh):
        step_i = start
        while step_i < max_steps:
            if multi_fn is not None and step_i + spd <= max_steps:
                idx = np.stack([next(idx_gen) for _ in range(spd)])
                state, ms = multi_fn(state, replicated(rng, mesh),
                                     jnp.asarray(idx), _present)
                s_end = step_i + spd
                logged = [s for s in range(step_i + 1, s_end + 1)
                          if s % log_every == 0]
                if logged:
                    mh = fetch_replicated(ms)  # (spd,)-stacked metrics
                    now = time.perf_counter()
                    sps = (s_end - s_last) / (now - t_last)
                    crop = _present["input_values"].shape[-1]
                    for s in logged:
                        _log_row(s, {k: v[s - step_i - 1]
                                     for k, v in mh.items()},
                                 crop, steps_per_sec=sps)
                    t_last, s_last = now, s_end
            else:
                if stream is not None:
                    batch = next(stream)  # device-resident (prefetch)
                else:
                    # spd remainder steps reuse the resident data 1 step
                    # at a time (no extra K-step compile for the tail)
                    from ..data.device import _gather

                    b = dict(_gather(_present, jnp.asarray(next(idx_gen))))
                    for k in _absent:
                        b[k] = None
                    batch = shard_batch(b, mesh)
                # per-step key derived from the step index, so a resumed
                # run at step S uses the same key stream as an
                # uninterrupted run (sequential splits would replay keys
                # 0..N-S after restore)
                krng = jax.random.fold_in(rng, step_i)
                if profile_steps and step_i == profile_steps[0]:
                    jax.profiler.start_trace(
                        os.path.join(out_dir, "profile"))
                state, metrics = step_fn(state, batch,
                                         replicated(krng, mesh))
                if profile_steps and step_i == profile_steps[1]:
                    jax.profiler.stop_trace()
                s_end = step_i + 1
                if s_end % log_every == 0:
                    _log_row(s_end, fetch_replicated(metrics),
                             batch["input_values"].shape[-1])

            if step_i // 50 != s_end // 50:
                # Per-step host garbage forms reference cycles holding the
                # multi-MB batch buffers; Python's allocation-count GC
                # thresholds almost never trigger on few-but-huge objects, so
                # RSS grows ~(batch bytes)/step until the kernel OOM-kills
                # the run (observed at 130 GB anon RSS on a 4000-step
                # stage-1 + stage-2 session). A periodic collect keeps RSS
                # flat (measured: +5.8 MB/step without, flat with).
                # ~3 ms per call, amortized over 50 steps.
                gc.collect()
            # interval-CROSSING save semantics, not exact-modulo: with
            # steps_per_dispatch > 1 (or resume from a non-aligned step)
            # s_end may never hit an exact multiple of ckpt_every, and
            # Orbax's FixedIntervalPolicy would then silently never save
            # again — force the save whenever the window crossed a boundary.
            if ckpt_every and step_i // ckpt_every != s_end // ckpt_every:
                # multi-process: hand Orbax the global (possibly sharded)
                # arrays — it coordinates the distributed write; fetching
                # to host first would both break (non-addressable) and
                # serialize the save through one host.
                mgr.save(s_end,
                         jax.device_get(state) if jax.process_count() == 1
                         else state, force=True)

            run_val = val_every and (step_i // val_every != s_end // val_every)
            step_i = s_end
            if run_val:
                val_bs = data_cfg.get("val_batch_size") or batch_size
                val_bs -= val_bs % dp or 0
                val_bs = max(val_bs, dp)
                if val_ds is None:  # built once, reused every interval
                    val_ds = build_dataset(data_cfg, "valid",
                                           seed=cfg.get("seed", 0) + 1)
                    if device_resident:
                        # ordered device-resident batches, uploaded once
                        # (repeated host uploads leak on the axon client —
                        # see data/device.py)
                        from ..data.device import precollate

                        # honor the configured transfer dtype (int16 halves
                        # the val corpus's HBM footprint; eval normalizes
                        # PCM on device via _pcm_normalize)
                        _vdata = precollate(val_ds, transfer=transfer)

                def val_batches():
                    if device_resident:
                        n = len(val_ds)
                        for i0 in range(0, n - val_bs + 1, val_bs):
                            idx = jnp.arange(i0, i0 + val_bs)
                            yield {k: (v[idx] if v is not None else None)
                                   for k, v in _vdata.items()}
                    else:
                        yield from val_ds.batches(val_bs, shuffle=False,
                                                  transfer=transfer)

                losses = []
                for vb, vbatch in enumerate(val_batches()):
                    if vb >= limit_val_batches:
                        break
                    vm = eval_fn(state, shard_batch(vbatch, mesh),
                                 replicated(jax.random.PRNGKey(vb), mesh))
                    losses.append(float(fetch_replicated(vm["loss"])))
                if losses and is_main:
                    logger.log(step_i, {"loss": float(np.mean(losses))},
                               prefix="val")
                    print(f"  val loss: {np.mean(losses):.4f}")

    mgr.wait()
    mgr.close()
    # bare student params for the next stage's `model_ckpt` hand-off
    # (reference: cross-stage strict=False load, train.py:49-60) and for
    # Segmenter(model_ckpt=...) inference
    from ..io.checkpoint import save_params

    save_params(os.path.join(out_dir, "params_final"),
                fetch_global(state.params))
    return state

"""Benchmark: batched syllable-segmentation inference throughput (RTFx).

Measures end-to-end Segmenter throughput (HuBERT-9L forward + on-device
segmentation + pooling) on LibriSpeech-test-clean-like utterances
(lognormal length mix, 2-20 s, batch 32 length-bucketed) and reports
real-time factor per chip. Baseline target: >=200x real-time per v5e chip
(`BASELINE.json`). LibriSpeech audio is not bundled in this image, so the
audio content is synthetic speech (sylber_tpu/data/synthetic.py) —
throughput depends only on shapes, but realistic content keeps the
segmentation workload (segment counts, pass-2 sweeps) honest.

stdout: ONE JSON line {"metric", "value", "unit", "vs_baseline"} (driver
contract). With SYLBER_BENCH_EXTRA=1, supplementary metrics are printed to
stderr as JSON lines and written to BENCH_EXTRA.json:
  - rtfx_fp32_parity: throughput of the exact mode (f32, precision=highest);
  - fast_vs_exact_boundary_f1: segmentation agreement between the benched
    fast mode and the exact mode on the same audio (tol 0 frames);
  - longform_rtfx: one 10-minute recording through the chunked long-form
    path (fast mode, no hidden track).
Env knobs: SYLBER_BENCH_BATCHES (default 24), SYLBER_BENCH_BS (32),
SYLBER_BENCH_PRECISION ("default"), SYLBER_BENCH_DTYPE ("bfloat16"),
SYLBER_BENCH_FRONTEND_DTYPE ("bfloat16"), SYLBER_BENCH_EXTRA (default 1;
set 0 to skip the supplementary passes).
"""

import json
import os
import sys
import time

import numpy as np


def _lengths(rng, n, lo=2.0, hi=20.0):
    # LibriSpeech test-clean-ish: median ~6 s, right-skewed
    ls = np.exp(rng.normal(np.log(6.5), 0.55, size=n))
    return np.clip(ls, lo, hi)


def _speech_pool(rng, n_pool=48, max_s=20.0):
    """Pool of synthetic speech utterances (int16 PCM at full max length);
    batches slice/tile from it so generation stays off the timed path."""
    from sylber_tpu.data.synthetic import synth_utterance

    pool = []
    for _ in range(n_pool):
        wav, _ = synth_utterance(rng, int(max_s * 16000))
        pool.append(np.clip(wav * 24000, -32768, 32767).astype(np.int16))
    return pool


def main():
    from sylber_tpu.utils.platform import (apply_jax_platform,
                                           enable_compilation_cache)

    apply_jax_platform()  # honor JAX_PLATFORMS even on axon (CPU verify)
    enable_compilation_cache()  # the length-bucket matrix compiles once

    import jax
    import jax.numpy as jnp

    from sylber_tpu.api import Segmenter

    n_batches = int(os.environ.get("SYLBER_BENCH_BATCHES", 24))
    bs = int(os.environ.get("SYLBER_BENCH_BS", 32))
    precision = os.environ.get("SYLBER_BENCH_PRECISION", "default")
    dtype = jnp.dtype(os.environ.get("SYLBER_BENCH_DTYPE", "bfloat16"))

    from sylber_tpu.models.hubert import HubertConfig

    fdt = jnp.dtype(os.environ.get("SYLBER_BENCH_FRONTEND_DTYPE", "bfloat16"))
    seg = Segmenter(hubert_config=HubertConfig(
        dtype=dtype, precision=precision, frontend_dtype=fdt),
        length_bucket_s=4.0)

    rng = np.random.RandomState(0)
    pool = _speech_pool(rng)
    # sort lengths within the run to bucket efficiently (production serving
    # would do the same); seconds counted from true lengths. Audio ships as
    # int16 PCM and is normalized on device (halves host->device bytes).
    all_lens = np.sort(_lengths(rng, n_batches * bs))[::-1]
    batches = []
    for i in range(n_batches):
        lens = all_lens[i * bs: (i + 1) * bs]
        max_len = int(np.ceil(lens.max() * 16000 / seg.length_bucket)
                      ) * seg.length_bucket
        wav = np.zeros((bs, max_len), np.int16)
        mask = np.zeros((bs, max_len), np.int32)
        for j, l in enumerate(lens):
            n = int(l * 16000)
            wav[j, :n] = pool[(i * bs + j) % len(pool)][:n]
            mask[j, :n] = 1
        batches.append((jnp.asarray(wav), jnp.asarray(mask), lens.sum()))

    def make_run(s, norm_thr=2.6, merge_thr=0.8):
        def run(wav, mask):
            hidden, res = s._forward_segment(
                s.params, wav, mask, jnp.float32(norm_thr),
                jnp.float32(merge_thr))
            return res.segments, res.num_segments, res.features
        return run

    def measure(s, bb, label):
        run = make_run(s)
        # warmup: compile every distinct shape. NOTE: block_until_ready does
        # not reliably block on the axon-tunneled TPU platform, so completion
        # is forced with a small device->host fetch of the segment counts.
        shapes = {}
        for wav, mask, _ in bb:
            if wav.shape not in shapes:
                shapes[wav.shape] = True
                _ = np.asarray(run(wav, mask)[1])
        print(f"[{label}] compiled {len(shapes)} shape buckets",
              file=sys.stderr)
        t0 = time.perf_counter()
        total_audio, results = 0.0, []
        for wav, mask, secs in bb:
            results.append(run(wav, mask)[1])  # async dispatch
            total_audio += secs
        for r in results:
            _ = np.asarray(r)  # drain: 32 ints per batch over the wire
        dt = time.perf_counter() - t0
        print(f"[{label}] {total_audio:.0f}s audio in {dt:.3f}s on "
              f"{jax.devices()[0].device_kind}", file=sys.stderr)
        return total_audio / dt

    rtfx = measure(seg, batches, f"{precision}/{dtype}")
    print(json.dumps({
        "metric": "segmentation_inference_rtfx_per_chip",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 200.0, 3),
    }))

    if os.environ.get("SYLBER_BENCH_EXTRA", "1") != "1":
        return

    # ---- supplementary metrics (stderr + BENCH_EXTRA.json) ----
    from sylber_tpu.models.hubert import HubertConfig  # noqa: F811
    from sylber_tpu.utils.metrics import boundary_f1

    extra = {"primary_rtfx": round(rtfx, 1),
             "primary_mode": f"{precision}/{dtype}/frontend-{fdt}"}

    # per-bucket RTFx of the primary mode (serving visibility): executables
    # are already compiled, so each group pass costs one drain RTT
    by_shape = {}
    for b in batches:
        by_shape.setdefault(b[0].shape[1], []).append(b)
    run_primary = make_run(seg)
    rtfx_bucket = {}
    for L in sorted(by_shape):
        grp = by_shape[L]
        t0 = time.perf_counter()
        results = [run_primary(w, m)[1] for w, m, _ in grp]
        for r in results:
            _ = np.asarray(r)
        rtfx_bucket[f"{L // 16000}s"] = round(
            sum(s for _, _, s in grp) / (time.perf_counter() - t0), 1)
    extra["rtfx_by_bucket"] = rtfx_bucket

    # fast-vs-exact gate model: a trained full-width (768-d) checkpoint when
    # available (runs/full_proof, built by scripts/train_full_proof.py on the
    # synthetic corpus — realistic thresholded-cosine margins), else the
    # random-init bench weights. Gate covers EVERY length bucket of the mix
    # (1 batch per bucket bounds the fp32 compile count).
    gate_ckpt = os.environ.get("SYLBER_BENCH_GATE_CKPT",
                               "runs/full_proof/full_ckpt.npz")
    norm_thr, merge_thr = 2.6, 0.8
    gate_params = seg.params
    if os.path.exists(gate_ckpt):
        from sylber_tpu.io.checkpoint import load_params_npz

        gate_params = load_params_npz(gate_ckpt)
        meta_path = gate_ckpt.replace(".npz", ".json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                gmeta = json.load(f)
            norm_thr = float(gmeta.get("norm_threshold", norm_thr))
            merge_thr = float(gmeta.get("merge_threshold", merge_thr))
        extra["gate_model"] = f"trained-768d ({gate_ckpt})"
        seg_gate_fast = Segmenter(hubert_config=HubertConfig(
            dtype=dtype, precision=precision, frontend_dtype=fdt),
            length_bucket_s=4.0, params=gate_params)
    else:
        extra["gate_model"] = "random-init-768d"
        seg_gate_fast = seg
    extra["gate_thresholds"] = [norm_thr, merge_thr]

    sub = [by_shape[L][0] for L in sorted(by_shape)]
    seg32 = Segmenter(hubert_config=HubertConfig(
        dtype=jnp.float32, precision="highest",
        frontend_dtype=jnp.float32), length_bucket_s=4.0,
        params=gate_params)
    extra["rtfx_fp32_parity"] = round(measure(seg32, sub, "fp32/highest"), 1)

    # fast-vs-exact decision agreement on identical audio, per bucket
    run_f = make_run(seg_gate_fast, norm_thr, merge_thr)
    run_e = make_run(seg32, norm_thr, merge_thr)
    f1s, deltas = [], []
    f1_bucket = {}
    for wav, mask, _ in sub:
        sf, nf, _ = (np.asarray(x) for x in run_f(wav, mask))
        se, ne, _ = (np.asarray(x) for x in run_e(wav, mask))
        bucket_f1 = []
        for j in range(wav.shape[0]):
            bucket_f1.append(boundary_f1(sf[j, : nf[j]], se[j, : ne[j]],
                                         tol_frames=0))
            deltas.append(abs(int(nf[j]) - int(ne[j])))
        f1s.extend(bucket_f1)
        f1_bucket[f"{wav.shape[1] // 16000}s"] = round(
            float(np.mean(bucket_f1)), 5)
    extra["fast_vs_exact_boundary_f1"] = round(float(np.mean(f1s)), 5)
    extra["fast_vs_exact_boundary_f1_by_bucket"] = f1_bucket
    extra["fast_vs_exact_nseg_delta"] = round(float(np.mean(deltas)), 4)

    # long-form: one 10-minute recording, fast path (no hidden track).
    # The end-to-end number includes tunnel RTTs and historically swings
    # 12-40% run-to-run with tunnel state, so: (a) median of 3 repeats,
    # (b) a device-time-only RTFx from back-to-back dispatches of the
    # resident window program (tunnel-independent).
    from sylber_tpu.longform import LongFormSegmenter

    long_s = int(os.environ.get("SYLBER_BENCH_LONGFORM_S", 600))
    lf = LongFormSegmenter(seg_gate_fast, chunk_seconds=30.0,
                           overlap_seconds=2.0)
    long_wav = np.concatenate(
        [pool[i % len(pool)] for i in range((long_s + 19) // 20)]
    ).astype(np.float32)
    long_wav = long_wav[: long_s * 16000] / 24000.0
    lf_kw = dict(in_second=True, return_hidden=False,
                 norm_threshold=norm_thr, merge_threshold=merge_thr)
    _ = lf(wav=long_wav, **lf_kw)  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = lf(wav=long_wav, **lf_kw)
        times.append(time.perf_counter() - t0)
    secs = len(long_wav) / 16000.0
    extra["longform_rtfx_runs"] = [round(secs / t, 1) for t in times]
    extra["longform_rtfx"] = round(secs / float(np.median(times)), 1)

    # device-time-only: ITERS async dispatches of the already-compiled
    # resident program (batch_windows x ~30 s windows each), one scalar
    # drain at the end; per-call RTT overlaps device execution. Reported
    # as RTFx of the REAL longform workload (window count incl. overlap).
    import jax.numpy as jnp  # noqa: F811

    W = lf.chunk_frames * 320 + 320
    prog = lf._resident_program(W)
    pcm = np.zeros(((W * 2 + 60 * 16000 - 1) // (60 * 16000))
                   * 60 * 16000, np.int16)
    n_src = min(len(long_wav), len(pcm))
    pcm[:n_src] = np.round(long_wav[:n_src] * 24000)
    pcm_dev = jnp.asarray(pcm)
    B = lf.batch_windows
    st = jnp.asarray(np.zeros(B, np.int32))
    nv = jnp.asarray(np.full(B, W, np.int32))
    args = (seg_gate_fast.params, pcm_dev, jnp.float32(1 / 24000.0),
            st, nv, jnp.float32(norm_thr), jnp.float32(merge_thr))
    _ = np.asarray(prog(*args)[1].num_segments)  # warm
    iters = int(os.environ.get("SYLBER_BENCH_LF_ITERS", 12))
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = prog(*args)[1].num_segments
    _ = np.asarray(last)
    per_window = (time.perf_counter() - t0) / (iters * B)
    step = lf.chunk_frames - lf.overlap_frames
    n_windows = len(range(0, max(int(secs * 50) - lf.overlap_frames, 1),
                          step))
    extra["longform_device_rtfx"] = round(secs / (n_windows * per_window), 1)

    # int16-resident vs float32-window agreement on the gate model (the
    # default-transfer numeric-change gate promised in longform.py docs)
    lf32 = LongFormSegmenter(seg_gate_fast, chunk_seconds=30.0,
                             overlap_seconds=2.0, transfer="float32")
    lf_kw["in_second"] = False
    out16 = lf(wav=long_wav, **lf_kw)
    out32 = lf32(wav=long_wav, **lf_kw)
    extra["longform_int16_vs_f32_f1"] = round(
        boundary_f1(np.asarray(out16["segments"]),
                    np.asarray(out32["segments"]), tol_frames=0), 5)

    for k in ("rtfx_fp32_parity", "fast_vs_exact_boundary_f1",
              "longform_rtfx", "longform_device_rtfx",
              "longform_int16_vs_f32_f1"):
        print(json.dumps({"metric": k, "value": extra[k]}), file=sys.stderr)
    with open("BENCH_EXTRA.json", "w") as f:
        json.dump(extra, f, indent=2)

    # fidelity gate on the DEFAULT longform transfer (BASELINE.md's 0.5%
    # budget): int16-resident must agree with float32 windows to F1 >= 0.995
    # at tol 0. Windows now compute at identical padded lengths (see
    # longform._resident_program), so the only remaining difference is the
    # int16 transfer quantization — a failure here means a real regression.
    # Metrics above are already written/printed; fail loudly after.
    assert extra["longform_int16_vs_f32_f1"] >= 0.995, (
        "longform int16-resident default path drifted from float32 windows: "
        f"boundary F1 {extra['longform_int16_vs_f32_f1']} < 0.995")


if __name__ == "__main__":
    main()

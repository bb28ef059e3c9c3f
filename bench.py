"""Benchmark: batched syllable-segmentation inference throughput (RTFx).

Measures end-to-end Segmenter throughput (HuBERT-9L forward + on-device
segmentation + pooling) on LibriSpeech-test-clean-like utterances
(lognormal length mix, 2-20 s, batch 32 length-bucketed) and reports
real-time factor per chip. Baseline target: >=200x real-time per v5e chip
(`BASELINE.json`). LibriSpeech audio is not bundled in this image, so the
audio content is synthetic speech-like signal — throughput depends only on
shapes, not content.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: SYLBER_BENCH_BATCHES (default 12), SYLBER_BENCH_BS (32),
SYLBER_BENCH_PRECISION (default "default"), SYLBER_BENCH_DTYPE ("bfloat16").
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


def main():
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
    # sort lengths within the run to bucket efficiently (production serving
    # would do the same); seconds counted from true lengths. Audio ships as
    # int16 PCM and is normalized on device (halves host->device bytes).
    all_lens = np.sort(_lengths(rng, n_batches * bs))[::-1]
    batches = []
    for i in range(n_batches):
        lens = all_lens[i * bs: (i + 1) * bs]
        max_len = int(np.ceil(lens.max() * 16000 / seg.length_bucket)
                      ) * seg.length_bucket
        wav = (rng.randn(bs, max_len) * 2000).astype(np.int16)
        mask = np.zeros((bs, max_len), np.int32)
        for j, l in enumerate(lens):
            mask[j, : int(l * 16000)] = 1
            wav[j, int(l * 16000):] = 0
        batches.append((jnp.asarray(wav), jnp.asarray(mask), lens.sum()))

    def run(wav, mask):
        hidden, res = seg._forward_segment(
            seg.params, wav, mask, jnp.float32(2.6), jnp.float32(0.8))
        return res.segments, res.num_segments, res.features

    # warmup: compile every distinct shape. NOTE: block_until_ready does not
    # reliably block on the axon-tunneled TPU platform, so completion is
    # forced with a small device->host fetch of the segment counts.
    shapes = {}
    for wav, mask, _ in batches:
        if wav.shape not in shapes:
            shapes[wav.shape] = True
            _ = np.asarray(run(wav, mask)[1])
    print(f"compiled {len(shapes)} shape buckets", file=sys.stderr)

    t0 = time.perf_counter()
    total_audio = 0.0
    results = []
    for wav, mask, secs in batches:
        results.append(run(wav, mask)[1])  # async dispatch
        total_audio += secs
    for r in results:
        _ = np.asarray(r)  # drain: 32 ints per batch over the wire
    dt = time.perf_counter() - t0

    rtfx = total_audio / dt
    print(
        f"{total_audio:.0f}s audio in {dt:.3f}s on "
        f"{jax.devices()[0].device_kind} ({precision}/{dtype})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "segmentation_inference_rtfx_per_chip",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 200.0, 3),
    }))


if __name__ == "__main__":
    main()

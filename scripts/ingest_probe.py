"""Host-streamed ingestion throughput vs device consumption (VERDICT r4 #6).

Builds a LibriSpeech-shaped FLAC corpus on disk (16 kHz mono, 10-20 s
utterances, libFLAC-encoded via libsndfile), then measures the full
`data/dataset.py` pipeline — manifest -> FLAC decode -> 5-s aligned crop ->
noise clip -> Wav2Vec2-equivalent collate -> (optionally) the prefetch
thread — in seconds-of-training-audio per second, against the device's
consumption rate (B=100 x 5 s / ~251 ms/step = ~1,990 s/s on one v5e chip).

Pure host measurement: runs on CPU, never touches the TPU.

Usage: JAX_PLATFORMS=cpu python scripts/ingest_probe.py
Knobs: SYLBER_INGEST_FILES (default 96), SYLBER_INGEST_BATCHES (16),
       SYLBER_INGEST_WORKERS (0 = also sweep 2/4).
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = int(os.environ.get("SYLBER_INGEST_FILES", 96))
N_BATCHES = int(os.environ.get("SYLBER_INGEST_BATCHES", 16))
BATCH = 100
CROP_S = 5.0


def build_corpus(root: Path):
    from sylber_tpu.utils import sndfile

    assert sndfile.available(), "libsndfile needed to encode the corpus"
    wav_dir = root / "wavs"
    noise_dir = root / "noise"
    wav_dir.mkdir()
    noise_dir.mkdir()
    rng = np.random.RandomState(0)
    tags, total_s = [], 0.0
    for i in range(N_FILES):
        dur = rng.uniform(10.0, 20.0)
        n = int(dur * 16000)
        t = np.arange(n) / 16000
        f0 = rng.uniform(100, 240)
        x = (0.4 * np.sin(2 * np.pi * f0 * t)
             * np.clip(np.sin(2 * np.pi * rng.uniform(2, 5) * t), 0, None)
             + 0.1 * np.sin(2 * np.pi * rng.uniform(500, 900) * t)
             + 0.02 * rng.randn(n))
        pcm = (x / np.abs(x).max() * 20000).astype(np.int16)
        sndfile.write(wav_dir / f"utt{i:04d}.flac", pcm, 16000)
        tags.append(f"utt{i:04d}")
        total_s += dur
    for j in range(4):
        n = 10 * 16000
        pcm = (np.random.RandomState(100 + j).randn(n) * 3000).astype(np.int16)
        sndfile.write(noise_dir / f"noise{j}.wav", pcm, 16000)
    manifest = root / "train.txt"
    manifest.write_text("\n".join(tags) + "\n")
    return wav_dir, noise_dir, manifest, total_s


def main():
    from sylber_tpu.data.dataset import SpeechDataset, load_manifest, prefetch

    root = Path(tempfile.mkdtemp(prefix="ingest_probe_"))
    t0 = time.perf_counter()
    wav_dir, noise_dir, manifest, total_s = build_corpus(root)
    print(f"corpus: {N_FILES} FLAC files, {total_s:.0f} s audio, built in "
          f"{time.perf_counter() - t0:.1f}s at {root}")

    results = {"n_files": N_FILES, "batch": BATCH, "crop_s": CROP_S}

    def run(workers: int) -> float:
        # two ratio entries -> ratio sampling + dummy_len epoch semantics,
        # exactly the reference LibriSpeech recipe's manifest shape
        ds = SpeechDataset(
            wav_dirs=[str(wav_dir), str(wav_dir)],
            tags=load_manifest([(0.5, str(manifest)),
                                (0.5, str(manifest))]),
            max_len=int(CROP_S * 16000), noise_dir=str(noise_dir),
            dummy_len=300_000, seed=0)
        it = iter(ds.batches(BATCH, shuffle=True, transfer="int16",
                             workers=workers)
                  if workers else
                  prefetch(ds.batches(BATCH, shuffle=True,
                                      transfer="int16")))
        next(it)  # warm (thread/process spin-up, first decode)
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            b = next(it)
            assert b["input_values"].shape[0] == BATCH
        dt = time.perf_counter() - t0
        rate = N_BATCHES * BATCH * CROP_S / dt
        label = f"workers={workers}" if workers else "single-thread+prefetch"
        print(f"{label:26s} {rate:8.0f} s-audio/s "
              f"({dt / N_BATCHES * 1000:.0f} ms/batch)")
        return rate

    results["single_thread_s_per_s"] = run(0)

    sweep = os.environ.get("SYLBER_INGEST_WORKERS", "0")
    if sweep == "0":
        for w in (2, 4):
            results[f"workers{w}_s_per_s"] = run(w)
    elif int(sweep) > 1:
        results[f"workers{sweep}_s_per_s"] = run(int(sweep))

    # device consumption on one v5e chip: B=100 x 5 s at ~251 ms/step
    # (80.3 ms/step at B=32, MFU batch-flat — CLAUDE.md)
    results["device_consumption_s_per_s"] = 100 * 5.0 / 0.251
    print(json.dumps(results))
    with open("/tmp/ingest_probe.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

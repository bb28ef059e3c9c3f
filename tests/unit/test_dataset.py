"""Input-pipeline tests: crop alignment, segment windowing, collation,
noise placement, checkpoint round trips, metrics."""

import numpy as np
import pytest
from scipy.io import wavfile

from sylber_tpu.data.dataset import (
    BUFFER_SIZE, FRAME_SIZE, SpeechDataset, load_manifest, prefetch)


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    wav_dir = tmp_path / "wavs"
    seg_dir = tmp_path / "segs"
    noise_dir = tmp_path / "noise"
    for d in (wav_dir, seg_dir, noise_dir):
        d.mkdir()
    tags = []
    for i, sec in enumerate((1.0, 3.0, 7.0)):
        tag = f"utt{i}"
        n = int(sec * 16000)
        wav = (rng.randn(n) * 3000).astype(np.int16)
        wavfile.write(str(wav_dir / f"{tag}.wav"), 16000, wav)
        frames = n // FRAME_SIZE
        bounds = np.sort(rng.choice(np.arange(1, frames), 8, replace=False))
        np.save(seg_dir / f"{tag}.npy", bounds.reshape(4, 2))
        tags.append(tag)
    wavfile.write(str(noise_dir / "n0.wav"), 16000,
                  (rng.randn(32000) * 1000).astype(np.int16))
    manifest = tmp_path / "tags.txt"
    manifest.write_text("\n".join(tags) + "\n")
    return wav_dir, seg_dir, noise_dir, manifest


def test_crop_alignment_and_buffer(corpus):
    wav_dir, seg_dir, noise_dir, manifest = corpus
    tags = load_manifest([(1.0, str(manifest))])
    ds = SpeechDataset([str(wav_dir)], tags, data_dir=str(seg_dir),
                       max_len=80_000, noise_dir=str(noise_dir), seed=0)
    for i in range(len(ds)):
        item = ds[i]
        # 160-sample zero buffer on both ends, interior frame-aligned
        assert (item["wav"][:BUFFER_SIZE] == 0).all()
        assert (item["wav"][-BUFFER_SIZE:] == 0).all()
        assert (len(item["wav"]) - 2 * BUFFER_SIZE) % FRAME_SIZE == 0
        assert len(item["wav"]) <= 80_000 + 2 * BUFFER_SIZE
        # segments clipped to the crop window in frames
        segs = item["segments"]
        if len(segs):
            assert segs.min() >= 0
            assert segs.max() <= ds.max_frames
        assert item["noise"] is not None
        assert len(item["noise"]) == len(item["wav"])


def test_long_file_crops_to_max_len(corpus):
    wav_dir, seg_dir, _, manifest = corpus
    tags = load_manifest([(1.0, str(manifest))])
    ds = SpeechDataset([str(wav_dir)], tags, data_dir=str(seg_dir),
                       max_len=32_000, seed=1)
    item = ds[2]  # the 7 s file
    assert len(item["wav"]) == 32_000 + 2 * BUFFER_SIZE


def test_collate_normalization_and_padding(corpus):
    wav_dir, seg_dir, _, manifest = corpus
    tags = load_manifest([(1.0, str(manifest))])
    ds = SpeechDataset([str(wav_dir)], tags, data_dir=str(seg_dir), seed=2)
    batch = ds.collate([ds[i] for i in range(3)])
    iv, am = batch["input_values"], batch["attention_mask"]
    assert iv.shape == am.shape
    for i in range(3):
        n = int(am[i].sum())
        x = iv[i, :n]
        # Wav2Vec2Processor semantics: per-utterance zero-mean/unit-var
        assert abs(x.mean()) < 1e-4
        assert abs(x.var() - 1.0) < 1e-2
        assert (iv[i, n:] == 0).all()
    assert batch["segments"].shape[0] == 3
    assert (batch["num_segments"] == 4).all()


def test_ratio_sampling():
    ds = SpeechDataset.__new__(SpeechDataset)
    ds.sample_by_ratio = True
    ds.ratios = np.array([0.9, 0.1])
    ds.tag_groups = [["a1", "a2"], ["b1"]]
    ds.wav_dirs = ["dirA", "dirB"]
    ds.rng = np.random.RandomState(0)
    picks = [ds._pick(0)[1] for _ in range(500)]
    frac_a = np.mean([p == "dirA" for p in picks])
    assert 0.85 < frac_a < 0.95


def test_prefetch_order():
    out = list(prefetch(iter(range(20)), depth=3))
    assert out == list(range(20))


def test_params_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from sylber_tpu.io.checkpoint import load_params, save_params

    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": {"c": jnp.ones(4)}}
    save_params(str(tmp_path / "ck"), params)
    back = load_params(str(tmp_path / "ck"))
    for want, got in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_metrics():
    from sylber_tpu.utils.metrics import boundary_f1, segment_f1, token_rate

    a = np.array([[0, 5], [5, 9], [12, 20]])
    assert boundary_f1(a, a, 0) == 1.0
    assert segment_f1(a, a, 0) == 1.0
    b = np.array([[0, 5], [5, 10], [12, 20]])  # one edge off by 1
    assert boundary_f1(a, b, 1) == 1.0
    assert boundary_f1(a, b, 0) < 1.0
    assert segment_f1(a, b, 1) == 1.0
    assert abs(token_rate([a, b], [2.0, 1.0]) - 2.0) < 1e-9


def test_int16_transfer_equivalent_to_float_collate():
    """`transfer='int16'` + on-device normalization must match the float32
    collate up to int16 quantization noise (the peak scaling applied by the
    quantizer is erased by the zero-mean/unit-var normalization)."""
    import jax.numpy as jnp

    from sylber_tpu.data.dataset import SyntheticSpeechDataset
    from sylber_tpu.train.distill import _pcm_normalize

    # utterances shorter than the crop window -> real padding in the batch
    ds = SyntheticSpeechDataset(n_utts=4, max_len=48000, seed=3,
                                utt_seconds=(1.0, 2.5))
    items = [ds[i] for i in range(4)]
    assert len({len(it["wav"]) for it in items}) > 1
    bf = ds.collate(items, transfer="float32")
    bi = ds.collate(items, transfer="int16")

    assert bi["input_values"].dtype == np.int16
    assert bi["attention_mask"].dtype == np.int8
    assert bi["noise"].dtype == np.int16

    dev = np.asarray(_pcm_normalize(
        jnp.asarray(bi["input_values"]),
        jnp.asarray(bi["attention_mask"], jnp.int32)))
    assert np.abs(dev - bf["input_values"]).max() < 2e-3
    # padding stays exactly zero
    pad = bf["attention_mask"] == 0
    assert np.abs(dev[pad]).max() == 0.0


def test_mp_batches_deterministic_and_worker_count_invariant(corpus):
    """workers>0 assembles batches in forked processes; the stream must be
    (a) complete and correctly shaped, (b) deterministic across runs, and
    (c) invariant to the worker count (per-batch RNG is seeded from
    (dataset seed, batch index), not from which worker ran it)."""
    wav_dir, seg_dir, noise_dir, manifest = corpus
    tags = load_manifest([(1.0, str(manifest))])

    def run(workers, seed=7):
        ds = SpeechDataset([str(wav_dir)], tags, data_dir=str(seg_dir),
                           noise_dir=str(noise_dir), max_len=32000,
                           seed=seed)
        return list(ds.batches(2, shuffle=True, drop_last=False,
                               transfer="int16", workers=workers))

    w1 = run(1)
    w2 = run(2)
    w1b = run(1)
    assert len(w1) == len(w2) == 2  # 3 utts, batch 2, keep-last
    for a, b, c in zip(w1, w2, w1b):
        for k in ("input_values", "attention_mask", "segments",
                  "num_segments", "noise"):
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])
    assert w1[0]["input_values"].shape[0] == 2
    assert w1[0]["input_values"].dtype == np.int16


def test_mp_batches_matches_single_thread_items(corpus):
    """With noise/crop randomness removed (short utts, no noise dir), the
    worker path must produce byte-identical batches to the single-thread
    path under the same epoch order (shuffle=False)."""
    wav_dir, seg_dir, _, manifest = corpus
    tags = load_manifest([(1.0, str(manifest))])
    ds0 = SpeechDataset([str(wav_dir)], tags, data_dir=str(seg_dir),
                        max_len=400_000, seed=3)
    ds1 = SpeechDataset([str(wav_dir)], tags, data_dir=str(seg_dir),
                        max_len=400_000, seed=3)
    single = list(ds0.batches(2, shuffle=False, drop_last=False))
    multi = list(ds1.batches(2, shuffle=False, drop_last=False, workers=2))
    assert len(single) == len(multi)
    for a, b in zip(single, multi):
        for k in ("input_values", "attention_mask", "segments",
                  "num_segments"):
            np.testing.assert_array_equal(a[k], b[k])

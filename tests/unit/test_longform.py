"""Long-form chunked segmentation: stitching correctness + API smoke."""

import numpy as np
import pytest

from sylber_tpu.longform import LongFormSegmenter
from sylber_tpu.ops.segment_np import segment_oracle


class _FakeSegmenter:
    """Serves windows of a precomputed global states track, so stitching can
    be validated against the oracle run on the full track."""

    def __init__(self, states, nt, mt):
        self.states, self.nt, self.mt = states, nt, mt

    def process(self, wavs, in_second=False, norm_threshold=None,
                merge_threshold=None, return_hidden=True):
        outs = []
        for w in wavs:
            lo, n = w
            st = self.states[lo: lo + n]
            segs = segment_oracle(st, self.nt, self.mt)
            outs.append({
                "segments": segs,
                "hidden_states": st,
                "hidden_states_device": st,
                "frame_norms": np.sqrt((st ** 2).sum(-1) + 1e-8),
                "segment_features": (np.stack([st[s:e].mean(0)
                                               for s, e in segs])
                                     if len(segs) else np.array([])),
            })
        return outs


def _track(rng, L=900, d=32):
    states = np.zeros((L, d), np.float32)
    i = 0
    while i < L:
        span = int(rng.randint(3, 15))
        span = min(span, L - i)
        if rng.rand() < 0.3:
            states[i:i + span] = rng.randn(span, d) * 0.05
        else:
            proto = rng.randn(d)
            proto = proto / np.linalg.norm(proto) * rng.uniform(4, 9)
            states[i:i + span] = proto + rng.randn(span, d) * 0.1
        i += span
    return states


def _run_stitch(lf, states):
    step = lf.chunk_frames - lf.overlap_frames
    L = len(states)
    starts = list(range(0, max(L - lf.overlap_frames, 1), step))
    windows = [(s, min(lf.chunk_frames, L - s)) for s in starts]
    results = lf.segmenter.process(windows)
    cuts = lf._cuts(starts, results)
    stitched = lf._stitch_segments(starts, results, cuts)
    hidden = lf._stitch_hidden(starts, results, cuts)
    return starts, results, cuts, stitched, hidden


def test_stitching_matches_full_pass_on_shared_states():
    """When window states equal slices of one global track (no attention
    edge effects), stitched segments must equal the full-pass segmentation
    away from (and mostly at) cut points."""
    rng = np.random.RandomState(0)
    states = _track(rng)
    nt, mt = 2.0, 0.8
    want = segment_oracle(states, nt, mt)

    lf = LongFormSegmenter.__new__(LongFormSegmenter)
    lf.segmenter = _FakeSegmenter(states, nt, mt)
    lf.chunk_frames = 300
    lf.overlap_frames = 60
    lf.batch_windows = 4

    starts, results, cuts, stitched, hidden = _run_stitch(lf, states)

    assert hidden.shape == states.shape
    np.testing.assert_array_equal(hidden, states)
    segs = np.asarray([[s, e] for _, s, e, _ in stitched])
    assert (segs[:, 1] > segs[:, 0]).all()
    assert (segs[1:, 0] >= segs[:-1, 1]).all()  # non-overlapping, ordered
    # every full-pass boundary far from any cut must appear exactly
    cut_zone = set()
    for i in range(len(starts) - 1):
        cut_zone.update(range(starts[i + 1] - 5,
                              starts[i] + lf.chunk_frames + 5))
    got_bounds = set(segs.flatten().tolist())
    missing = [b for b in want.flatten().tolist()
               if b not in got_bounds and b not in cut_zone]
    assert not missing, f"lost boundaries away from cuts: {missing[:10]}"
    want_b = set(want.flatten().tolist())
    inter = len(got_bounds & want_b)
    f1 = 2 * inter / (len(got_bounds) + len(want_b))
    assert f1 > 0.9, f1


def test_fast_features_equal_full_pool():
    """Fast path (window features + lazy re-pool of truncated segments)
    must equal pooling from the stitched hidden track."""
    rng = np.random.RandomState(3)
    states = _track(rng, L=700)
    lf = LongFormSegmenter.__new__(LongFormSegmenter)
    lf.segmenter = _FakeSegmenter(states, 2.0, 0.8)
    lf.chunk_frames = 250
    lf.overlap_frames = 50
    lf.batch_windows = 4

    starts, results, cuts, stitched, hidden = _run_stitch(lf, states)
    fast = lf._features_fast(starts, results, stitched)
    full = np.stack([hidden[s:e].mean(0) for _, s, e, _ in stitched])
    np.testing.assert_allclose(fast, full, atol=1e-5, rtol=1e-5)


def test_longform_api_smoke():
    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig

    cfg = HubertConfig(num_hidden_layers=1, hidden_size=32,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4, precision="default")
    seg = Segmenter(hubert_config=cfg)

    lf = LongFormSegmenter(seg, chunk_seconds=5.0, overlap_seconds=1.0,
                           batch_windows=2)
    rng = np.random.RandomState(1)
    wav = rng.randn(16000 * 18).astype(np.float32)  # 18 s
    out = lf(wav=wav, in_second=False, norm_threshold=1.0,
             merge_threshold=0.9)
    assert out["hidden_states"].shape[0] > 800  # ~18 s * 50 Hz
    segs = out["segments"]
    if len(segs):
        assert (segs[:, 1] > segs[:, 0]).all()
        assert (segs[1:, 0] >= segs[:-1, 1]).all()
        assert len(out["segment_features"]) == len(segs)

    # fast path in float32 parity mode: same segments, same features, no
    # hidden track. (The DEFAULT fast path is the device-resident int16
    # route — deliberately not bit-exact vs float32 windows; its agreement
    # gate is test_resident_int16_path_matches_float32_path.)
    lf32 = LongFormSegmenter(seg, chunk_seconds=5.0, overlap_seconds=1.0,
                             batch_windows=2, transfer="float32")
    fast = lf32(wav=wav, in_second=False, norm_threshold=1.0,
                merge_threshold=0.9, return_hidden=False)
    assert "hidden_states" not in fast
    np.testing.assert_array_equal(fast["segments"], segs)
    np.testing.assert_allclose(fast["segment_features"],
                               out["segment_features"], atol=2e-4, rtol=1e-3)


def test_resident_int16_path_matches_float32_path():
    """Device-resident int16 fast path vs the float32 window path: same
    recording, same thresholds. int16 quantization (1/32767 of peak) and
    cross-program float rounding can flip only marginal cosine decisions,
    so the gate is boundary agreement, not bit equality."""
    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.utils.metrics import boundary_f1

    cfg = HubertConfig(num_hidden_layers=1, hidden_size=32,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4, precision="default")
    seg = Segmenter(hubert_config=cfg)

    rng = np.random.RandomState(7)
    t = np.arange(16000 * 13) / 16000.0
    f0 = 130 + 25 * np.sin(2 * np.pi * 0.9 * t)
    env = np.clip(np.sin(2 * np.pi * 3.7 * t), 0, None)
    gate = (np.sin(2 * np.pi * 0.5 * t) > -0.3).astype(float)
    wav = (np.sin(2 * np.pi * f0 * t) * env * gate
           + 0.01 * rng.randn(len(t))).astype(np.float32)

    kw = dict(wav=wav, in_second=False, norm_threshold=1.0,
              merge_threshold=0.9, return_hidden=False)
    out_res = LongFormSegmenter(seg, chunk_seconds=4.0, overlap_seconds=1.0,
                                batch_windows=2, transfer="int16")(**kw)
    out_f32 = LongFormSegmenter(seg, chunk_seconds=4.0, overlap_seconds=1.0,
                                batch_windows=2, transfer="float32")(**kw)

    a, b = out_res["segments"], out_f32["segments"]
    assert len(a) and len(b)
    f1 = boundary_f1(a, b, tol_frames=0)
    assert f1 > 0.9, (f1, a[:5], b[:5])
    # same audio span covered
    assert abs(int(a[-1][1]) - int(b[-1][1])) <= 2


def test_resident_path_handles_short_tail_window():
    """Last window shorter than chunk + a wav not divisible by the frame."""
    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig

    cfg = HubertConfig(num_hidden_layers=1, hidden_size=32,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4, precision="default")
    seg = Segmenter(hubert_config=cfg)
    lf = LongFormSegmenter(seg, chunk_seconds=4.0, overlap_seconds=1.0,
                           batch_windows=2)
    rng = np.random.RandomState(9)
    wav = rng.randn(16000 * 9 + 137).astype(np.float32)
    out = lf(wav=wav, in_second=False, norm_threshold=1.0,
             merge_threshold=0.9, return_hidden=False)
    segs = out["segments"]
    if len(segs):
        assert (segs[:, 1] > segs[:, 0]).all()
        assert segs[-1][1] <= len(wav) // 320
        assert len(out["segment_features"]) == len(segs)

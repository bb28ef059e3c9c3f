"""SegmenterServer micro-batching engine (sylber_tpu/serve.py).

Two layers of coverage:
- transport/batching logic against a deterministic fake segmenter (exact
  routing equality, batching stats, drain/stop, option isolation) — immune
  to XLA cross-program float rounding;
- integration against a tiny real Segmenter where the same (batch, length)
  program runs on both sides, so results are bit-exact.
"""

import threading
import time

import numpy as np
import pytest

from sylber_tpu.api import Segmenter
from sylber_tpu.models.hubert import HubertConfig
from sylber_tpu.serve import SegmenterServer


class FakeSegmenter:
    """Deterministic pure-numpy stand-in recording batch compositions."""

    batch_buckets = (1, 2, 4, 8)

    def __init__(self, delay_s=0.0, fail_on=None):
        self.batches = []
        self.delay_s = delay_s
        self.fail_on = fail_on  # wav length that triggers an exception
        self.lock = threading.Lock()

    def process(self, wavs, in_second=True, norm_threshold=None,
                merge_threshold=None, return_hidden=True):
        with self.lock:
            self.batches.append(len(wavs))
        if self.delay_s:
            time.sleep(self.delay_s)
        outs = []
        for w in wavs:
            if self.fail_on is not None and len(w) == self.fail_on:
                raise RuntimeError("boom")
            n = len(w)
            seg = np.array([[0, n]], float)
            outs.append({
                "segments": seg / 50.0 if in_second else seg,
                # fingerprint of the exact wav + options: proves routing
                "segment_features": np.array([
                    [float(w.sum()), float(n),
                     -1.0 if norm_threshold is None else norm_threshold,
                     -1.0 if merge_threshold is None else merge_threshold]]),
                "frame_norms": np.zeros(4),
            })
        return outs


def wavs_for(n, rng, lo=4000, hi=12000):
    return [rng.randn(rng.randint(lo, hi)).astype(np.float32)
            for _ in range(n)]


# ---- transport/batching logic (fake model) -----------------------------

def test_concurrent_submissions_batch_and_route_exactly():
    fake = FakeSegmenter(delay_s=0.01)
    rng = np.random.RandomState(1)
    wavs = wavs_for(24, rng)
    with SegmenterServer(fake, max_batch=8, max_wait_ms=40.0) as srv:
        futs = [None] * len(wavs)

        def client(i):
            futs[i] = srv.submit(wavs[i], norm_threshold=1.5)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(wavs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        outs = [f.result(timeout=60) for f in futs]
        st = srv.stats()
    for w, o in zip(wavs, outs):
        # each future got exactly its own utterance's result
        np.testing.assert_allclose(
            o["segment_features"][0],
            [w.sum(), len(w), 1.5, -1.0], rtol=1e-6)
    assert st.completed == len(wavs)
    assert st.batches < st.requests          # micro-batching happened
    assert max(fake.batches) > 1
    assert max(fake.batches) <= 8
    assert st.mean_batch_size > 1.0
    assert st.latency_p95_ms > 0.0


def test_incompatible_options_do_not_mix():
    fake = FakeSegmenter(delay_s=0.01)
    rng = np.random.RandomState(2)
    w = wavs_for(1, rng)[0]
    with SegmenterServer(fake, max_wait_ms=50.0) as srv:
        fa = srv.submit(w, merge_threshold=0.3)
        fb = srv.submit(w, merge_threshold=0.95)
        a, b = fa.result(60), fb.result(60)
    assert a["segment_features"][0][3] == 0.3
    assert b["segment_features"][0][3] == 0.95
    # different option keys => never in the same process() call
    assert fake.batches.count(2) == 0


def test_failed_batch_fails_only_its_requests():
    rng = np.random.RandomState(3)
    good = wavs_for(3, rng, lo=4000, hi=5000)
    bad = rng.randn(7777).astype(np.float32)
    fake = FakeSegmenter(fail_on=7777)
    with SegmenterServer(fake, max_batch=2, max_wait_ms=5.0) as srv:
        fb = srv.submit(bad, norm_threshold=9.0)  # own key -> own batch
        fgs = [srv.submit(w) for w in good]
        with pytest.raises(RuntimeError, match="boom"):
            fb.result(60)
        for f in fgs:
            assert f.result(60) is not None  # server survived
        st = srv.stats()
    assert st.failed == 1 and st.completed == 3


def test_stop_drains_queue():
    fake = FakeSegmenter(delay_s=0.02)
    rng = np.random.RandomState(4)
    wavs = wavs_for(6, rng)
    srv = SegmenterServer(fake, max_batch=4, max_wait_ms=200.0)
    futs = [srv.submit(w) for w in wavs]
    srv.stop(drain=True)
    for f in futs:
        assert f.result(timeout=60) is not None
    with pytest.raises(RuntimeError):
        srv.submit(wavs[0])


def test_bad_request_rejected_eagerly():
    fake = FakeSegmenter()
    with SegmenterServer(fake, max_wait_ms=1.0) as srv:
        with pytest.raises(ValueError):
            srv.submit(np.zeros(10, np.float32))  # < 1 receptive field
        assert srv.segment(np.zeros(4000, np.float32)) is not None


def test_latency_bounded_at_low_load():
    """A lone request must not wait for a full batch: deadline dispatch."""
    fake = FakeSegmenter()
    with SegmenterServer(fake, max_batch=8, max_wait_ms=20.0) as srv:
        t0 = time.monotonic()
        srv.segment(np.zeros(4000, np.float32))
        dt_ms = (time.monotonic() - t0) * 1e3
    # guard against wait-for-full-batch bugs (those hang >=200 ms windows
    # forever); generous bound for slow CI hosts
    assert dt_ms < 5000.0


# ---- integration with the real Segmenter (same-program, bit-exact) -----

@pytest.fixture(scope="module")
def seg():
    cfg = HubertConfig(
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(32,) * 7,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    return Segmenter(hubert_config=cfg, length_bucket_s=0.5,
                     batch_buckets=(1, 2, 4, 8))


def test_single_request_matches_direct_bitexact(seg):
    rng = np.random.RandomState(0)
    w = wavs_for(1, rng)[0]
    direct = seg.process([w], return_hidden=False)[0]
    with SegmenterServer(seg, max_wait_ms=1.0) as srv:
        out = srv.segment(w)
    np.testing.assert_array_equal(out["segments"], direct["segments"])
    np.testing.assert_array_equal(out["segment_features"],
                                  direct["segment_features"])
    assert "hidden_states" not in out  # serving default skips hidden fetch


def test_real_batch_matches_direct_batch(seg):
    """Same batch composition on both sides -> identical program -> exact."""
    rng = np.random.RandomState(7)
    wavs = wavs_for(4, rng, lo=4000, hi=7000)
    direct = seg.process(list(wavs), return_hidden=False)
    with SegmenterServer(seg, max_batch=4, max_wait_ms=500.0) as srv:
        futs = srv.submit_many(wavs)
        outs = [f.result(60) for f in futs]
        st = srv.stats()
    assert st.batches == 1  # all four coalesced into one program call
    # server sorts by length; map back by length fingerprint
    direct_by_len = {len(w): d for w, d in zip(wavs, direct)}
    for w, o in zip(wavs, outs):
        d = direct_by_len[len(w)]
        np.testing.assert_array_equal(o["segments"], d["segments"])
        np.testing.assert_array_equal(o["segment_features"],
                                      d["segment_features"])


def test_in_second_toggle(seg):
    rng = np.random.RandomState(5)
    w = wavs_for(1, rng)[0]
    with SegmenterServer(seg, max_wait_ms=1.0) as srv:
        sec = srv.segment(w, in_second=True)
        frames = srv.segment(w, in_second=False)
    if len(sec["segments"]):
        np.testing.assert_allclose(np.asarray(sec["segments"]) * 50.0,
                                   np.asarray(frames["segments"]), atol=1e-6)


def test_pipelined_mode_routes_exactly():
    """pipeline_depth > 0 (opt-in: measured slower over the serialized
    axon tunnel, genuine overlap on real hosts) must preserve exact
    request->result routing, stats, and failure isolation."""
    fake = FakeSegmenter(delay_s=0.005)
    rng = np.random.RandomState(5)
    wavs = wavs_for(24, rng)
    with SegmenterServer(fake, max_batch=8, max_wait_ms=20.0,
                         pipeline_depth=2) as srv:
        futs = [srv.submit(w, norm_threshold=2.5) for w in wavs]
        outs = [f.result(timeout=60) for f in futs]
        st = srv.stats()
    for w, o in zip(wavs, outs):
        np.testing.assert_allclose(
            o["segment_features"][0],
            [w.sum(), len(w), 2.5, -1.0], rtol=1e-6)
    assert st.completed == len(wavs)

    # failure isolation still per-batch through the finalizer thread
    bad = FakeSegmenter(fail_on=7777)
    with SegmenterServer(bad, max_batch=4, max_wait_ms=5.0,
                         pipeline_depth=1) as srv:
        ok = srv.submit(np.ones(5000, np.float32))
        assert ok.result(timeout=60)["segments"] is not None  # own batch
        boom = srv.submit(np.ones(7777, np.float32))
        with pytest.raises(RuntimeError):
            boom.result(timeout=60)
        ok2 = srv.submit(np.ones(5000, np.float32))  # keeps serving
        assert ok2.result(timeout=60)["segments"] is not None

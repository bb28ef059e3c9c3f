"""Streaming segmenter + tokenizer API tests (tiny model)."""

import numpy as np
import pytest

from sylber_tpu.api import Segmenter
from sylber_tpu.models.hubert import HubertConfig

TINY = HubertConfig(num_hidden_layers=1, hidden_size=32,
                    num_attention_heads=4, intermediate_size=64,
                    conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                    num_conv_pos_embedding_groups=4, precision="default")


@pytest.fixture(scope="module")
def seg():
    return Segmenter(hubert_config=TINY)


def test_streaming_commits_ordered_nonoverlapping(seg):
    from sylber_tpu.streaming import StreamingSegmenter

    st = StreamingSegmenter(seg, window_seconds=3.0, hop_seconds=1.0,
                            commit_guard_seconds=0.5)
    rng = np.random.RandomState(0)
    wav = rng.randn(16000 * 10).astype(np.float32)
    committed = []
    i = 0
    while i < len(wav):
        n = int(rng.randint(1000, 30000))
        committed.extend(st.push(wav[i:i + n], in_second=False,
                                 norm_threshold=1.0, merge_threshold=0.9))
        i += n
    committed.extend(st.flush(in_second=False, norm_threshold=1.0,
                              merge_threshold=0.9))
    assert committed, "no segments emitted"
    arr = np.asarray(committed)
    assert (arr[:, 1] > arr[:, 0]).all()
    assert (arr[1:, 0] >= arr[:-1, 1]).all()        # ordered, non-overlapping
    assert arr[-1, 1] <= len(wav) // 320
    # coverage: committed segments span most of the (all-voiced-ish) stream
    covered = (arr[:, 1] - arr[:, 0]).sum()
    assert covered > 0.5 * (len(wav) // 320)


def test_streaming_deterministic_vs_chunking(seg):
    """Same audio, different chunk sizes -> identical committed segments
    (inference windows are aligned to hop boundaries, not chunk arrivals)."""
    from sylber_tpu.streaming import StreamingSegmenter

    rng = np.random.RandomState(1)
    wav = rng.randn(16000 * 6).astype(np.float32)

    def run(chunks):
        st = StreamingSegmenter(seg, window_seconds=2.0, hop_seconds=1.0)
        out = []
        i = 0
        for c in chunks:
            out.extend(st.push(wav[i:i + c], in_second=False,
                               norm_threshold=1.0, merge_threshold=0.9))
            i += c
        out.extend(st.flush(in_second=False, norm_threshold=1.0,
                            merge_threshold=0.9))
        return out

    a = run([16000] * 6)
    b = run([7000, 25000, 3000, 16000, 45000])
    assert a == b


def test_tokenizer_roundtrip(seg):
    from sylber_tpu.tokenizer import SylberTokenizer

    rng = np.random.RandomState(2)
    centroids = rng.randn(64, 32).astype(np.float32)
    tok = SylberTokenizer(seg, centroids=centroids)
    wav = rng.randn(16000).astype(np.float32)
    # thresholds via segmenter defaults; use explicit call for determinism
    seg.norm_threshold, seg.merge_threshold = 1.0, 0.9
    out = tok(wav=wav)
    assert len(out["tokens"]) == len(out["segments"]) == len(out["durations"])
    if len(out["tokens"]):
        feats = tok.decode(out["tokens"])
        assert feats.shape == (len(out["tokens"]), 32)
        np.testing.assert_allclose(feats, centroids[out["tokens"]])

"""Native (C++) segmenter vs numpy oracle."""

import shutil

import numpy as np
import pytest

from sylber_tpu.ops.segment_np import segment_oracle

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _states(rng, L=200, d=48):
    states = np.zeros((L, d), np.float32)
    i = 0
    while i < L:
        span = min(int(rng.randint(2, 14)), L - i)
        if rng.rand() < 0.25:
            states[i:i + span] = rng.randn(span, d) * 0.05
        else:
            proto = rng.randn(d)
            proto = proto / np.linalg.norm(proto) * rng.uniform(4, 9)
            states[i:i + span] = proto + rng.randn(span, d) * 0.15
        i += span
    return states


def test_native_matches_oracle():
    from sylber_tpu.utils.native import NativeUnavailable, segment_native

    rng = np.random.RandomState(0)
    try:
        for trial in range(15):
            st = _states(rng, L=int(rng.randint(20, 300)))
            nt = float(rng.uniform(1.5, 3.5))
            mt = float(rng.uniform(0.5, 0.95))
            want = segment_oracle(st, nt, mt)
            got = segment_native(st, nt, mt)
            assert got.tolist() == want.tolist(), (trial, nt, mt)
    except NativeUnavailable as e:
        pytest.skip(str(e))


def test_native_batch():
    from sylber_tpu.utils.native import NativeUnavailable, segment_native_batch

    rng = np.random.RandomState(1)
    try:
        batch = np.stack([_states(rng, L=120) for _ in range(4)])
        outs = segment_native_batch(batch, 2.0, 0.8)
        for b in range(4):
            want = segment_oracle(batch[b], 2.0, 0.8)
            assert outs[b].tolist() == want.tolist()
    except NativeUnavailable as e:
        pytest.skip(str(e))

"""Segmentation parity: numpy oracle vs reference, XLA scan vs oracle."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from sylber_tpu.ops.segment_np import segment_oracle, pool_segment_features
from sylber_tpu.ops.segment import segment_batch, averaged_target_fill

REF = "/root/reference"


def synthetic_states(rng, L=240, d=64, n_syll=10, silence_prob=0.25,
                     noise=0.15, sil_scale=0.05):
    """Piecewise-constant-ish frame features resembling sylber outputs:
    syllable plateaus with small noise, low-norm silence gaps."""
    states = np.zeros((L, d), np.float32)
    i = 0
    while i < L:
        span = int(rng.randint(2, 14))
        span = min(span, L - i)
        if rng.rand() < silence_prob:
            states[i:i + span] = rng.randn(span, d) * sil_scale
        else:
            proto = rng.randn(d)
            proto = proto / np.linalg.norm(proto) * rng.uniform(4.0, 9.0)
            states[i:i + span] = proto + rng.randn(span, d) * noise
        i += span
    return states.astype(np.float32)


def _load_ref_get_segment():
    """Load the reference module file directly (its package __init__ pulls in
    unavailable deps like torchaudio)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_segment_utils", os.path.join(REF, "sylber/utils/segment_utils.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_segment


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_oracle_matches_reference_exactly():
    ref_get_segment = _load_ref_get_segment()

    rng = np.random.RandomState(0)
    for trial in range(20):
        states = synthetic_states(rng, L=int(rng.randint(30, 300)))
        nt = float(rng.uniform(1.5, 3.5))
        mt = float(rng.uniform(0.5, 0.95))
        ref = ref_get_segment(states.copy(), nt, mt)
        ours = segment_oracle(states, nt, mt)
        assert ref.reshape(-1, 2).tolist() == ours.tolist(), (
            f"trial {trial}: nt={nt} mt={mt}"
        )


def _edge_cases():
    d = 16
    z = np.zeros((5, d), np.float32)
    one = np.ones((1, d), np.float32) * 3
    plateau = np.tile(np.ones(d, np.float32) * 2, (7, 1))
    flip = np.concatenate([np.tile([5.0] + [0.0] * (d - 1), (4, 1)),
                           np.tile([0.0, 5.0] + [0.0] * (d - 2), (4, 1))]
                          ).astype(np.float32)
    return {
        "all_silence": z,
        "single_frame": one,
        "plateau_to_eof": plateau,
        "hard_boundary": flip,
        "silence_then_voice": np.concatenate([z, plateau]),
        "voice_then_silence": np.concatenate([plateau, z]),
    }


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_oracle_matches_reference_edges():
    ref_get_segment = _load_ref_get_segment()

    for name, states in _edge_cases().items():
        ref = np.asarray(ref_get_segment(states.copy(), 1.0, 0.8)).reshape(-1, 2)
        ours = segment_oracle(states, 1.0, 0.8)
        assert ref.tolist() == ours.tolist(), name


def test_scan_matches_oracle_random():
    rng = np.random.RandomState(1)
    for trial in range(12):
        L = int(rng.randint(20, 200))
        states = synthetic_states(rng, L=L)
        nt = float(rng.uniform(1.5, 3.5))
        mt = float(rng.uniform(0.5, 0.95))
        want = segment_oracle(states, nt, mt)
        res = segment_batch(jnp.asarray(states)[None], nt, mt)
        n = int(res.num_segments[0])
        got = np.asarray(res.segments[0][:n])
        assert got.tolist() == want.tolist(), f"trial {trial} nt={nt} mt={mt}"
        # pooled features
        feats = np.asarray(res.features[0][:n])
        want_feats = pool_segment_features(states, want)
        np.testing.assert_allclose(feats, want_feats, atol=2e-4, rtol=1e-4)


def test_scan_matches_oracle_edges():
    for name, states in _edge_cases().items():
        want = segment_oracle(states, 1.0, 0.8)
        res = segment_batch(jnp.asarray(states)[None], 1.0, 0.8)
        n = int(res.num_segments[0])
        got = np.asarray(res.segments[0][:n])
        assert got.tolist() == want.tolist(), name


def test_scan_batched_equals_per_item():
    rng = np.random.RandomState(2)
    items = [synthetic_states(rng, L=150) for _ in range(4)]
    batch = np.stack(items)
    res_b = segment_batch(jnp.asarray(batch), 2.0, 0.8)
    for i, st in enumerate(items):
        res_1 = segment_batch(jnp.asarray(st)[None], 2.0, 0.8)
        n_b, n_1 = int(res_b.num_segments[i]), int(res_1.num_segments[0])
        assert n_b == n_1
        assert np.asarray(res_b.segments[i][:n_b]).tolist() == \
            np.asarray(res_1.segments[0][:n_1]).tolist()


def test_frame_valid_masks_padding():
    rng = np.random.RandomState(3)
    st = synthetic_states(rng, L=100)
    padded = np.concatenate([st, rng.randn(40, st.shape[1]).astype(np.float32) * 5])
    valid = np.zeros(140, bool)
    valid[:100] = True
    res_m = segment_batch(jnp.asarray(padded)[None], 2.0, 0.8,
                          frame_valid=jnp.asarray(valid)[None])
    res_u = segment_batch(jnp.asarray(st)[None], 2.0, 0.8)
    n_m, n_u = int(res_m.num_segments[0]), int(res_u.num_segments[0])
    assert n_m == n_u
    assert np.asarray(res_m.segments[0][:n_m]).tolist() == \
        np.asarray(res_u.segments[0][:n_u]).tolist()


def test_averaged_target_fill():
    rng = np.random.RandomState(4)
    st = synthetic_states(rng, L=80)
    res = segment_batch(jnp.asarray(st)[None], 2.0, 0.8)
    filled = np.asarray(
        averaged_target_fill(jnp.asarray(st)[None], res.segments,
                             res.num_segments)[0]
    )
    n = int(res.num_segments[0])
    segs = np.asarray(res.segments[0][:n])
    want = np.zeros_like(st)
    for s, e in segs:
        want[s:e] = st[s:e].mean(0)
    np.testing.assert_allclose(filled, want, atol=2e-4, rtol=1e-4)


def test_scan_matches_oracle_adversarial():
    """Fuzz with adversarial structure: exact-threshold norms, repeated
    identical frames (cos == 1 ties), zero frames, alternating silence."""
    rng = np.random.RandomState(42)
    d = 24
    for trial in range(20):
        L = int(rng.randint(8, 120))
        kind = trial % 5
        if kind == 0:
            # norms very close to the threshold (1e-4 margin: exact-ulp ties
            # are out of contract — numpy's pairwise summation and XLA's
            # reduction order legitimately differ in the last ulp)
            proto = rng.randn(d).astype(np.float32)
            proto = proto / np.sqrt((proto ** 2).sum() + 1e-8) * 2.0
            states = np.tile(proto, (L, 1))
            states[rng.rand(L) < 0.3] *= 0.01
            nt = float(np.sqrt((proto ** 2).sum() + 1e-8)) - 1e-4
        elif kind == 1:
            # identical repeated frames: running-mean sim exactly 1.0
            proto = rng.randn(d).astype(np.float32) * 3
            states = np.tile(proto, (L, 1))
            nt = 1.0
        elif kind == 2:
            # hard alternation every frame
            a, b = rng.randn(2, d).astype(np.float32) * 5
            states = np.stack([a if i % 2 == 0 else b for i in range(L)])
            nt = 1.0
        elif kind == 3:
            # zeros interleaved with strong frames
            states = rng.randn(L, d).astype(np.float32) * 4
            states[::3] = 0.0
            nt = 1.0
        else:
            # tiny everything (all below threshold)
            states = rng.randn(L, d).astype(np.float32) * 1e-3
            nt = 1.0
        # mt=1.0 on identical frames is a pure last-ulp tie (cos == 1.0
        # exactly in math); practical thresholds are <= 0.99
        for mt in (0.5, 0.8, 0.99):
            want = segment_oracle(states, nt, mt)
            res = segment_batch(jnp.asarray(states)[None], nt, mt)
            got = np.asarray(res.segments[0][: int(res.num_segments[0])])
            assert got.tolist() == want.tolist(), (trial, kind, mt)

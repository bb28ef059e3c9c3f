"""XLA-compilable syllable segmentation (batched `lax.scan` / `fori_loop`).

Device-side re-expression of the reference's serial-numpy two-pass algorithm
(`/root/reference/sylber/utils/segment_utils.py:72-131`; oracle:
:mod:`sylber_tpu.ops.segment_np`). This removes the reference's per-step
device->host sync (`/root/reference/sylber/model/sylber.py:125-126` copies
hidden states to CPU and loops in numpy) — segmentation, boundary refinement
and segment mean-pooling all stay on the TPU inside one jitted program.

Design:
- Pass 1 is a ``lax.scan`` over frames, vectorized over the batch. The carry
  holds the running segment mean, the carried frame count (including the
  reference's count-carry quirk), open-segment start, and write cursors into
  fixed-size ``(MAX_SEGS, 2)`` buffers.
- Pass 2 is a ``lax.fori_loop`` over recorded mid boundaries (bounded by the
  *observed* max count, a traced value) carrying the segment buffer. Segment
  means come from a prefix-sum of the states; the boundary sweep is computed
  for all frames at once via masked cumulative sums of the two cosine
  similarity profiles, then a first-argmax inside the window.
- Merged segments are compacted order-preservingly with a scatter.

Shapes are static: ``MAX_SEGS = L + 1``. All arithmetic is fp32; epsilons
match the reference (1e-8 inside each norm).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SegmentResult(NamedTuple):
    segments: jnp.ndarray       # (B, MAX_SEGS, 2) int32, [start, end) frames
    num_segments: jnp.ndarray   # (B,) int32
    features: jnp.ndarray       # (B, MAX_SEGS, d) float32 mean-pooled states
    norms: jnp.ndarray          # (B, L) float32 frame norms


def frame_norms(states: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt((states.astype(jnp.float32) ** 2).sum(-1) + 1e-8)


def _vec_norm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt((x ** 2).sum(-1) + 1e-8)


def _pass1(states, voiced, merge_threshold):
    """Greedy merge scan. The scan carries only the small running state
    (mean, count, start) and emits per-frame *events*; segment/boundary
    buffers are built afterwards with one vectorized scatter. Keeping the
    (B, MAX_SEGS, 2) buffers out of the scan carry removes per-step
    double-buffer traffic."""
    B, L, d = states.shape
    MS = L + 1
    bidx = jnp.arange(B)

    def step(carry, inp):
        curr, cnt, start = carry
        x, v, i = inp

        sim = (curr * x).sum(-1) / _vec_norm(curr) / _vec_norm(x)
        is_open = start > -1
        is_first = cnt == 0
        merge = sim >= merge_threshold

        close_sil = (~v) & is_open
        boundary = v & (~is_first) & (~merge)
        write_seg = close_sil | boundary

        merged_mean = (curr * cnt[:, None] + x) / (cnt[:, None] + 1.0)
        new_curr = jnp.where(
            v[:, None],
            jnp.where((merge & ~is_first)[:, None], merged_mean, x),
            0.0,
        )
        new_cnt = jnp.where(v, jnp.where(is_first, 1.0, cnt + 1.0), 0.0)
        new_start = jnp.where(
            v,
            jnp.where(is_first | boundary, jnp.full_like(start, i), start),
            jnp.full_like(start, -1),
        )
        # events: a segment [start, i) closes here; is it a mid boundary?
        return (new_curr, new_cnt, new_start), (write_seg, boundary, start)

    init = (
        jnp.zeros((B, d), jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.full((B,), -1, jnp.int32),
    )
    xs = (
        jnp.swapaxes(states, 0, 1),                # (L, B, d)
        jnp.swapaxes(voiced, 0, 1),                # (L, B)
        jnp.arange(L, dtype=jnp.int32),
    )
    (curr, cnt, start), (close, boundary, seg_start) = jax.lax.scan(
        step, init, xs
    )
    close = jnp.swapaxes(close, 0, 1)              # (B, L)
    boundary = jnp.swapaxes(boundary, 0, 1)
    seg_start = jnp.swapaxes(seg_start, 0, 1)

    # scatter events into fixed-size buffers
    t = jnp.arange(L, dtype=jnp.int32)[None, :]
    pos = jnp.cumsum(close, axis=1) - 1            # segment index per close
    dest = jnp.where(close, pos, MS)               # out-of-bounds -> dropped
    segs = jnp.zeros((B, MS, 2), jnp.int32)
    seg_val = jnp.stack([seg_start, jnp.broadcast_to(t, (B, L))], -1)
    segs = segs.at[bidx[:, None], dest].set(seg_val, mode="drop")
    nseg = close.sum(axis=1).astype(jnp.int32)

    mpos = jnp.cumsum(boundary, axis=1) - 1
    mdest = jnp.where(boundary, mpos, MS)
    mids = jnp.zeros((B, MS, 2), jnp.int32)
    mid_val = jnp.stack([jnp.broadcast_to(t, (B, L)), pos], -1)
    mids = mids.at[bidx[:, None], mdest].set(mid_val, mode="drop")
    nmid = boundary.sum(axis=1).astype(jnp.int32)

    # close the trailing open segment as [start, L)
    trailing = start > -1
    seg_val = jnp.stack([start, jnp.full_like(start, L)], -1)
    old_seg = segs[bidx, nseg]
    segs = segs.at[bidx, nseg].set(jnp.where(trailing[:, None], seg_val, old_seg))
    nseg = nseg + trailing.astype(jnp.int32)
    return segs, nseg, mids, nmid


def _pass2(states, norms, segs, nseg, mids, nmid, merge_threshold):
    B, L, d = states.shape
    MS = segs.shape[1]
    bidx = jnp.arange(B)
    # prefix sums for O(1) segment means: P[:, t] = sum(states[:, :t])
    P = jnp.concatenate(
        [jnp.zeros((B, 1, d), jnp.float32), jnp.cumsum(states, axis=1)], axis=1
    )
    u = jnp.arange(L, dtype=jnp.int32)[None, :]

    def body(j, carry):
        segs, alive = carry
        bd = mids[:, j, 0]
        gi = mids[:, j, 1]
        gi = jnp.clip(gi, 0, MS - 2)
        active = (j < nmid) & (mids[:, j, 1] < nseg - 1)

        a = segs[bidx, gi]
        b = segs[bidx, gi + 1]
        a0, a1 = a[:, 0], a[:, 1]
        b0, b1 = b[:, 0], b[:, 1]
        len_a = jnp.maximum(a1 - a0, 1)
        len_b = jnp.maximum(b1 - b0, 1)
        mean_a = (P[bidx, a1] - P[bidx, a0]) / len_a[:, None].astype(jnp.float32)
        mean_b = (P[bidx, b1] - P[bidx, b0]) / len_b[:, None].astype(jnp.float32)
        sim_ab = (mean_a * mean_b).sum(-1) / _vec_norm(mean_a) / _vec_norm(mean_b)

        do_merge = active & (sim_ab >= merge_threshold)
        do_sweep = active & ~do_merge

        # boundary sweep window [ws, we)
        ws = jnp.maximum(a0, bd - jnp.maximum(1, (a1 - a0) // 2))
        we = jnp.minimum(b1, bd + jnp.maximum(1, (b1 - b0) // 2))
        cp = jnp.einsum("bld,bd->bl", states, mean_a,
                        precision="highest") / (norms * _vec_norm(mean_a)[:, None])
        cn = jnp.einsum("bld,bd->bl", states, mean_b,
                        precision="highest") / (norms * _vec_norm(mean_b)[:, None])
        inw = (u >= ws[:, None]) & (u < we[:, None])
        CP = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32),
             jnp.cumsum(jnp.where(inw, cp, 0.0), axis=1)], axis=1)
        CN = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32),
             jnp.cumsum(jnp.where(inw, cn, 0.0), axis=1)], axis=1)
        # score(t) = sum_{ws<=uu<t} cp[uu] + sum_{t<=uu<we} cn[uu]
        score = (CP[:, :L] - CP[bidx, ws][:, None]) \
            + (CN[bidx, we][:, None] - CN[:, :L])
        score = jnp.where(inw, score, -jnp.inf)
        opt = jnp.argmax(score, axis=1).astype(jnp.int32)

        new_a = jnp.where(do_sweep[:, None], jnp.stack([a0, opt], -1), a)
        new_b = jnp.where(
            do_merge[:, None],
            jnp.stack([a0, b1], -1),
            jnp.where(do_sweep[:, None], jnp.stack([opt, b1], -1), b),
        )
        segs = segs.at[bidx, gi].set(new_a)
        segs = segs.at[bidx, gi + 1].set(new_b)
        alive = alive.at[bidx, gi].set(
            jnp.where(do_merge, False, alive[bidx, gi])
        )
        return segs, alive

    alive = jnp.ones((B, MS), bool)
    upper = jnp.max(nmid)
    segs, alive = jax.lax.fori_loop(0, upper, body, (segs, alive))
    return segs, alive


def _compact(segs, nseg, alive):
    B, MS, _ = segs.shape
    bidx = jnp.arange(B)
    valid = alive & (jnp.arange(MS)[None, :] < nseg[:, None])
    pos = jnp.cumsum(valid, axis=1) - 1
    dest = jnp.where(valid, pos, MS)  # out-of-bounds -> dropped
    out = jnp.zeros_like(segs)
    out = out.at[bidx[:, None], dest].set(segs, mode="drop")
    return out, valid.sum(axis=1).astype(jnp.int32)


def segment_batch(
    states: jnp.ndarray,
    norm_threshold,
    merge_threshold,
    frame_valid: Optional[jnp.ndarray] = None,
    norms: Optional[jnp.ndarray] = None,
) -> SegmentResult:
    """Segment a batch of frame features.

    Args:
      states: (B, L, d) float hidden states.
      norm_threshold / merge_threshold: scalars (traced OK).
      frame_valid: optional (B, L) bool; frames marked False are treated as
        silence. The reference instead runs the algorithm over padded frames
        (`sylber.py:126`), which can emit spurious segments in the padding —
        masking here makes batched results equal single-utterance results.
      norms: optional precomputed frame norms.

    Returns `SegmentResult` with compacted, order-preserved segments.
    """
    states = states.astype(jnp.float32)
    if norms is None:
        norms = frame_norms(states)
    voiced = norms >= norm_threshold
    if frame_valid is not None:
        voiced = voiced & frame_valid

    segs, nseg, mids, nmid = _pass1(states, voiced, merge_threshold)
    segs, alive = _pass2(states, norms, segs, nseg, mids, nmid, merge_threshold)
    segs, n = _compact(segs, nseg, alive)

    # mean-pool hidden states over each [s, e) (reference sylber.py:133)
    B, L, d = states.shape
    MS = segs.shape[1]
    P = jnp.concatenate(
        [jnp.zeros((B, 1, d), jnp.float32), jnp.cumsum(states, axis=1)], axis=1
    )
    bidx = jnp.arange(B)[:, None]
    s, e = segs[..., 0], segs[..., 1]
    length = jnp.maximum(e - s, 1).astype(jnp.float32)
    feats = (P[bidx, e] - P[bidx, s]) / length[..., None]
    seg_valid = jnp.arange(MS)[None, :] < n[:, None]
    feats = jnp.where(seg_valid[..., None], feats, 0.0)
    return SegmentResult(segs, n, feats, norms)


def averaged_target_fill(
    states: jnp.ndarray, segments: jnp.ndarray, num_segments: jnp.ndarray
) -> jnp.ndarray:
    """Frame-level tensor where each frame inside segment k holds that
    segment's mean (zeros elsewhere) — the distillation target
    (`/root/reference/sylber/model/sylber.py:313-329`).

    Implemented as a one-hot-free gather: each frame looks up which segment
    covers it (frames outside all segments get 0).
    """
    B, L, d = states.shape
    MS = segments.shape[1]
    P = jnp.concatenate(
        [jnp.zeros((B, 1, d), jnp.float32),
         jnp.cumsum(states.astype(jnp.float32), axis=1)], axis=1
    )
    bidx = jnp.arange(B)[:, None]
    s, e = segments[..., 0], segments[..., 1]
    length = jnp.maximum(e - s, 1).astype(jnp.float32)
    means = (P[bidx, e] - P[bidx, s]) / length[..., None]   # (B, MS, d)
    seg_valid = jnp.arange(MS)[None, :] < num_segments[:, None]

    # frame -> covering segment id (or -1)
    t = jnp.arange(L, dtype=jnp.int32)
    covered = (
        (t[None, None, :] >= s[:, :, None])
        & (t[None, None, :] < e[:, :, None])
        & seg_valid[:, :, None]
    )  # (B, MS, L)
    seg_id = jnp.argmax(covered, axis=1)                      # (B, L)
    any_cov = covered.any(axis=1)                             # (B, L)
    filled = jnp.take_along_axis(
        means, seg_id[..., None].astype(jnp.int32), axis=1
    )
    return jnp.where(any_cov[..., None], filled, 0.0)

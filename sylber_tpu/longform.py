"""Long-form audio segmentation: chunked inference with overlap stitching.

New functionality relative to the reference (BASELINE config #3): the
reference pushes whole padded files through full self-attention — O(L^2) with
no chunking (`/root/reference/sylber/model/sylber.py:99-122`), which is
impractical for 10-minute recordings. Here:

1. the waveform is cut into fixed windows (default 30 s) with overlap
   (default 2 s), each window aligned to the 320-sample frame grid so frame
   indices map exactly onto global frames;
2. windows run through the fused forward+segment program *batched* (windows
   of one recording fill a batch — data-parallel across chips when a mesh is
   used);
3. adjacent windows are stitched at the lowest-energy frame inside the
   overlap (frame norms are already computed on device): each consecutive
   pair picks a cut frame c = argmin over the shared overlap of the mean
   frame norm, segments from the left window are kept/truncated at c, from
   the right window kept/truncated after c, and identical boundaries merge.
4. segment features are re-pooled from the stitched hidden-state track, so
   pooled features are identical to what a single full pass would produce
   for all segments away from cut points.

The per-window frontend overlap also neutralizes conv edge effects: windows
carry 25 ms receptive-field context on both sides and only the interior
frames participate in stitching.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .api import FRAME_RATE, Segmenter

FRAME = 320


class LongFormSegmenter:
    """Chunked segmentation for arbitrarily long audio.

    ``LongFormSegmenter(segmenter)(wav or wav_file, in_second=True)`` returns
    the same dict contract as `Segmenter`.
    """

    def __init__(
        self,
        segmenter: Segmenter,
        chunk_seconds: float = 30.0,
        overlap_seconds: float = 2.0,
        batch_windows: int = 8,
    ) -> None:
        assert overlap_seconds * 2 < chunk_seconds
        self.segmenter = segmenter
        self.chunk_frames = int(chunk_seconds * FRAME_RATE)
        self.overlap_frames = int(overlap_seconds * FRAME_RATE)
        self.batch_windows = batch_windows

    def __call__(self, wav=None, wav_file=None, in_second: bool = True,
                 norm_threshold: Optional[float] = None,
                 merge_threshold: Optional[float] = None) -> Dict:
        if wav_file is not None:
            from .utils.audio import load_for_inference

            wav = load_for_inference(wav_file)
        wav = np.asarray(wav, np.float32).reshape(-1)
        total_frames = max(len(wav) // FRAME - 1, 1)  # conv yields ~L/320 - 1

        step = self.chunk_frames - self.overlap_frames
        starts = list(range(0, max(total_frames - self.overlap_frames, 1), step))

        # one window covers everything -> plain path
        if len(starts) == 1:
            out = self.segmenter(wav=wav, in_second=in_second,
                                 norm_threshold=norm_threshold,
                                 merge_threshold=merge_threshold)
            return out

        # cut windows on the frame grid (samples = frames * 320, padded a bit
        # so the conv frontend yields >= chunk_frames frames)
        windows = []
        for s in starts:
            lo = s * FRAME
            hi = min((s + self.chunk_frames) * FRAME + FRAME, len(wav))
            windows.append(wav[lo:hi])

        results: List[Dict] = []
        for i in range(0, len(windows), self.batch_windows):
            results.extend(self.segmenter.process(
                windows[i: i + self.batch_windows], in_second=False,
                norm_threshold=norm_threshold,
                merge_threshold=merge_threshold))

        hidden, segments = self._stitch(starts, results)
        feats = (np.stack([hidden[s:e].mean(0) for s, e in segments])
                 if len(segments) else np.array([]))
        segments = np.asarray(segments, np.int64).reshape(-1, 2)
        return {
            "segments": segments / FRAME_RATE if in_second else segments,
            "segment_features": feats,
            "hidden_states": hidden,
        }

    def _stitch(self, starts: List[int], results: List[Dict]):
        """Merge per-window (hidden_states, segments) into global tracks."""
        n = len(results)
        hs = [r["hidden_states"] for r in results]
        norms = [np.sqrt((h ** 2).sum(-1) + 1e-8) for h in hs]
        # global segment lists per window
        seg_lists = [np.asarray(r["segments"], np.int64).reshape(-1, 2)
                     + starts[i] for i, r in enumerate(results)]

        # choose cut frames inside each overlap: lowest mean frame norm
        cuts = []
        for i in range(n - 1):
            ov_lo = starts[i + 1]
            ov_hi = min(starts[i] + len(hs[i]), starts[i + 1] + len(hs[i + 1]))
            if ov_hi <= ov_lo:
                cuts.append(ov_lo)
                continue
            a = norms[i][ov_lo - starts[i]: ov_hi - starts[i]]
            b = norms[i + 1][: ov_hi - ov_lo]
            m = min(len(a), len(b))
            cuts.append(ov_lo + int(np.argmin(a[:m] + b[:m])) if m else ov_lo)

        # stitched hidden-state track
        pieces = []
        for i in range(n):
            lo = starts[i] if i == 0 else cuts[i - 1]
            hi = starts[i] + len(hs[i]) if i == n - 1 else cuts[i]
            pieces.append(hs[i][lo - starts[i]: hi - starts[i]])
        hidden = np.concatenate(pieces, axis=0)

        # stitched segments: window i owns [prev_cut, cut_i)
        out: List[List[int]] = []
        for i in range(n):
            lo = -1 if i == 0 else cuts[i - 1]
            hi = np.inf if i == n - 1 else cuts[i]
            for s, e in seg_lists[i]:
                s2, e2 = max(s, lo if lo >= 0 else s), min(e, hi)
                if e2 - s2 <= 0:
                    continue
                if out and out[-1][1] > s2:
                    s2 = out[-1][1]
                    if e2 - s2 <= 0:
                        continue
                out.append([int(s2), int(e2)])
        return hidden, out

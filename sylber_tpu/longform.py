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
   overlap (frame norms come back from the device at (T,) per window): each
   consecutive pair picks a cut frame, segments from the left window are
   kept/truncated at it, from the right window kept/truncated after it;
4. segment features: interior (untruncated) segments reuse the on-device
   pooled features of their window; only segments truncated at a cut are
   re-pooled — in the default fast path from lazily-fetched device slices
   of the window's hidden states, so a 10-minute recording moves kilobytes,
   not the ~90 MB hidden track, over the host link.

``return_hidden=True`` additionally assembles the stitched full hidden-state
track (reference output contract); ``False`` is the fast serving path.

The per-window frontend overlap also neutralizes conv edge effects: windows
carry receptive-field context on both sides.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

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
                 merge_threshold: Optional[float] = None,
                 return_hidden: bool = True) -> Dict:
        if wav_file is not None:
            from .utils.audio import load_for_inference

            wav = load_for_inference(wav_file)
        wav = np.asarray(wav, np.float32).reshape(-1)
        total_frames = max(len(wav) // FRAME - 1, 1)

        step = self.chunk_frames - self.overlap_frames
        starts = list(range(0, max(total_frames - self.overlap_frames, 1), step))

        if len(starts) == 1:
            return self.segmenter(wav=wav, in_second=in_second,
                                  norm_threshold=norm_threshold,
                                  merge_threshold=merge_threshold)

        windows = []
        for s in starts:
            lo = s * FRAME
            hi = min((s + self.chunk_frames) * FRAME + FRAME, len(wav))
            windows.append(wav[lo:hi])

        mode = True if return_hidden else "device"
        results: List[Dict] = []
        for i in range(0, len(windows), self.batch_windows):
            results.extend(self.segmenter.process(
                windows[i: i + self.batch_windows], in_second=False,
                norm_threshold=norm_threshold,
                merge_threshold=merge_threshold,
                return_hidden=mode))

        cuts = self._cuts(starts, results)
        stitched = self._stitch_segments(starts, results, cuts)

        if return_hidden:
            hidden = self._stitch_hidden(starts, results, cuts)
            feats = (np.stack([hidden[s:e].mean(0) for _, s, e, _ in stitched])
                     if stitched else np.array([]))
        else:
            hidden = None
            feats = self._features_fast(starts, results, stitched)

        segments = np.asarray([[s, e] for _, s, e, _ in stitched],
                              np.int64).reshape(-1, 2)
        out = {
            "segments": segments / FRAME_RATE if in_second else segments,
            "segment_features": feats,
        }
        if return_hidden:
            out["hidden_states"] = hidden
        return out

    # ------------------------------------------------------------------

    def _n_frames(self, r: Dict) -> int:
        return len(r["frame_norms"])

    def _cuts(self, starts: List[int], results: List[Dict]) -> List[int]:
        """Cut frame per overlap: lowest combined frame norm."""
        n = len(results)
        cuts = []
        for i in range(n - 1):
            ov_lo = starts[i + 1]
            ov_hi = min(starts[i] + self._n_frames(results[i]),
                        starts[i + 1] + self._n_frames(results[i + 1]))
            if ov_hi <= ov_lo:
                cuts.append(ov_lo)
                continue
            a = results[i]["frame_norms"][ov_lo - starts[i]: ov_hi - starts[i]]
            b = results[i + 1]["frame_norms"][: ov_hi - ov_lo]
            m = min(len(a), len(b))
            cuts.append(ov_lo + int(np.argmin(a[:m] + b[:m])) if m else ov_lo)
        return cuts

    def _stitch_segments(self, starts, results, cuts
                         ) -> List[Tuple[int, int, int, bool]]:
        """-> [(window_idx, start, end, truncated)], global frames."""
        n = len(results)
        out: List[Tuple[int, int, int, bool]] = []
        for i in range(n):
            lo = -1 if i == 0 else cuts[i - 1]
            hi = np.inf if i == n - 1 else cuts[i]
            segs = np.asarray(results[i]["segments"], np.int64).reshape(-1, 2) \
                + starts[i]
            for s, e in segs:
                s2, e2 = max(s, lo if lo >= 0 else s), min(e, hi)
                if e2 - s2 <= 0:
                    continue
                if out and out[-1][2] > s2:
                    s2 = out[-1][2]
                    if e2 - s2 <= 0:
                        continue
                out.append((i, int(s2), int(e2), (s2 != s or e2 != e)))
        return out

    def _stitch_hidden(self, starts, results, cuts) -> np.ndarray:
        n = len(results)
        pieces = []
        for i in range(n):
            h = results[i]["hidden_states"]
            lo = starts[i] if i == 0 else cuts[i - 1]
            hi = starts[i] + len(h) if i == n - 1 else cuts[i]
            pieces.append(h[lo - starts[i]: hi - starts[i]])
        return np.concatenate(pieces, axis=0)

    def _features_fast(self, starts, results, stitched) -> np.ndarray:
        """Window-pooled features for untruncated segments; lazy device-slice
        fetch + re-pool for the few segments clipped at cut points."""
        if not stitched:
            return np.array([])
        feats = []
        for (w, s, e, truncated) in stitched:
            r = results[w]
            if not truncated:
                segs_w = np.asarray(r["segments"], np.int64).reshape(-1, 2) \
                    + starts[w]
                idx = np.where((segs_w[:, 0] == s) & (segs_w[:, 1] == e))[0]
                if len(idx):
                    feats.append(np.asarray(r["segment_features"][idx[0]]))
                    continue
            ls, le = s - starts[w], e - starts[w]
            h = r["hidden_states_device"]
            if hasattr(h, "device"):  # jax array: mean on device, fetch (d,)
                feats.append(np.asarray(h[ls:le].mean(axis=0)))
            else:
                feats.append(np.asarray(h[ls:le]).mean(0))
        return np.stack(feats)

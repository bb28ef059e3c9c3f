"""SylberTokenizer: speech -> discrete syllable tokens -> features.

Ties the Segmenter and the k-means quantizers into the end-user tokenization
surface implied by the reference's 5K/10K/20K-unit variants
(`/root/reference/docs/index.html` results; quantizers at
`sylber/model/quantizer.py`). The reference leaves this glue to the demo
notebook; here it is a first-class API:

    tok = SylberTokenizer(segmenter, centroids="centroids_5k.npy")
    out = tok(wav_file="utt.wav")
    # out["tokens"]: (n,) int ids, out["segments"]: (n, 2) seconds,
    # out["durations"]: (n,) frames
    feats = tok.decode(out["tokens"])       # (n, 768) centroid features
"""

from __future__ import annotations

from typing import Dict, List, Union

import jax.numpy as jnp
import numpy as np

from .api import FRAME_RATE, Segmenter
from .flow.quantizer import KMQuantizer, ResidualKMQuantizer


class SylberTokenizer:
    def __init__(
        self,
        segmenter: Segmenter,
        centroids=None,
        residual_centroids=None,
        normalize: bool = False,
        quantizer=None,
    ) -> None:
        self.segmenter = segmenter
        if quantizer is not None:
            self.quantizer = quantizer
        elif residual_centroids is not None:
            self.quantizer = ResidualKMQuantizer(centroids, residual_centroids,
                                                 normalize=normalize)
        else:
            assert centroids is not None
            self.quantizer = KMQuantizer(centroids, normalize=normalize)

    def __call__(
        self,
        wav_file=None,
        wav=None,
        in_second: bool = True,
    ) -> Union[Dict, List[Dict]]:
        outs = self.segmenter(wav_file=wav_file, wav=wav, in_second=in_second)
        is_batch = isinstance(outs, list)
        results = []
        for o in (outs if is_batch else [outs]):
            feats = o["segment_features"]
            if len(feats):
                tokens = np.asarray(
                    self.quantizer.get_indices(jnp.asarray(feats)))
            else:
                tokens = np.zeros((0,), np.int32)
            segs = o["segments"]
            durations = (np.asarray(segs)
                         * (FRAME_RATE if in_second else 1.0))
            durations = (durations[:, 1] - durations[:, 0]).round().astype(int) \
                if len(segs) else np.zeros((0,), int)
            results.append({
                "tokens": tokens,
                "segments": segs,
                "durations": durations,
                "segment_features": feats,
            })
        return results if is_batch else results[0]

    def decode(self, tokens: np.ndarray) -> np.ndarray:
        """Token ids -> centroid feature vectors (for resynthesis input)."""
        return np.asarray(self.quantizer.decode(jnp.asarray(tokens)))

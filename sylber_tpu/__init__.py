"""sylber_tpu: TPU-native syllabic speech representation framework.

A ground-up JAX/XLA/Pallas rebuild of the Sylber system (self-supervised
syllable segmentation + segment-to-articulation resynthesis). Public surface
mirrors the reference package (`/root/reference/sylber/__init__.py`):

    from sylber_tpu import Segmenter, SegmentSynthesis
"""

from .api import Segmenter

__all__ = ["Segmenter", "Sylber", "SegmentSynthesis", "SylberTokenizer",
           "StreamingSegmenter", "LongFormSegmenter", "SegmenterServer"]
__version__ = "0.1.0"

_LAZY = {
    "SegmentSynthesis": ("sylber_tpu.synthesis", "SegmentSynthesis"),
    "Sylber": ("sylber_tpu.models.sylber", "Sylber"),
    "SylberTokenizer": ("sylber_tpu.tokenizer", "SylberTokenizer"),
    "StreamingSegmenter": ("sylber_tpu.streaming", "StreamingSegmenter"),
    "LongFormSegmenter": ("sylber_tpu.longform", "LongFormSegmenter"),
    "SegmenterServer": ("sylber_tpu.serve", "SegmenterServer"),
}


def __getattr__(name):
    # lazy imports keep `import sylber_tpu` light
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)

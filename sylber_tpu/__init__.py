"""sylber_tpu: TPU-native syllabic speech representation framework.

A ground-up JAX/XLA/Pallas rebuild of the Sylber system (self-supervised
syllable segmentation + segment-to-articulation resynthesis). Public surface
mirrors the reference package (`/root/reference/sylber/__init__.py`):

    from sylber_tpu import Segmenter, SegmentSynthesis
"""

from .api import Segmenter

__all__ = ["Segmenter", "Sylber", "SegmentSynthesis"]
__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports keep `import sylber_tpu` light
    if name == "SegmentSynthesis":
        from .synthesis import SegmentSynthesis

        return SegmentSynthesis
    if name == "Sylber":
        from .models.sylber import Sylber

        return Sylber
    raise AttributeError(name)

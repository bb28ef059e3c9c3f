"""Neural vocoder: articulatory/acoustic features -> waveform (audio-out).

The reference keeps resynthesis-to-audio external (the SPARC
`speech-articulatory-coding` package decodes the 14-dim articulatory
trajectories produced by SegmentSynthesis — `/root/reference/README.md:92-94`,
`demo.ipynb` cell 11). This package completes the pipeline in-framework with
a TPU-native HiFi-GAN:

- :mod:`hifigan`: generator (transposed-conv upsampling + multi-receptive-
  field fusion), multi-period + multi-scale discriminators, GAN/feature-
  matching/mel losses, jitted train step;
- :mod:`mel`: JAX log-mel spectrogram (STFT + Slaney mel filterbank);
- :mod:`sparc`: the articulatory-decoder wrapper matching the demo's decode
  call (pitch statistics handling, speaker embedding conditioning).
"""

from .hifigan import (Generator, HiFiGANConfig, MultiPeriodDiscriminator,
                      MultiScaleDiscriminator)
from .sparc import SparcDecoder, SparcDecoderConfig

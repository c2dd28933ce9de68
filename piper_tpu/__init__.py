"""piper_tpu — a TPU-native neural text-to-speech framework.

A from-scratch JAX/XLA/Pallas implementation of the full VITS
text-to-speech pipeline (text encoder, stochastic duration predictor,
normalizing-flow decoder, HiFiGAN vocoder) with the capabilities of
rhasspy/piper, designed for TPU hardware: NWC layouts, static bucketed
shapes, pjit/mesh parallelism, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    AudioConfig,
    InferenceDefaults,
    ModelConfig,
    SynthesisConfig,
    VoiceConfig,
)

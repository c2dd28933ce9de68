"""piper_tpu — a TPU-native neural text-to-speech framework.

A from-scratch JAX/XLA/Pallas implementation of the full VITS
text-to-speech pipeline (text encoder, stochastic duration predictor,
normalizing-flow decoder, HiFiGAN vocoder) with the capabilities of
rhasspy/piper, designed for TPU hardware: NWC layouts, static bucketed
shapes, pjit/mesh parallelism, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

# Best-effort, as early as possible: CPU-platform processes that will
# use the persistent compilation cache need XLA:CPU codegen capped at
# AVX2 BEFORE jax initializes, or every cache reload logs a spurious
# cpu_aot_loader feature-mismatch error (see
# runtime/cache.py:clean_cpu_aot_flags for the full story). Only
# effective when piper_tpu is imported before jax's backends come up;
# processes that pre-import jax should call clean_cpu_aot_flags()
# themselves at startup (the dryrun/bench entry points do).
import os as _os
import sys as _sys

if (
    "jax" not in _sys.modules
    and _os.environ.get("JAX_PLATFORMS", "").partition(",")[0] == "cpu"
    and "xla_cpu_max_isa" not in _os.environ.get("XLA_FLAGS", "")
):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
    ).strip()

from .config import (  # noqa: F401
    AudioConfig,
    InferenceDefaults,
    ModelConfig,
    SynthesisConfig,
    VoiceConfig,
)

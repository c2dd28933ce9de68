"""Serving runtime: voice loading, bucketed batched synthesis, WAV IO."""

from .voice import TpuVoice  # noqa: F401

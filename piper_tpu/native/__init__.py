"""ctypes bindings for the native host library (csrc/).

Auto-builds csrc/libpiper_tpu_native.so with g++ on first use when a
compiler is available; every entry point has a numpy fallback so the
package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LOGGER = logging.getLogger(__name__)

_CSRC = Path(__file__).parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libpiper_tpu_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() and (_CSRC / "Makefile").exists():
            subprocess.run(
                ["make", "-C", str(_CSRC)], check=True,
                capture_output=True, timeout=120,
            )
        if _LIB_PATH.exists():
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.pt_peak_abs.restype = ctypes.c_float
            lib.pt_peak_abs.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64
            ]
            lib.pt_normalize_to_int16.restype = ctypes.c_float
            lib.pt_normalize_to_int16.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64, ctypes.c_float,
            ]
            lib.pt_chunk_rms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.pt_wav_header.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32
            ]
            _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _LOGGER.debug("native library unavailable: %s", e)
    return _lib


def available() -> bool:
    return _load() is not None


def normalize_to_int16(
    audio: np.ndarray, max_wav_value: float = 32767.0
) -> np.ndarray:
    """Peak-normalize float32 audio to int16 (native, numpy fallback)."""
    audio = np.ascontiguousarray(audio, np.float32)
    lib = _load()
    if lib is None or audio.size == 0:
        peak = float(np.max(np.abs(audio))) if audio.size else 0.0
        scaled = audio * (max_wav_value / max(0.01, peak))
        return np.clip(scaled, -max_wav_value, max_wav_value).astype(np.int16)
    out = np.empty(audio.shape, np.int16)
    lib.pt_normalize_to_int16(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        audio.size,
        ctypes.c_float(max_wav_value),
    )
    return out


def chunk_rms(audio: np.ndarray, chunk: int) -> np.ndarray:
    audio = np.ascontiguousarray(audio, np.float32)
    n_chunks = audio.size // chunk
    lib = _load()
    if lib is None or n_chunks == 0:
        if n_chunks == 0:
            return np.zeros(0, np.float32)
        return np.sqrt(
            np.mean(
                np.square(audio[: n_chunks * chunk].reshape(n_chunks, chunk)),
                axis=1,
            )
        ).astype(np.float32)
    out = np.empty(n_chunks, np.float32)
    lib.pt_chunk_rms(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size, chunk,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_chunks,
    )
    return out


def wav_header(sample_rate: int, num_samples: int) -> bytes:
    lib = _load()
    if lib is None:
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sample_rate)
            f.setnframes(num_samples)
        # wave writes a header for 0 frames; patch sizes
        hdr = bytearray(buf.getvalue()[:44].ljust(44, b"\0"))
        import struct

        data_bytes = num_samples * 2
        struct.pack_into("<I", hdr, 4, 36 + data_bytes)
        struct.pack_into("<I", hdr, 40, data_bytes)
        return bytes(hdr)
    out = np.empty(44, np.uint8)
    lib.pt_wav_header(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sample_rate, num_samples,
    )
    return out.tobytes()

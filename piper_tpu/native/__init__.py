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
# Installed-wheel location: setup.py compiles the library next to this
# module; the csrc/ source-tree location is the development fallback.
_PKG_LIB = Path(__file__).parent / "libpiper_tpu_native.so"
_LIB_PATH = _CSRC / "libpiper_tpu_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _find_lib() -> Optional[Path]:
    if _PKG_LIB.exists():
        return _PKG_LIB
    src = _CSRC / "piper_tpu_native.cpp"
    stale = (
        _LIB_PATH.exists()
        and src.exists()
        and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )
    if (not _LIB_PATH.exists() or stale) and (_CSRC / "Makefile").exists():
        subprocess.run(
            ["make", "-C", str(_CSRC), "clean", "all"], check=True,
            capture_output=True, timeout=120,
        )
    return _LIB_PATH if _LIB_PATH.exists() else None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        lib_path = _find_lib()
        if lib_path is not None:
            lib = ctypes.CDLL(str(lib_path))
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
            for name, argtypes in (
                ("pt_int16_to_float", [
                    ctypes.POINTER(ctypes.c_int16),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64, ctypes.c_float,
                ]),
                ("pt_mulaw_encode", [
                    ctypes.POINTER(ctypes.c_int16),
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ]),
                ("pt_mulaw_decode", [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ]),
                ("pt_float_to_mulaw", [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ]),
            ):
                getattr(lib, name).argtypes = argtypes
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


def int16_to_float(pcm: np.ndarray, scale: float = 1.0 / 32767.0) -> np.ndarray:
    """int16 -> float32 * scale (collect() wire-path hot loop)."""
    pcm = np.ascontiguousarray(pcm, np.int16)
    lib = _load()
    if lib is None or pcm.size == 0:
        return pcm.astype(np.float32) * np.float32(scale)
    out = np.empty(pcm.shape, np.float32)
    lib.pt_int16_to_float(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pcm.size, ctypes.c_float(scale),
    )
    return out


def mulaw_encode(pcm: np.ndarray) -> Optional[np.ndarray]:
    """int16 -> G.711 mu-law codes; None when the library is absent
    (callers fall back to the vectorized numpy codec)."""
    lib = _load()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, np.int16)
    out = np.empty(pcm.shape, np.uint8)
    lib.pt_mulaw_encode(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        pcm.size,
    )
    return out


def mulaw_decode(codes: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    out = np.empty(codes.shape, np.int16)
    lib.pt_mulaw_decode(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        codes.size,
    )
    return out


def float_to_mulaw(audio: np.ndarray) -> Optional[np.ndarray]:
    """float [-1,1] -> mu-law codes in one fused pass."""
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, np.float32)
    out = np.empty(audio.shape, np.uint8)
    lib.pt_float_to_mulaw(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        audio.size,
    )
    return out

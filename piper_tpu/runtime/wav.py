"""WAV IO and int16 conversion.

Parity: reference audio_float_to_int16
(src/python_run/piper/util.py:5-12) and the RIFF/PCM16 writer
(src/cpp/wavfile.hpp:6-38) — here via the stdlib wave module.
"""

from __future__ import annotations

import io
import wave
from pathlib import Path
from typing import Union

import numpy as np


def audio_float_to_int16(
    audio: np.ndarray, max_wav_value: float = 32767.0
) -> np.ndarray:
    """Peak-normalize float audio to int16 range.

    Uses the native C++ kernel when built (piper_tpu.native), numpy
    otherwise — both implement the same math.
    """
    from .. import native

    return native.normalize_to_int16(np.asarray(audio, np.float32), max_wav_value)


def write_wav(
    path_or_file: Union[str, Path, io.IOBase],
    audio_int16: np.ndarray,
    sample_rate: int,
) -> None:
    """Write mono PCM16 WAV."""
    if isinstance(path_or_file, (str, Path)):
        f = wave.open(str(path_or_file), "wb")
    else:
        f = wave.open(path_or_file, "wb")
    with f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.ascontiguousarray(audio_int16, np.int16).tobytes())


def wav_bytes(audio_int16: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    write_wav(buf, audio_int16, sample_rate)
    return buf.getvalue()


def read_wav(path: Union[str, Path]) -> tuple:
    """Read a PCM16 WAV -> (sample_rate, np.int16 array)."""
    with wave.open(str(path), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        data = np.frombuffer(f.readframes(n), dtype=np.int16)
        if f.getnchannels() > 1:
            data = data.reshape(-1, f.getnchannels())[:, 0]
    return sr, data

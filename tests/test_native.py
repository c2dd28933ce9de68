"""Native C++ host library: build, bindings, numpy-fallback parity."""

import wave
import io

import numpy as np
import pytest

from piper_tpu import native


def _numpy_normalize(audio, max_wav=32767.0):
    peak = float(np.max(np.abs(audio))) if audio.size else 0.0
    return np.clip(
        audio * (max_wav / max(0.01, peak)), -max_wav, max_wav
    ).astype(np.int16)


def test_native_builds():
    assert native.available(), "g++ toolchain present; native lib must build"


def test_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    for scale in (1e-4, 0.3, 1.0, 7.5):
        audio = (rng.standard_normal(10_000) * scale).astype(np.float32)
        out = native.normalize_to_int16(audio)
        ref = _numpy_normalize(audio)
        np.testing.assert_array_equal(out, ref)


def test_normalize_quiet_audio():
    # peak below 0.01 floor (reference util.py: max(0.01, peak))
    audio = np.full(100, 0.001, np.float32)
    out = native.normalize_to_int16(audio)
    assert out.max() == int(0.001 * 32767.0 / 0.01)


def test_chunk_rms_matches_numpy():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(4801).astype(np.float32)
    out = native.chunk_rms(audio, 480)
    n = 4801 // 480
    ref = np.sqrt(
        np.mean(np.square(audio[: n * 480].reshape(n, 480)), axis=1)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_wav_header_matches_stdlib():
    hdr = native.wav_header(22050, 1234)
    assert len(hdr) == 44
    pcm = np.zeros(1234, np.int16)
    full = hdr + pcm.tobytes()
    with wave.open(io.BytesIO(full), "rb") as f:
        assert f.getframerate() == 22050
        assert f.getnframes() == 1234
        assert f.getnchannels() == 1
        assert f.getsampwidth() == 2

"""Spectral bias denoiser (runtime/denoise.py): reconstruction
exactness at strength 0, noise-floor reduction, and for_voice plumbing.

Reference counterpart: src/python/piper_train/infer_onnx.py:105-196
(waveglow-style denoiser; its driver code is commented out upstream).
"""

import numpy as np

from piper_tpu.runtime.denoise import (
    FFT_SIZE,
    HOP,
    Denoiser,
    istft,
    maybe_denoiser,
    stft_mag_phase,
)


def _tone(n, sr=16000, f=220.0, amp=0.4):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_zero_strength_reconstructs():
    audio = _tone(16000)
    den = Denoiser(np.zeros((1, FFT_SIZE // 2 + 1)))
    out = den(audio, strength=0.5)  # zero bias: any strength is identity
    # interior region (full window coverage); edges are OLA-normalized
    # but the final partial-coverage tail is excluded
    lo, hi = FFT_SIZE, len(audio) - 2 * FFT_SIZE
    np.testing.assert_allclose(out[lo:hi], audio[lo:hi], atol=1e-5)


def test_istft_inverts_stft():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(8192).astype(np.float32)
    mag, phase = stft_mag_phase(audio)
    out = istft(mag, phase, len(audio))
    lo, hi = FFT_SIZE, (mag.shape[0] - 1) * HOP
    np.testing.assert_allclose(out[lo:hi], audio[lo:hi], atol=1e-5)


def test_bias_subtraction_reduces_noise():
    rng = np.random.default_rng(2)
    clean = _tone(16000)
    noise = (0.02 * rng.standard_normal(clean.shape)).astype(np.float32)
    noisy = clean + noise
    bias_mag, _ = stft_mag_phase(noise)
    den = Denoiser(bias_mag)
    out = den(noisy, strength=1.0)
    lo, hi = FFT_SIZE, len(clean) - 2 * FFT_SIZE
    err_before = np.mean((noisy - clean)[lo:hi] ** 2)
    err_after = np.mean((out - clean)[lo:hi] ** 2)
    assert err_after < 0.6 * err_before


def test_short_audio_passthrough():
    audio = _tone(FFT_SIZE // 2)
    den = Denoiser(np.zeros((1, FFT_SIZE // 2 + 1)))
    np.testing.assert_array_equal(den(audio, 1.0), audio)


class _StubVoice:
    def synthesize_ids_batch(self, ids_list, syn=None):
        rng = np.random.default_rng(3)
        return [
            (0.01 * rng.standard_normal(6000)).astype(np.float32)
            for _ in ids_list
        ]


def test_for_voice_and_maybe():
    assert maybe_denoiser(_StubVoice(), 0.0) is None
    assert maybe_denoiser(_StubVoice(), None) is None
    den = maybe_denoiser(_StubVoice(), 0.01)
    assert isinstance(den, Denoiser)
    assert den.bias_profile.shape == (1, FFT_SIZE // 2 + 1)
    out = den(_tone(12000), strength=0.01)
    assert out.shape == (12000,)
    assert np.isfinite(out).all()

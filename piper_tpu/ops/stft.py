"""Spectrogram / mel ops.

Parity: reference mel_processing.py — reflect pad (n_fft-hop)/2,
torch.stft(center=False, hann window), magnitude sqrt(re^2+im^2+1e-6),
librosa Slaney mel filterbank, log dynamic-range compression
(clip 1e-5).

TPU notes: framing is a gather-free reshape+slice pattern; the DFT runs
as a real-FFT via XLA. Mel projection is a single MXU matmul.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax


def hann_window(win_length: int) -> np.ndarray:
    """torch.hann_window (periodic)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)).astype(np.float32)


@lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-style mel filterbank, numerically equal to
    librosa.filters.mel(htk=False, norm='slaney').

    Returns (n_mels, n_fft//2 + 1) float32.
    """
    if fmax is None:
        fmax = sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        safe_f = np.maximum(f, 1e-10)
        return np.where(
            f >= min_log_hz,
            min_log_mel + np.log(safe_f / min_log_hz) / logstep,
            mels,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
        )

    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_pts = mel_to_hz(
        np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    # Slaney normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame_length) overlapping frames."""
    b, t = y.shape
    n_frames = 1 + (t - frame_length) // hop
    # conv_general_dilated_patches extracts sliding windows on device.
    patches = lax.conv_general_dilated_patches(
        y[:, None, :],  # (B, C=1, T)
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
    )  # (B, frame_length, n_frames)
    return jnp.transpose(patches, (0, 2, 1))[:, :n_frames]


def spectrogram(
    y: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jnp.ndarray:
    """Linear magnitude spectrogram of (B, T) audio.

    Returns (B, n_frames, n_fft//2+1) — NWC (frames on sublanes,
    frequency bins on lanes). Parity: mel_processing.spectrogram_torch.
    """
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(y.astype(jnp.float32), n_fft, hop_length)
    win = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag) + 1e-6)


def spec_to_mel(
    spec: jnp.ndarray,
    *,
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    """(B, T, n_freq) linear spec -> (B, T, n_mels) log-mel."""
    basis = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    )  # (n_mels, n_freq)
    mel = jnp.einsum("btf,mf->btm", spec, basis)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram(
    y: jnp.ndarray,
    *,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    spec = spectrogram(y, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
    return spec_to_mel(
        spec, sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
        fmin=fmin, fmax=fmax,
    )

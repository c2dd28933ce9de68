"""Voice conversion: re-speak audio in another speaker's voice.

Parity: reference SynthesizerTrn.voice_conversion (models.py:724-732)
and the driver (piper_train/voice_conversion.py:59-103): audio ->
linear spectrogram -> posterior z (source speaker) -> flow forward ->
flow reverse with the target speaker -> vocoder.

Requires a training checkpoint (the posterior encoder is pruned from
inference-only ONNX exports) and a multi-speaker model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.vits import flow as F
from ..models.vits import generator as G
from ..models.vits import posterior as Q
from ..models.vits.model import speaker_embedding
from ..ops import nn as tnn
from ..ops.stft import spectrogram

Params = Dict[str, Any]


def voice_convert_spec(
    params: Params,
    spec: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    sid_src: jnp.ndarray,
    sid_tgt: jnp.ndarray,
    *,
    cfg: ModelConfig,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, T, spec_channels) spectrogram -> converted waveform (B, S)."""
    if cfg.num_speakers <= 1:
        raise ValueError("voice conversion needs a multi-speaker model")
    if "enc_q" not in params:
        raise ValueError(
            "voice conversion needs the posterior encoder (train checkpoint)"
        )
    y_mask = tnn.sequence_mask(spec_lengths, spec.shape[1]).astype(spec.dtype)
    g_src = speaker_embedding(params, cfg, sid_src)
    g_tgt = speaker_embedding(params, cfg, sid_tgt)

    noise = None
    if rng is not None:
        noise = jax.random.normal(
            rng, (spec.shape[0], spec.shape[1], cfg.inter_channels), jnp.float32
        )
    z, _m_q, _logs_q = Q.posterior_encode(
        params["enc_q"], spec, y_mask, cfg=cfg, g=g_src, noise=noise
    )
    z_p = F.flow_apply(params["flow"], z, y_mask, cfg=cfg, g=g_src, reverse=False)
    z_hat = F.flow_apply(params["flow"], z_p, y_mask, cfg=cfg, g=g_tgt, reverse=True)
    return G.generator_apply(params["dec"], z_hat * y_mask, y_mask, cfg=cfg, g=g_tgt)


def voice_convert_audio(
    params: Params,
    audio: np.ndarray,
    sid_src: int,
    sid_tgt: int,
    *,
    cfg: ModelConfig,
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """float32 waveform -> converted float32 waveform (batch-1 helper)."""
    a = cfg.audio
    y = jnp.asarray(audio, jnp.float32)[None, :]
    spec = spectrogram(
        y, n_fft=a.filter_length, hop_length=a.hop_length,
        win_length=a.win_length,
    )
    out = voice_convert_spec(
        params, spec, jnp.asarray([spec.shape[1]], jnp.int32),
        jnp.asarray([sid_src], jnp.int32), jnp.asarray([sid_tgt], jnp.int32),
        cfg=cfg, rng=rng,
    )
    return np.asarray(out[0], np.float32)

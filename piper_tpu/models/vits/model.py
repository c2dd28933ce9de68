"""VITS synthesizer: the end-to-end inference graph.

Parity: reference SynthesizerTrn.infer (models.py:681-722). The graph
is split into two jittable stages mirroring the reference's streaming
export (export_onnx_streaming.py:19-69):

  encode:  ids -> (m_p, logs_p, durations)      [phoneme-length bucket]
  decode:  (m_p, logs_p, durations) -> waveform  [frame-length bucket]

so the data-dependent output length only forces re-bucketing of the
decoder, never a dynamic shape inside XLA. A fused single-bucket
`infer` is provided for fixed-shape serving/benchmarks.

Speaker conditioning g = emb_g[sid] (models.py:692-694) is threaded to
the duration predictor, flow WN, and generator.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from ...ops import nn as tnn
from ...ops.duration import expand_by_duration
from . import duration as D
from . import encoder as E
from . import flow as F
from . import generator as G
from . import layers as L
from . import posterior as Q

Params = Dict[str, Any]


def init_synthesizer_params(rng, cfg: ModelConfig, *, training: bool = False) -> Params:
    """Random-init parameter pytree (torch-equivalent distributions)."""
    r_enc, r_dp, r_flow, r_dec, r_emb, r_q = jax.random.split(rng, 6)
    if cfg.vocoder == "mb_istft":
        from .istft_generator import init_mb_istft_generator

        dec = init_mb_istft_generator(r_dec, cfg)
    else:
        dec = G.init_generator(r_dec, cfg)
    p: Params = {
        "enc_p": E.init_text_encoder(r_enc, cfg),
        "dp": D.init_sdp(r_dp, cfg) if cfg.use_sdp else D.init_dp(r_dp, cfg),
        "flow": F.init_flow(r_flow, cfg),
        "dec": dec,
    }
    if cfg.num_speakers > 1:
        p["emb_g"] = {
            "weight": jax.random.normal(r_emb, (cfg.num_speakers, cfg.gin_channels))
        }
    if training:
        p["enc_q"] = Q.init_posterior_encoder(r_q, cfg)
    return p


def speaker_embedding(
    params: Params, cfg: ModelConfig, sid: Optional[jnp.ndarray]
) -> Optional[jnp.ndarray]:
    if cfg.num_speakers <= 1 or sid is None:
        return None
    return params["emb_g"]["weight"][sid]  # (B, gin)


def apply_decoder(
    params: Params,
    z: jnp.ndarray,
    y_mask: Optional[jnp.ndarray],
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Vocoder dispatch: HiFiGAN (reference parity) or MB-iSTFT."""
    if cfg.vocoder == "mb_istft":
        from .istft_generator import mb_istft_generator_apply

        return mb_istft_generator_apply(params["dec"], z, y_mask, cfg=cfg, g=g)
    return G.generator_apply(params["dec"], z, y_mask, cfg=cfg, g=g)


class EncodeResult(NamedTuple):
    m_p: jnp.ndarray  # (B, T_x, C) prior mean per phoneme
    logs_p: jnp.ndarray  # (B, T_x, C) prior log-std per phoneme
    durations: jnp.ndarray  # (B, T_x) int32 frames per phoneme
    x_mask: jnp.ndarray  # (B, T_x, 1)


def synthesizer_encode(
    params: Params,
    ids: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    cfg: ModelConfig,
    noise_w_scale: jnp.ndarray,
    length_scale: jnp.ndarray,
    sid: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    dur_noise: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> EncodeResult:
    """Text encoder + duration prediction (models.py:691-704).

    Provide either `rng` (sampling) or `dur_noise` (B, T_x, 2) explicit
    standard normal (parity tests / deterministic replay).
    """
    x_mask = tnn.sequence_mask(lengths, ids.shape[1]).astype(dtype)
    g = speaker_embedding(params, cfg, sid)
    x, m_p, logs_p = E.text_encoder_apply(
        params["enc_p"], ids, x_mask, cfg=cfg, dtype=dtype, g=g
    )

    if cfg.use_sdp:
        if dur_noise is None:
            if rng is None:
                raise ValueError("need rng or dur_noise for SDP sampling")
            dur_noise = jax.random.normal(
                rng, (ids.shape[0], ids.shape[1], 2), jnp.float32
            )
        logw = D.sdp_reverse(
            params["dp"], x, x_mask, cfg=cfg, noise_w=noise_w_scale,
            noise=dur_noise, g=g, dtype=dtype,
        )
    else:
        logw = D.dp_apply(params["dp"], x, x_mask, cfg=cfg, g=g)

    w = jnp.exp(logw.astype(jnp.float32)) * x_mask.astype(jnp.float32)
    w = w * length_scale
    w_ceil = jnp.ceil(w)[..., 0]  # (B, T_x)
    durations = w_ceil.astype(jnp.int32)
    return EncodeResult(m_p, logs_p, durations, x_mask)


def synthesizer_latents(
    params: Params,
    enc: EncodeResult,
    num_frames: int,
    *,
    cfg: ModelConfig,
    noise_scale: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    frame_noise: Optional[jnp.ndarray] = None,
    frame_offset=0,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prior expansion + latent sampling (models.py:705-718).

    Returns (z_p (B, num_frames, C), y_mask (B, num_frames, 1)).
    `frame_offset` expands the absolute frame window
    [frame_offset, frame_offset + num_frames) — the long-form windowed
    decode for utterances whose frame count exceeds the bucket ladder.
    """
    m_p, y_mask = expand_by_duration(
        enc.m_p, enc.durations, num_frames, frame_offset
    )
    logs_p, _ = expand_by_duration(
        enc.logs_p, enc.durations, num_frames, frame_offset
    )
    y_mask = y_mask.astype(dtype)

    if frame_noise is None:
        if rng is None:
            raise ValueError("need rng or frame_noise")
        frame_noise = jax.random.normal(rng, m_p.shape, jnp.float32).astype(dtype)
    # keep the compute dtype: a strongly-typed f32 scalar would promote
    # the whole decode graph to f32
    noise_scale = jnp.asarray(noise_scale, m_p.dtype)
    z_p = m_p + frame_noise.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
    return z_p * y_mask, y_mask  # padded frames carry no signal


def synthesizer_vocode(
    params: Params,
    z_p: jnp.ndarray,
    y_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    sid: Optional[jnp.ndarray] = None,
    g: Optional[jnp.ndarray] = None,
    tm_interpret: bool = False,
) -> jnp.ndarray:
    """Flow reverse + HiFiGAN (models.py:719-720): z_p -> waveform.

    This is the chunkable stage for streaming synthesis (the
    reference's VitsDecoder split, export_onnx_streaming.py:61-69).
    Pass either `sid` (speaker ids) or a precomputed `g` embedding
    (shard_map callers, where the row-local g is computed outside).
    """
    if g is None:
        g = speaker_embedding(params, cfg, sid)
    z = F.flow_apply(params["flow"], z_p, y_mask, cfg=cfg, g=g, reverse=True)
    if "dec_tm" in params and cfg.vocoder != "mb_istft":
        # Time-major Pallas fast path (see generator.prepare_tm):
        # attached to the param tree by the serving runtime when the
        # backend supports it (TPU; under a mesh the caller wraps this
        # in shard_map — pallas_call is not GSPMD-partitionable).
        frame_lengths = jnp.sum(y_mask[..., 0].astype(jnp.int32), axis=1)
        return G.generator_tm_apply(
            params["dec"], params["dec_tm"], z * y_mask, frame_lengths,
            cfg=cfg, g=g, interpret=tm_interpret,
        )
    return apply_decoder(params, z * y_mask, y_mask, cfg=cfg, g=g)


def synthesizer_decode(
    params: Params,
    enc: EncodeResult,
    num_frames: int,
    *,
    cfg: ModelConfig,
    noise_scale: jnp.ndarray,
    sid: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    frame_noise: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prior expansion + flow reverse + vocoder (models.py:705-721).

    Returns (audio (B, num_frames * upsample_factor), y_lengths (B,)).
    """
    z_p, y_mask = synthesizer_latents(
        params, enc, num_frames, cfg=cfg, noise_scale=noise_scale, rng=rng,
        frame_noise=frame_noise, dtype=dtype,
    )
    audio = synthesizer_vocode(params, z_p, y_mask, cfg=cfg, sid=sid)
    y_lengths = jnp.sum(enc.durations, axis=-1)
    return audio, y_lengths


def infer(
    params: Params,
    ids: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    cfg: ModelConfig,
    max_frames: int,
    noise_scale,
    length_scale,
    noise_w_scale,
    sid: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    dur_noise: Optional[jnp.ndarray] = None,
    frame_noise: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused single-graph inference with a static frame budget.

    Returns (audio (B, max_frames * upsample), y_lengths (B,)). Total
    durations are clamped to max_frames (per batch element) so the
    static budget is never exceeded: overflow truncates trailing
    phonemes, matching what a caller would get by slicing.
    """
    r_enc = r_dec = None
    if rng is not None:
        r_enc, r_dec = jax.random.split(rng)
    enc = synthesizer_encode(
        params, ids, lengths, cfg=cfg, noise_w_scale=noise_w_scale,
        length_scale=length_scale, sid=sid, rng=r_enc, dur_noise=dur_noise,
        dtype=dtype,
    )
    # Clamp cumulative durations into the frame budget.
    cum = jnp.cumsum(enc.durations, axis=-1)
    clamped = jnp.minimum(cum, max_frames)
    durations = jnp.diff(clamped, axis=-1, prepend=jnp.zeros_like(clamped[:, :1]))
    enc = enc._replace(durations=durations)
    return synthesizer_decode(
        params, enc, max_frames, cfg=cfg, noise_scale=noise_scale, sid=sid,
        rng=r_dec, frame_noise=frame_noise, dtype=dtype,
    )

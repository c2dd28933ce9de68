"""VITS training forward pass.

Parity: reference SynthesizerTrn.forward (models.py:617-679) — text
encoder + posterior encoder + flow + on-device MAS + duration loss +
random segment slicing + HiFiGAN on the segment.

TPU-first departures from the reference:
- MAS runs on device (lax.scan DP, ops/mas.py) instead of the
  host-CPU Cython round trip (monotonic_align/__init__.py:14-20).
- Prior expansion uses the MAS path's per-frame phoneme index and a
  gather (O(T_y*C)) rather than the dense (T_y, T_x) matmul.
- Random segment slicing is a vmapped dynamic_slice.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.vits import duration as D
from ..models.vits import encoder as E
from ..models.vits import flow as F
from ..models.vits import generator as G
from ..models.vits import posterior as Q
from ..models.vits.model import apply_decoder, speaker_embedding
from ..ops import nn as tnn
from ..ops.mas import maximum_path

Params = Dict[str, Any]


class TrainForwardOut(NamedTuple):
    y_hat: jnp.ndarray  # (B, segment_samples) generated audio segment
    ids_slice: jnp.ndarray  # (B,) segment start frames
    loss_dur: jnp.ndarray  # scalar duration loss
    z_p: jnp.ndarray  # (B, T_y, C)
    m_p_exp: jnp.ndarray  # expanded prior mean (B, T_y, C)
    logs_p_exp: jnp.ndarray
    m_q: jnp.ndarray
    logs_q: jnp.ndarray
    y_mask: jnp.ndarray  # (B, T_y, 1)
    attn_durations: jnp.ndarray  # (B, T_x) frames per phoneme
    # VITS2 duration-discriminator inputs (zeros unless cfg.use_dur_disc):
    # x_h is the detached text hidden; logw_hat carries generator grads.
    x_h: jnp.ndarray = jnp.zeros(())
    x_mask: jnp.ndarray = jnp.zeros(())
    logw_hat: jnp.ndarray = jnp.zeros(())
    logw_real: jnp.ndarray = jnp.zeros(())


def slice_segments(x: jnp.ndarray, ids_str: jnp.ndarray, segment_size: int):
    """Per-example dynamic slice along time (commons.py:47-53)."""

    def one(xi, start):
        return jax.lax.dynamic_slice_in_dim(xi, start, segment_size, axis=0)

    return jax.vmap(one)(x, ids_str)


def rand_slice_ids(rng, lengths: jnp.ndarray, segment_size: int) -> jnp.ndarray:
    """Random valid segment starts (commons.py:56-63)."""
    ids_max = jnp.maximum(lengths - segment_size + 1, 1)
    u = jax.random.uniform(rng, lengths.shape)
    return (u * ids_max).astype(jnp.int32)


def train_forward(
    params: Params,
    *,
    cfg: ModelConfig,
    ids: jnp.ndarray,  # (B, T_x) int32
    id_lengths: jnp.ndarray,  # (B,)
    spec: jnp.ndarray,  # (B, T_y, spec_channels)
    spec_lengths: jnp.ndarray,  # (B,)
    sid: Optional[jnp.ndarray],
    rng: jax.Array,
    dtype=jnp.float32,
    mas_noise_scale: Optional[jnp.ndarray] = None,
) -> TrainForwardOut:
    r_post, r_sdp, r_slice, r_mas = jax.random.split(rng, 4)
    seg_frames = cfg.segment_size // cfg.audio.hop_length

    x_mask = tnn.sequence_mask(id_lengths, ids.shape[1]).astype(dtype)
    y_mask = tnn.sequence_mask(spec_lengths, spec.shape[1]).astype(dtype)
    g = speaker_embedding(params, cfg, sid)

    x, m_p, logs_p = E.text_encoder_apply(
        params["enc_p"], ids, x_mask, cfg=cfg, dtype=dtype, rng=None, g=g
    )

    post_noise = jax.random.normal(
        r_post, (spec.shape[0], spec.shape[1], cfg.inter_channels), jnp.float32
    ).astype(dtype)
    z, m_q, logs_q = Q.posterior_encode(
        params["enc_q"], spec.astype(dtype), y_mask, cfg=cfg, g=g, noise=post_noise
    )
    z_p = F.flow_apply(params["flow"], z, y_mask, cfg=cfg, g=g, reverse=False)

    # ---- MAS (no grad; models.py:628-650) ----
    zp32 = jax.lax.stop_gradient(z_p).astype(jnp.float32)
    mp32 = jax.lax.stop_gradient(m_p).astype(jnp.float32)
    lp32 = jax.lax.stop_gradient(logs_p).astype(jnp.float32)
    s_p_sq_r = jnp.exp(-2.0 * lp32)  # (B, T_x, C)
    neg_cent1 = jnp.sum(
        -0.5 * math.log(2 * math.pi) - lp32, axis=-1
    )  # (B, T_x)
    neg_cent2 = jnp.einsum("byc,bxc->byx", -0.5 * jnp.square(zp32), s_p_sq_r)
    neg_cent3 = jnp.einsum("byc,bxc->byx", zp32, mp32 * s_p_sq_r)
    neg_cent4 = jnp.sum(-0.5 * jnp.square(mp32) * s_p_sq_r, axis=-1)
    neg_cent = neg_cent2 + neg_cent3 + neg_cent1[:, None, :] + neg_cent4[:, None, :]

    if cfg.mas_noise and mas_noise_scale is not None:
        # VITS2 §2.2: annealed Gaussian noise on the alignment scores —
        # explores alternative monotonic alignments early in training.
        neg_cent = neg_cent + mas_noise_scale * jax.random.normal(
            r_mas, neg_cent.shape, jnp.float32
        )

    attn = maximum_path(neg_cent, id_lengths, spec_lengths)  # (B, T_y, T_x)
    w = jnp.sum(attn, axis=1)  # (B, T_x) durations

    # ---- duration loss ----
    logw_real = jnp.log(w[..., None] + 1e-6) * x_mask
    logw_hat = jnp.zeros(())
    if cfg.use_sdp:
        nll = D.sdp_forward_nll(
            params["dp"], x, x_mask, w[..., None], cfg=cfg, g=g, rng=r_sdp
        )
        loss_dur = jnp.sum(nll.astype(jnp.float32)) / jnp.sum(x_mask)
        if cfg.use_dur_disc:
            # adversarial target: a sampled log-duration sequence.
            # x is detached here — sdp_forward_nll and dp_apply both
            # detach their condition internally, but sdp_reverse (an
            # inference path) does not; without this the GAN gradient
            # would leak into the text encoder.
            dur_noise = jax.random.normal(
                jax.random.fold_in(r_sdp, 1), (x.shape[0], x.shape[1], 2),
                jnp.float32,
            )
            logw_hat = D.sdp_reverse(
                params["dp"], jax.lax.stop_gradient(x), x_mask, cfg=cfg,
                noise_w=jnp.float32(1.0), noise=dur_noise, g=g,
            )
    else:
        logw = D.dp_apply(params["dp"], x, x_mask, cfg=cfg, g=g)
        loss_dur = jnp.sum(jnp.square(logw - logw_real)) / jnp.sum(x_mask)
        logw_hat = logw

    # ---- expand prior via per-frame phoneme index gather ----
    # attn rows are one-hot over phonemes; the frame's phoneme index is
    # the argmax — equivalent to the reference's attn @ m_p matmul.
    frame_idx = jnp.argmax(attn, axis=-1)  # (B, T_y)
    m_p_exp = jnp.take_along_axis(m_p, frame_idx[..., None], axis=1) * y_mask
    logs_p_exp = jnp.take_along_axis(logs_p, frame_idx[..., None], axis=1) * y_mask

    # ---- random segment + vocoder ----
    ids_slice = rand_slice_ids(r_slice, spec_lengths, seg_frames)
    z_slice = slice_segments(z, ids_slice, seg_frames)
    y_hat = apply_decoder(params, z_slice, None, cfg=cfg, g=g)

    return TrainForwardOut(
        y_hat=y_hat,
        ids_slice=ids_slice,
        loss_dur=loss_dur,
        z_p=z_p,
        m_p_exp=m_p_exp,
        logs_p_exp=logs_p_exp,
        m_q=m_q,
        logs_q=logs_q,
        y_mask=y_mask,
        attn_durations=w,
        x_h=jax.lax.stop_gradient(x),
        x_mask=x_mask,
        logw_hat=logw_hat,
        logw_real=jax.lax.stop_gradient(logw_real),
    )

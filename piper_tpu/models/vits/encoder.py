"""Text encoder: transformer with windowed relative-position attention.

Parity target: reference TextEncoder (models.py:168-209) and
attentions.Encoder / MultiHeadAttention / FFN (attentions.py:12-74,
161-359, 362-427) with window_size=4 and shared relative-position
heads.

All matmuls run on the MXU; the relative→absolute position conversion
is the standard pad/reshape trick (pure data movement, fused by XLA).
Sequence length is static per jitted bucket, so the relative-embedding
slicing is resolved at trace time.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from . import layers as L

Params = Dict[str, Any]

WINDOW_SIZE = 4  # attentions.py:21


# ---------------------------------------------------------------------------
# Relative position helpers (attentions.py:292-348)
# ---------------------------------------------------------------------------


def _get_relative_embeddings(emb: jnp.ndarray, length: int) -> jnp.ndarray:
    """Slice/pad the (heads, 2w+1, d) table to (heads, 2*length-1, d)."""
    window = WINDOW_SIZE
    pad_length = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1 :]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, L) attention weights -> (B, H, L, 2L-1) relative."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


# ---------------------------------------------------------------------------
# Multi-head attention with relative positions
# ---------------------------------------------------------------------------


def init_attention(rng, channels: int, n_heads: int) -> Params:
    k_channels = channels // n_heads
    rngs = jax.random.split(rng, 6)

    def xavier(r, c_in, c_out):
        bound = math.sqrt(6.0 / (c_in + c_out))
        return jax.random.uniform(r, (c_in, c_out), jnp.float32, -bound, bound)

    def bias(r, c_in, c_out):
        b = 1.0 / math.sqrt(c_in)
        return jax.random.uniform(r, (c_out,), jnp.float32, -b, b)

    rel_std = k_channels**-0.5
    r_k, r_v = jax.random.split(rngs[5])
    return {
        "q": {"w": xavier(rngs[0], channels, channels), "b": jnp.zeros((channels,))},
        "k": {"w": xavier(rngs[1], channels, channels), "b": jnp.zeros((channels,))},
        "v": {"w": xavier(rngs[2], channels, channels), "b": jnp.zeros((channels,))},
        "o": {
            "w": _kaiming_dense(rngs[3], channels, channels),
            "b": bias(rngs[4], channels, channels),
        },
        # heads_share=True -> leading dim 1 (attentions.py:196-205)
        "emb_rel_k": rel_std * jax.random.normal(r_k, (1, 2 * WINDOW_SIZE + 1, k_channels)),
        "emb_rel_v": rel_std * jax.random.normal(r_v, (1, 2 * WINDOW_SIZE + 1, k_channels)),
    }


def _kaiming_dense(rng, c_in, c_out):
    bound = math.sqrt(3.0) / math.sqrt(c_in)
    return jax.random.uniform(rng, (c_in, c_out), jnp.float32, -bound, bound)


def attention_apply(
    p: Params,
    x: jnp.ndarray,
    attn_mask: jnp.ndarray,
    *,
    n_heads: int,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """Self-attention. x: (B, T, C); attn_mask: (B, 1, T, T) {0,1}."""
    b, t, c = x.shape
    k_channels = c // n_heads
    scale = 1.0 / math.sqrt(k_channels)

    q = L.dense(p["q"], x).reshape(b, t, n_heads, k_channels)
    k = L.dense(p["k"], x).reshape(b, t, n_heads, k_channels)
    v = L.dense(p["v"], x).reshape(b, t, n_heads, k_channels)

    # (B, H, Tq, Tk) in f32 for softmax stability.
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )

    rel_k = _get_relative_embeddings(p["emb_rel_k"].astype(x.dtype), t)
    if rel_k.shape[0] == 1:  # heads_share=True: one table for all heads
        rel_logits = jnp.einsum(
            "bqhd,md->bhqm", q * scale, rel_k[0],
            preferred_element_type=jnp.float32,
        )
    else:
        rel_logits = jnp.einsum(
            "bqhd,hmd->bhqm", q * scale, rel_k,
            preferred_element_type=jnp.float32,
        )
    scores = scores + _relative_to_absolute(rel_logits)

    scores = jnp.where(attn_mask == 0, jnp.float32(-1e4), scores)
    p_attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    if rng is not None:
        p_attn = L.maybe_dropout(p_attn, dropout_rate, rng)

    out = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v)
    rel_v = _get_relative_embeddings(p["emb_rel_v"].astype(x.dtype), t)
    rel_w = _absolute_to_relative(p_attn)
    if rel_v.shape[0] == 1:
        out = out + jnp.einsum("bhqm,md->bqhd", rel_w, rel_v[0])
    else:
        out = out + jnp.einsum("bhqm,hmd->bqhd", rel_w, rel_v)

    out = out.reshape(b, t, c)
    return L.dense(p["o"], out)


# ---------------------------------------------------------------------------
# Conv feed-forward (attentions.py:362-427, activation=relu, non-causal)
# ---------------------------------------------------------------------------


def init_ffn(rng, channels: int, filter_channels: int, kernel_size: int) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "conv1": L.init_conv(r1, kernel_size, channels, filter_channels),
        "conv2": L.init_conv(r2, kernel_size, filter_channels, channels),
    }


def ffn_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    kernel_size: int,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    pad = ((kernel_size - 1) // 2, kernel_size // 2)
    y = L.conv(p["conv1"], x * x_mask, padding=pad)
    y = jnp.maximum(y, 0)
    y = L.maybe_dropout(y, dropout_rate, rng)
    y = L.conv(p["conv2"], y * x_mask, padding=pad)
    return y * x_mask


# ---------------------------------------------------------------------------
# Encoder stack + TextEncoder
# ---------------------------------------------------------------------------


def init_encoder(rng, cfg: ModelConfig) -> Params:
    layers_p = []
    for i in range(cfg.n_layers):
        r = jax.random.fold_in(rng, i)
        r_attn, r_ffn = jax.random.split(r)
        layers_p.append(
            {
                "attn": init_attention(r_attn, cfg.hidden_channels, cfg.n_heads),
                "norm1": L.init_layer_norm(cfg.hidden_channels),
                "ffn": init_ffn(
                    r_ffn, cfg.hidden_channels, cfg.filter_channels, cfg.kernel_size
                ),
                "norm2": L.init_layer_norm(cfg.hidden_channels),
            }
        )
    return {"layers": layers_p}


def encoder_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    rng=None,
) -> jnp.ndarray:
    attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]).astype(x.dtype)
    x = x * x_mask
    for i, lp in enumerate(p["layers"]):
        if rng is not None:
            rng, r_attn, r_d1, r_ffn, r_d2 = jax.random.split(rng, 5)
        else:
            r_attn = r_d1 = r_ffn = r_d2 = None
        y = attention_apply(
            lp["attn"], x, attn_mask, n_heads=cfg.n_heads,
            dropout_rate=cfg.p_dropout, rng=r_attn,
        )
        y = L.maybe_dropout(y, cfg.p_dropout, r_d1)
        x = L.layer_norm(lp["norm1"], x + y)
        y = ffn_apply(
            lp["ffn"], x, x_mask, kernel_size=cfg.kernel_size,
            dropout_rate=cfg.p_dropout, rng=r_ffn,
        )
        y = L.maybe_dropout(y, cfg.p_dropout, r_d2)
        x = L.layer_norm(lp["norm2"], x + y)
    return x * x_mask


def init_text_encoder(rng, cfg: ModelConfig) -> Params:
    r_emb, r_enc, r_proj = jax.random.split(rng, 3)
    return {
        "emb": {
            "weight": (cfg.hidden_channels**-0.5)
            * jax.random.normal(r_emb, (cfg.num_symbols, cfg.hidden_channels))
        },
        "encoder": init_encoder(r_enc, cfg),
        "proj": L.init_dense(r_proj, cfg.hidden_channels, 2 * cfg.inter_channels),
    }


def text_encoder_apply(
    p: Params,
    ids: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    dtype=jnp.float32,
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ids: (B, T) int32; x_mask: (B, T, 1).

    Returns (hidden x, m_p, logs_p), each (B, T, ·).
    Parity: models.py:198-209.
    """
    emb = p["emb"]["weight"].astype(dtype)
    x = emb[ids] * math.sqrt(cfg.hidden_channels)
    x = encoder_apply(p["encoder"], x, x_mask.astype(dtype), cfg=cfg, rng=rng)
    stats = L.dense(p["proj"], x) * x_mask
    m_p = stats[..., : cfg.inter_channels]
    logs_p = stats[..., cfg.inter_channels :]
    return x, m_p, logs_p

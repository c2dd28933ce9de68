"""Text encoder: transformer with windowed relative-position attention.

Parity target: reference TextEncoder (models.py:168-209) and
attentions.Encoder / MultiHeadAttention / FFN (attentions.py:12-74,
161-359, 362-427) with window_size=4 and shared relative-position
heads.

All matmuls run on the MXU. The relative→absolute position conversion
exploits window_size=4: rel logits are computed against the 9-entry
table directly and placed/extracted on the score diagonals with fused
iota selects (see the banded fast-path section). Sequence length is
static per jitted bucket.
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
#
# Reference-shaped padded path: kept only as the exactness oracle for
# the banded fast path below (tests/test_module_parity.py). Not used at
# runtime.
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
# Banded relative-position fast path
#
# window_size=4 means the relative tables have only 2w+1 = 9 real
# entries; the reference (and the test-reference path above) zero-pads
# them to 2L-1 and runs L-wide matmuls — >100x wasted MXU work and a
# (B, H, L, 2L-1) f32 intermediate. The banded path works on the 9-wide
# band directly, and places/extracts the band with iota-diagonal selects
# rather than pad/reshape skew tricks: a (2L-1)-stride reshape is
# lane-misaligned on TPU (measured ~3.5 ms/layer as a relayout copy),
# while the selects fuse into the surrounding elementwise pass
# (~0.2 ms/layer). Encoder bf16 batch 32x512 on v5e: 75.6 ms (padded)
# -> 4.5 ms. Exact math parity with the padded path
# (tests/test_module_parity.py).
# ---------------------------------------------------------------------------


def _band_to_absolute(r: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, L, K=2w+1) banded logits -> (B, H, L, L) absolute.

    A[i, j] = r[i, j - i + w] inside the band, 0 outside. Works for any
    L (offsets outside [-(L-1), L-1] simply never match). The K selects
    fuse with the consumer (scores add + softmax): one pass over the
    (B, H, L, L) tensor, no extra materialisation.
    """
    l = r.shape[2]
    io = jax.lax.iota(jnp.int32, l)
    diff = io[None, :] - io[:, None]  # (L, L): j - i
    a = jnp.zeros(r.shape[:3] + (l,), r.dtype)
    for o in range(2 * window + 1):
        a = a + jnp.where(diff == o - window, r[..., o : o + 1], 0)
    return a


def _absolute_to_band(p_attn: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, L, L) attention weights -> (B, H, L, K=2w+1) band.

    band[i, o] = p_attn[i, i + o - w] (0 where out of range), computed
    as K masked lane-reductions (each row has exactly one live lane per
    offset, so the float sum is the exact selected value).
    """
    l = p_attn.shape[-1]
    io = jax.lax.iota(jnp.int32, l)
    diff = io[None, :] - io[:, None]  # (L, L): j - i
    outs = [
        jnp.sum(jnp.where(diff == o - window, p_attn, 0), axis=-1)
        for o in range(2 * window + 1)
    ]
    return jnp.stack(outs, axis=-1)


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

    # heads_share=True (attentions.py:196-205): one rel table per layer.
    rel_k = p["emb_rel_k"].astype(x.dtype)  # (1 or H, 2w+1, d)
    if rel_k.shape[0] == 1:
        rel_logits = jnp.einsum(
            "bqhd,od->bhqo", q * scale, rel_k[0],
            preferred_element_type=jnp.float32,
        )
    else:
        rel_logits = jnp.einsum(
            "bqhd,hod->bhqo", q * scale, rel_k,
            preferred_element_type=jnp.float32,
        )
    scores = scores + _band_to_absolute(rel_logits, WINDOW_SIZE)

    scores = jnp.where(attn_mask == 0, jnp.float32(-1e4), scores)
    p_attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    if rng is not None:
        p_attn = L.maybe_dropout(p_attn, dropout_rate, rng)

    out = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v)
    rel_v = p["emb_rel_v"].astype(x.dtype)  # (1 or H, 2w+1, d)
    band_w = _absolute_to_band(p_attn, WINDOW_SIZE)
    if rel_v.shape[0] == 1:
        out = out + jnp.einsum("bhqo,od->bqhd", band_w, rel_v[0])
    else:
        out = out + jnp.einsum("bhqo,hod->bqhd", band_w, rel_v)

    out = out.reshape(b, t, c)
    return L.dense(p["o"], out)


def local_attention_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    n_heads: int,
    window: int = WINDOW_SIZE,
) -> jnp.ndarray:
    """Windowed self-attention: position i attends only to |j-i| <= w.

    True O(T·w): scores are computed directly in band form
    (B, H, T, 2w+1) via static time shifts of k/v — the (T, T) score
    matrix never materializes, so this is safe at full spectrogram
    frame lengths (the dense attention_apply above allocates
    B·H·T² f32). Shares init_attention parameters, including the
    rel-pos tables (the band offset axis IS the rel-table index).
    Equals attention_apply under a band-restricted attn_mask
    (tests/test_vits2.py).
    """
    b, t, c = x.shape
    k_channels = c // n_heads
    scale = 1.0 / math.sqrt(k_channels)
    kk = 2 * window + 1

    q = (L.dense(p["q"], x) * scale).reshape(b, t, n_heads, k_channels)
    k = L.dense(p["k"], x).reshape(b, t, n_heads, k_channels)
    v = L.dense(p["v"], x).reshape(b, t, n_heads, k_channels)

    def shift_t(arr, o):
        """arr[:, i+o] with zero fill (time axis 1)."""
        if o == 0:
            return arr
        if o > 0:
            return jnp.pad(arr, ((0, 0), (0, o)) + ((0, 0),) * (arr.ndim - 2))[
                :, o:
            ]
        return jnp.pad(arr, ((0, 0), (-o, 0)) + ((0, 0),) * (arr.ndim - 2))[
            :, :t
        ]

    k_band = jnp.stack([shift_t(k, o - window) for o in range(kk)], axis=2)
    v_band = jnp.stack([shift_t(v, o - window) for o in range(kk)], axis=2)
    valid = jnp.stack(
        [shift_t(x_mask[..., 0], o - window) for o in range(kk)], axis=2
    )  # (B, T, K) — 0 beyond the sequence or past valid length

    scores = jnp.einsum(
        "bqhd,bqohd->bhqo", q, k_band, preferred_element_type=jnp.float32
    )
    rel_k = p["emb_rel_k"].astype(x.dtype)  # (1 or H, 2w+1, d)
    if rel_k.shape[0] == 1:
        scores = scores + jnp.einsum(
            "bqhd,od->bhqo", q, rel_k[0], preferred_element_type=jnp.float32
        )
    else:
        scores = scores + jnp.einsum(
            "bqhd,hod->bhqo", q, rel_k, preferred_element_type=jnp.float32
        )
    scores = jnp.where(
        valid[:, None, :, :] == 0, jnp.float32(-1e4), scores
    )
    p_attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)

    out = jnp.einsum("bhqo,bqohd->bqhd", p_attn, v_band)
    rel_v = p["emb_rel_v"].astype(x.dtype)
    if rel_v.shape[0] == 1:
        out = out + jnp.einsum("bhqo,od->bqhd", p_attn, rel_v[0])
    else:
        out = out + jnp.einsum("bhqo,hod->bqhd", p_attn, rel_v)
    return L.dense(p["o"], out.reshape(b, t, c))


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
    r_emb, r_enc, r_proj, r_cond = jax.random.split(rng, 4)
    p = {
        "emb": {
            "weight": (cfg.hidden_channels**-0.5)
            * jax.random.normal(r_emb, (cfg.num_symbols, cfg.hidden_channels))
        },
        "encoder": init_encoder(r_enc, cfg),
        "proj": L.init_dense(r_proj, cfg.hidden_channels, 2 * cfg.inter_channels),
    }
    if cfg.speaker_cond_encoder and cfg.gin_channels:
        # VITS2: condition the text encoder on the speaker embedding
        p["cond"] = L.init_dense(r_cond, cfg.gin_channels, cfg.hidden_channels)
    return p


def text_encoder_apply(
    p: Params,
    ids: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    dtype=jnp.float32,
    rng=None,
    g=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ids: (B, T) int32; x_mask: (B, T, 1); g: (B, gin) or None.

    Returns (hidden x, m_p, logs_p), each (B, T, ·).
    Parity: models.py:198-209 (+ VITS2 speaker conditioning when the
    config enables it).
    """
    emb = p["emb"]["weight"].astype(dtype)
    x = emb[ids] * math.sqrt(cfg.hidden_channels)
    if "cond" in p and g is not None:
        x = x + L.dense(p["cond"], g.astype(dtype)[:, None, :])
    x = encoder_apply(p["encoder"], x, x_mask.astype(dtype), cfg=cfg, rng=rng)
    stats = L.dense(p["proj"], x) * x_mask
    m_p = stats[..., : cfg.inter_channels]
    logs_p = stats[..., cfg.inter_channels :]
    return x, m_p, logs_p

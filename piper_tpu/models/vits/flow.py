"""Residual coupling normalizing flow (latent z <-> prior z_p).

Parity: reference ResidualCouplingBlock (models.py:212-254) and
ResidualCouplingLayer (modules.py:412-466) with mean_only=True, built
on the WN gated-residual stack (modules.py:132-209).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from . import layers as L

Params = Dict[str, Any]


def init_coupling_layer(rng, cfg: ModelConfig) -> Params:
    half = cfg.inter_channels // 2
    r_pre, r_wn, r_attn = jax.random.split(rng, 3)
    p = {
        "pre": L.init_dense(r_pre, half, cfg.hidden_channels),
        "enc": L.init_wn(
            r_wn,
            cfg.hidden_channels,
            cfg.flow_kernel_size,
            1,
            cfg.flow_n_layers,
            gin_channels=cfg.gin_channels,
        ),
        # zero-init post (modules.py:443-445)
        "post": L.init_dense(rng, cfg.hidden_channels, half, zero=True),
    }
    if cfg.flow_transformer:
        # VITS2 (arXiv:2307.16430 §2.4): a self-attention block in the
        # coupling conditioner. It only shapes m(x0), so invertibility
        # is untouched; windowed rel-pos attention
        # (encoder.local_attention_apply, band-form scores) keeps it
        # O(T·w) at inference frame counts.
        from . import encoder as E

        p["attn"] = E.init_attention(r_attn, cfg.hidden_channels, 2)
        p["attn_norm"] = L.init_layer_norm(cfg.hidden_channels)
    return p


def coupling_layer_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
    reverse: bool = False,
):
    """Mean-only affine coupling: x1' = m(x0) + x1 (fwd) / x1 - m (rev)."""
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = L.dense(p["pre"], x0) * x_mask
    h = L.wn_apply(
        p["enc"], h, x_mask,
        kernel_size=cfg.flow_kernel_size, dilation_rate=1, g=g,
    )
    if "attn" in p:
        # VITS2 transformer block in the conditioner (see init above).
        # Windowed attention: the flow runs at spectrogram-frame
        # resolution (thousands of frames at inference), where dense
        # (T, T) scores would cost gigabytes; the band form is O(T·w).
        from . import encoder as E

        y = E.local_attention_apply(p["attn"], h, x_mask, n_heads=2)
        h = L.layer_norm(p["attn_norm"], h + y) * x_mask
    m = L.dense(p["post"], h) * x_mask
    if not reverse:
        x1 = (m + x1) * x_mask  # exp(logs)=1, mean_only
        return jnp.concatenate([x0, x1], axis=-1), jnp.zeros(
            (x.shape[0],), x.dtype
        )
    x1 = (x1 - m) * x_mask
    return jnp.concatenate([x0, x1], axis=-1)


def init_flow(rng, cfg: ModelConfig) -> Params:
    return {
        "layers": [
            init_coupling_layer(jax.random.fold_in(rng, i), cfg)
            for i in range(cfg.flow_n_flows)
        ]
    }


def flow_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
    reverse: bool = False,
) -> jnp.ndarray:
    """z -> z_p (forward) or z_p -> z (reverse). x: (B, T, C)."""
    if not reverse:
        for lp in p["layers"]:
            x, _ = coupling_layer_apply(lp, x, x_mask, cfg=cfg, g=g, reverse=False)
            x = L.flip_channels(x)
    else:
        for lp in reversed(p["layers"]):
            x = L.flip_channels(x)
            x = coupling_layer_apply(lp, x, x_mask, cfg=cfg, g=g, reverse=True)
    return x

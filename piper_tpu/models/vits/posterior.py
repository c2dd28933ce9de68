"""Posterior encoder (training): linear spectrogram -> latent z.

Parity: reference PosteriorEncoder (models.py:257-296) — pre 1x1,
WN 16 layers kernel 5 dilation 1, proj to (m, logs),
z = m + eps * exp(logs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from . import layers as L

Params = Dict[str, Any]

POSTERIOR_KERNEL = 5
POSTERIOR_LAYERS = 16


def init_posterior_encoder(rng, cfg: ModelConfig) -> Params:
    r_pre, r_wn, r_proj = jax.random.split(rng, 3)
    return {
        "pre": L.init_dense(r_pre, cfg.spec_channels, cfg.hidden_channels),
        "enc": L.init_wn(
            r_wn,
            cfg.hidden_channels,
            POSTERIOR_KERNEL,
            1,
            POSTERIOR_LAYERS,
            gin_channels=cfg.gin_channels,
        ),
        "proj": L.init_dense(r_proj, cfg.hidden_channels, 2 * cfg.inter_channels),
    }


def posterior_encode(
    p: Params,
    spec: jnp.ndarray,
    y_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """spec: (B, T_frames, spec_channels); y_mask: (B, T_frames, 1).

    Returns (z, m_q, logs_q). `noise` is standard normal of m's shape;
    pass None for the deterministic mean path.
    """
    x = L.dense(p["pre"], spec) * y_mask
    x = L.wn_apply(
        p["enc"], x, y_mask, kernel_size=POSTERIOR_KERNEL, dilation_rate=1, g=g
    )
    stats = L.dense(p["proj"], x) * y_mask
    m = stats[..., : cfg.inter_channels]
    logs = stats[..., cfg.inter_channels :]
    if noise is None:
        z = m * y_mask
    else:
        z = (m + noise * jnp.exp(logs)) * y_mask
    return z, m, logs

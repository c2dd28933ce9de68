"""Duration predictors.

StochasticDurationPredictor — spline-flow model over log-durations
(parity: models.py:14-117); DurationPredictor — deterministic conv
regressor (parity: models.py:120-165).

Duration math stays float32 regardless of the compute dtype: the
rational-quadratic spline's division chains are precision-critical
(SURVEY.md §7).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from ...ops.spline import rational_quadratic_spline
from . import layers as L

Params = Dict[str, Any]

SDP_NUM_BINS = 10
SDP_TAIL_BOUND = 5.0
SDP_N_FLOWS = 4
SDP_DDS_LAYERS = 3


# ---------------------------------------------------------------------------
# ConvFlow (modules.py:469-527)
# ---------------------------------------------------------------------------


def init_conv_flow(rng, in_channels: int, filter_channels: int, kernel_size: int) -> Params:
    half = in_channels // 2
    r_pre, r_dds = jax.random.split(rng)
    return {
        "pre": L.init_dense(r_pre, half, filter_channels),
        "convs": L.init_ddsconv(r_dds, filter_channels, kernel_size, SDP_DDS_LAYERS),
        "proj": L.init_dense(rng, filter_channels, half * (SDP_NUM_BINS * 3 - 1), zero=True),
    }


def conv_flow_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    kernel_size: int,
    g: Optional[jnp.ndarray] = None,
    reverse: bool = False,
    dtype=jnp.float32,
):
    """x: (B, T, 2). Spline-coupling flow on the second channel half.

    `dtype` is the compute dtype of the conditioning stack (pre /
    DDSConv / proj) only — the flow state and the spline itself stay
    float32 (the rational-quadratic division chains are
    precision-critical). Serving passes bfloat16 under
    precision="fast"; training and parity keep the float32 default.
    """
    half = x.shape[-1] // 2
    filter_channels = p["pre"]["w"].shape[-1]
    x0, x1 = x[..., :half], x[..., half:]
    h = L.dense(p["pre"], x0.astype(dtype))
    h = L.ddsconv_apply(p["convs"], h, x_mask.astype(dtype), kernel_size=kernel_size, g=g)
    h = (L.dense(p["proj"], h).astype(jnp.float32)) * x_mask  # (B, T, half*(3K-1))

    b, t, _ = x0.shape
    h = h.reshape(b, t, half, SDP_NUM_BINS * 3 - 1)
    denom = math.sqrt(filter_channels)
    uw = h[..., :SDP_NUM_BINS] / denom
    uh = h[..., SDP_NUM_BINS : 2 * SDP_NUM_BINS] / denom
    ud = h[..., 2 * SDP_NUM_BINS :]

    x1_new, logabsdet = rational_quadratic_spline(
        x1, uw, uh, ud, inverse=reverse, tail_bound=SDP_TAIL_BOUND
    )
    x = jnp.concatenate([x0, x1_new], axis=-1) * x_mask
    logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
    if not reverse:
        return x, logdet
    return x


# ---------------------------------------------------------------------------
# StochasticDurationPredictor
# ---------------------------------------------------------------------------


def init_sdp(rng, cfg: ModelConfig) -> Params:
    # filter_channels is forced to in_channels (models.py:25)
    in_ch = cfg.hidden_channels
    filt = in_ch
    ks = cfg.kernel_size
    rngs = jax.random.split(rng, 8 + 2 * SDP_N_FLOWS)
    p: Params = {
        "pre": L.init_dense(rngs[0], in_ch, filt),
        "proj": L.init_dense(rngs[1], filt, filt),
        "convs": L.init_ddsconv(rngs[2], filt, ks, SDP_DDS_LAYERS),
        "flows": {
            "affine": L.init_elementwise_affine(2),
            "conv_flows": [
                init_conv_flow(rngs[3 + i], 2, filt, ks) for i in range(SDP_N_FLOWS)
            ],
        },
        "post_pre": L.init_dense(rngs[3 + SDP_N_FLOWS], 1, filt),
        "post_proj": L.init_dense(rngs[4 + SDP_N_FLOWS], filt, filt),
        "post_convs": L.init_ddsconv(rngs[5 + SDP_N_FLOWS], filt, ks, SDP_DDS_LAYERS),
        "post_flows": {
            "affine": L.init_elementwise_affine(2),
            "conv_flows": [
                init_conv_flow(rngs[6 + SDP_N_FLOWS + i], 2, filt, ks)
                for i in range(4)
            ],
        },
    }
    if cfg.gin_channels:
        p["cond"] = L.init_dense(rngs[-1], cfg.gin_channels, filt)
    return p


def _sdp_context(
    p: Params, x: jnp.ndarray, x_mask: jnp.ndarray, *, kernel_size: int,
    g: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Shared conditioning stack (models.py:64-70). x is detached by the
    caller during training."""
    x = L.dense(p["pre"], x)
    if g is not None:
        x = x + L.dense(p["cond"], g[:, None, :])
    x = L.ddsconv_apply(p["convs"], x, x_mask, kernel_size=kernel_size)
    return L.dense(p["proj"], x) * x_mask


def sdp_reverse(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    noise_w: jnp.ndarray,
    noise: jnp.ndarray,
    g: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sample log-durations (models.py:108-117).

    x: (B, T, H) text-encoder hidden (pre-condition); noise: (B, T, 2)
    standard normal; noise_w: scalar noise scale; g: (B, gin) speaker
    embedding.
    Returns logw (B, T, 1).

    `dtype` is the compute dtype of the conditioning convnets (the
    context stack and each ConvFlow's DDSConv) — serving passes
    bfloat16 under precision="fast" for MXU throughput. The flow
    state, the splines, and the final logw stay float32 regardless
    (see module docstring); training/parity use the float32 default.
    """
    x = x.astype(dtype)
    x_mask = x_mask.astype(jnp.float32)
    if g is not None:
        g = g.astype(dtype)
    h = _sdp_context(
        p, x, x_mask.astype(dtype), kernel_size=cfg.kernel_size, g=g
    )
    z = noise.astype(jnp.float32) * noise_w

    # reversed(flows)[:-2] + [last] == Flip,CF4,Flip,CF3,Flip,CF2,Flip,EA
    # (models.py:109-110: one unused ConvFlow+Flip pair is dropped).
    for cf in p["flows"]["conv_flows"][:0:-1]:  # CF4, CF3, CF2
        z = L.flip_channels(z)
        z = conv_flow_apply(
            cf, z, x_mask, kernel_size=cfg.kernel_size, g=h, reverse=True,
            dtype=dtype,
        )
    z = L.flip_channels(z)
    z = L.elementwise_affine(p["flows"]["affine"], z, x_mask, reverse=True)
    logw = z[..., 0:1]
    return logw


def sdp_forward_nll(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    w: jnp.ndarray,
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray],
    rng,
) -> jnp.ndarray:
    """Training NLL of durations w (B, T, 1) (models.py:72-107).

    Returns per-example nll + logq, shape (B,).
    """
    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    if g is not None:
        g = jax.lax.stop_gradient(g)
    x_mask = x_mask.astype(jnp.float32)
    w = w.astype(jnp.float32)
    h = _sdp_context(p, x, x_mask, kernel_size=cfg.kernel_size, g=g)

    # Posterior flows (variational dequantization of integer durations).
    h_w = L.dense(p["post_pre"], w)
    h_w = L.ddsconv_apply(p["post_convs"], h_w, x_mask, kernel_size=cfg.kernel_size)
    h_w = L.dense(p["post_proj"], h_w) * x_mask

    e_q = jax.random.normal(rng, (x.shape[0], x.shape[1], 2), jnp.float32) * x_mask
    z_q = e_q
    logdet_tot_q = jnp.zeros((x.shape[0],), jnp.float32)
    # post_flows applied in forward order: EA, then 4x(CF, Flip)
    z_q, ld = L.elementwise_affine(p["post_flows"]["affine"], z_q, x_mask, reverse=False)
    logdet_tot_q += ld
    for cf in p["post_flows"]["conv_flows"]:
        z_q, ld = conv_flow_apply(
            cf, z_q, x_mask, kernel_size=cfg.kernel_size, g=(h + h_w), reverse=False
        )
        logdet_tot_q += ld
        z_q = L.flip_channels(z_q)

    z_u, z1 = z_q[..., 0:1], z_q[..., 1:2]
    u = jax.nn.sigmoid(z_u) * x_mask
    z0 = (w - u) * x_mask
    logdet_tot_q += jnp.sum(
        (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask, axis=(1, 2)
    )
    logq = (
        jnp.sum(-0.5 * (math.log(2 * math.pi) + jnp.square(e_q)) * x_mask, axis=(1, 2))
        - logdet_tot_q
    )

    # Main flows forward: Log, EA, 4x(CF, Flip)
    logdet_tot = jnp.zeros((x.shape[0],), jnp.float32)
    z0_log = jnp.log(jnp.clip(z0, min=1e-5)) * x_mask
    logdet_tot += jnp.sum(-z0_log, axis=(1, 2))
    z = jnp.concatenate([z0_log, z1], axis=-1)
    z, ld = L.elementwise_affine(p["flows"]["affine"], z, x_mask, reverse=False)
    logdet_tot += ld
    for cf in p["flows"]["conv_flows"]:
        z, ld = conv_flow_apply(
            cf, z, x_mask, kernel_size=cfg.kernel_size, g=h, reverse=False
        )
        logdet_tot += ld
        z = L.flip_channels(z)
    nll = (
        jnp.sum(0.5 * (math.log(2 * math.pi) + jnp.square(z)) * x_mask, axis=(1, 2))
        - logdet_tot
    )
    return nll + logq


# ---------------------------------------------------------------------------
# Deterministic DurationPredictor (models.py:120-165)
# ---------------------------------------------------------------------------


def init_dp(rng, cfg: ModelConfig, filter_channels: int = 256) -> Params:
    rngs = jax.random.split(rng, 4)
    p: Params = {
        "conv1": L.init_conv(rngs[0], cfg.kernel_size, cfg.hidden_channels, filter_channels),
        "norm1": L.init_layer_norm(filter_channels),
        "conv2": L.init_conv(rngs[1], cfg.kernel_size, filter_channels, filter_channels),
        "norm2": L.init_layer_norm(filter_channels),
        "proj": L.init_dense(rngs[2], filter_channels, 1),
    }
    if cfg.gin_channels:
        p["cond"] = L.init_dense(rngs[3], cfg.gin_channels, cfg.hidden_channels)
    return p


def dp_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
    rng=None,
) -> jnp.ndarray:
    x = jax.lax.stop_gradient(x)
    if g is not None:
        x = x + L.dense(p["cond"], jax.lax.stop_gradient(g)[:, None, :])
    pad = cfg.kernel_size // 2
    x = L.conv(p["conv1"], x * x_mask, padding=pad)
    x = jnp.maximum(x, 0)
    x = L.layer_norm(p["norm1"], x)
    x = L.maybe_dropout(x, 0.5, rng)
    x = L.conv(p["conv2"], x * x_mask, padding=pad)
    x = jnp.maximum(x, 0)
    x = L.layer_norm(p["norm2"], x)
    x = L.maybe_dropout(x, 0.5, rng)
    x = L.dense(p["proj"], x * x_mask)
    return x * x_mask

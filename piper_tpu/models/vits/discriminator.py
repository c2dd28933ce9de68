"""Multi-period + scale discriminators (training only).

Parity: reference MultiPeriodDiscriminator / DiscriminatorP /
DiscriminatorS (models.py:378-519): one 1D-conv scale discriminator
plus period-{2,3,5,7,11} 2D-conv discriminators over reshaped audio.

Layout: audio (B, T) -> DiscriminatorP reshapes to
(B, T/p, p, 1) NHWC — period on the W axis, conv strides over H
(time), matching the reference's (B, 1, T/p, p) NCHW with (k, 1)
kernels. Weight norm is folded at load; fresh init keeps plain
kernels (weight norm's effect at init is identity).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ...ops import nn as tnn
from . import layers as L

Params = Dict[str, Any]

PERIODS = (2, 3, 5, 7, 11)
LRELU_SLOPE = 0.1


def _conv2d(p: Params, x: jnp.ndarray, *, stride: Tuple[int, int], padding) -> jnp.ndarray:
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(out.dtype)


def _init_conv2d(rng, kh, kw, c_in, c_out) -> Params:
    import math

    fan_in = c_in * kh * kw
    bound = math.sqrt(3.0) / math.sqrt(fan_in)
    r_w, r_b = jax.random.split(rng)
    w = jax.random.uniform(r_w, (kh, kw, c_in, c_out), jnp.float32, -bound, bound)
    bb = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(r_b, (c_out,), jnp.float32, -bb, bb)
    return {"w": w, "b": b}


def init_discriminator_p(rng) -> Params:
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    rngs = jax.random.split(rng, len(chans) + 1)
    return {
        "convs": [
            _init_conv2d(rngs[i], 5, 1, ci, co) for i, (ci, co) in enumerate(chans)
        ],
        "conv_post": _init_conv2d(rngs[-1], 3, 1, 1024, 1),
    }


def discriminator_p_apply(p: Params, y: jnp.ndarray, period: int):
    """y: (B, T). Returns (logits flat, fmaps)."""
    b, t = y.shape
    if t % period != 0:
        n_pad = period - (t % period)
        y = jnp.pad(y, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = y.reshape(b, t // period, period, 1)  # NHWC

    fmap: List[jnp.ndarray] = []
    for i, cp in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        x = _conv2d(cp, x, stride=stride, padding=[(2, 2), (0, 0)])
        x = tnn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d(p["conv_post"], x, stride=(1, 1), padding=[(1, 1), (0, 0)])
    fmap.append(x)
    return x.reshape(b, -1), fmap


def init_discriminator_s(rng) -> Params:
    # (c_in, c_out, k, stride, groups, pad)
    spec = [
        (1, 16, 15, 1, 1, 7),
        (16, 64, 41, 4, 4, 20),
        (64, 256, 41, 4, 16, 20),
        (256, 1024, 41, 4, 64, 20),
        (1024, 1024, 41, 4, 256, 20),
        (1024, 1024, 5, 1, 1, 2),
    ]
    rngs = jax.random.split(rng, len(spec) + 1)
    return {
        "convs": [
            L.init_conv(rngs[i], k, ci, co, groups=g)
            for i, (ci, co, k, s, g, pd) in enumerate(spec)
        ],
        "conv_post": L.init_conv(rngs[-1], 3, 1024, 1),
    }


_S_SPEC = [
    (1, 16, 15, 1, 1, 7),
    (16, 64, 41, 4, 4, 20),
    (64, 256, 41, 4, 16, 20),
    (256, 1024, 41, 4, 64, 20),
    (1024, 1024, 41, 4, 256, 20),
    (1024, 1024, 5, 1, 1, 2),
]


def discriminator_s_apply(p: Params, y: jnp.ndarray):
    x = y[:, :, None]  # (B, T, 1)
    fmap: List[jnp.ndarray] = []
    for cp, (ci, co, k, s, g, pd) in zip(p["convs"], _S_SPEC):
        x = L.conv(cp, x, padding=pd, stride=s, groups=g)
        x = tnn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = L.conv(p["conv_post"], x, padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init_mpd(rng) -> Params:
    rngs = jax.random.split(rng, len(PERIODS) + 1)
    return {
        "disc_s": init_discriminator_s(rngs[0]),
        "disc_p": [init_discriminator_p(r) for r in rngs[1:]],
    }


def mpd_apply(p: Params, y: jnp.ndarray, y_hat: jnp.ndarray):
    """Run all discriminators on real and generated audio (B, T).

    Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs) like the reference.
    """
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    r, f = discriminator_s_apply(p["disc_s"], y)
    g, fg = discriminator_s_apply(p["disc_s"], y_hat)
    y_d_rs.append(r)
    y_d_gs.append(g)
    fmap_rs.append(f)
    fmap_gs.append(fg)
    for dp, period in zip(p["disc_p"], PERIODS):
        r, f = discriminator_p_apply(dp, y, period)
        g, fg = discriminator_p_apply(dp, y_hat, period)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(f)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# VITS2 duration discriminator (arXiv:2307.16430 §2.2 — beyond the
# reference, which trains durations with likelihood/MSE only).
#
# Per-position real/fake judgement on (text-encoder hidden, log-duration)
# pairs: the generator's duration predictor is additionally trained to
# fool this discriminator, sharpening predicted durations toward the
# MAS-alignment distribution.
# ---------------------------------------------------------------------------


def init_dur_disc(rng, hidden_channels: int, filter_channels: int = 256) -> Params:
    rngs = jax.random.split(rng, 5)
    return {
        "pre_dur": L.init_dense(rngs[0], 1, filter_channels),
        "pre_x": L.init_dense(rngs[1], hidden_channels, filter_channels),
        "conv1": L.init_conv(rngs[2], 3, 2 * filter_channels, filter_channels),
        "norm1": L.init_layer_norm(filter_channels),
        "conv2": L.init_conv(rngs[3], 3, filter_channels, filter_channels),
        "norm2": L.init_layer_norm(filter_channels),
        "proj": L.init_dense(rngs[4], filter_channels, 1),
    }


def dur_disc_apply(
    p: Params,
    x: jnp.ndarray,  # (B, T, H) text hidden (caller stops gradients)
    logw: jnp.ndarray,  # (B, T, 1) log-durations (real: MAS; fake: predictor)
    x_mask: jnp.ndarray,  # (B, T, 1)
) -> jnp.ndarray:
    """Per-position logits (B, T, 1), masked."""
    h = jnp.concatenate(
        [L.dense(p["pre_x"], x), L.dense(p["pre_dur"], logw)], axis=-1
    )
    h = L.conv(p["conv1"], h * x_mask, padding=1)
    h = tnn.leaky_relu(h, LRELU_SLOPE)
    h = L.layer_norm(p["norm1"], h)
    h = L.conv(p["conv2"], h * x_mask, padding=1)
    h = tnn.leaky_relu(h, LRELU_SLOPE)
    h = L.layer_norm(p["norm2"], h)
    return L.dense(p["proj"], h) * x_mask

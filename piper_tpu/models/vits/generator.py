"""HiFiGAN generator (vocoder): frames -> waveform.

Parity: reference Generator (models.py:299-368) and ResBlock1/2
(modules.py:220-368). Weight norm is folded into plain kernels by the
weight loader (the reference removes it at export: export_onnx.py:51-52).

TPU-first details:
- Transposed convs run as input-dilated convolutions (MXU matmuls).
- A frame-validity mask is threaded through every stage and applied
  after each conv. With zero-masked inputs, padded positions are
  numerically identical to the reference's zero-padding of a shorter
  sequence, so batched synthesis of mixed lengths is bit-consistent
  with per-utterance synthesis (the masking reproduces "the sequence
  simply ends here").
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from ...ops import nn as tnn
from . import layers as L

Params = Dict[str, Any]

LRELU_SLOPE = 0.1


def _get_padding(kernel_size: int, dilation: int) -> int:
    return (kernel_size * dilation - dilation) // 2


def init_resblock(rng, channels: int, kernel_size: int, dilations, resblock_type: str) -> Params:
    if resblock_type == "1":
        rngs = jax.random.split(rng, 2 * len(dilations))
        return {
            "convs1": [
                L.init_conv(rngs[2 * i], kernel_size, channels, channels, std=0.01)
                for i in range(len(dilations))
            ],
            "convs2": [
                L.init_conv(rngs[2 * i + 1], kernel_size, channels, channels, std=0.01)
                for i in range(len(dilations))
            ],
        }
    rngs = jax.random.split(rng, len(dilations))
    return {
        "convs": [
            L.init_conv(rngs[i], kernel_size, channels, channels, std=0.01)
            for i in range(len(dilations))
        ]
    }


def resblock_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: Optional[jnp.ndarray],
    *,
    kernel_size: int,
    dilations,
    resblock_type: str,
) -> jnp.ndarray:
    def mask(v):
        return v if x_mask is None else v * x_mask

    if resblock_type == "1":
        for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
            xt = mask(tnn.leaky_relu(x, LRELU_SLOPE))
            xt = L.conv(c1, xt, padding=_get_padding(kernel_size, d), dilation=d)
            xt = mask(tnn.leaky_relu(xt, LRELU_SLOPE))
            xt = L.conv(c2, xt, padding=_get_padding(kernel_size, 1), dilation=1)
            x = xt + x
    else:
        for c, d in zip(p["convs"], dilations):
            xt = mask(tnn.leaky_relu(x, LRELU_SLOPE))
            xt = L.conv(c, xt, padding=_get_padding(kernel_size, d), dilation=d)
            x = xt + x
    return mask(x)


def init_generator(rng, cfg: ModelConfig) -> Params:
    rngs = jax.random.split(rng, 3 + len(cfg.upsample_rates))
    uic = cfg.upsample_initial_channel
    p: Params = {
        "conv_pre": L.init_conv(rngs[0], 7, cfg.inter_channels, uic),
        "ups": [],
        "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_in = uic // (2**i)
        c_out = uic // (2 ** (i + 1))
        # weight-normed ConvTranspose1d, init normal(0, 0.01)
        r_w, r_b = jax.random.split(rngs[1 + i])
        w = 0.01 * jax.random.normal(r_w, (k, c_in, c_out))
        import math as _math

        bound = 1.0 / _math.sqrt(c_in * k)
        b = jax.random.uniform(r_b, (c_out,), jnp.float32, -bound, bound)
        p["ups"].append({"w": w, "b": b})
        blocks = []
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            blocks.append(
                init_resblock(
                    jax.random.fold_in(rngs[1 + i], 1000 + j), c_out, rk, rd,
                    cfg.resblock,
                )
            )
        p["resblocks"].append(blocks)
    final_ch = uic // (2 ** len(cfg.upsample_rates))
    p["conv_post"] = L.init_conv(rngs[-2], 7, final_ch, 1, bias=False)
    if cfg.gin_channels:
        p["cond"] = L.init_dense(rngs[-1], cfg.gin_channels, uic)
    return p


def generator_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: Optional[jnp.ndarray],
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x: (B, T_frames, C) latent; returns (B, T_frames * prod(rates)).

    x is expected pre-masked (reference masks z before dec:
    models.py:720).
    """
    x = L.conv(p["conv_pre"], x, padding=3)
    if g is not None:
        x = x + L.dense(p["cond"], g[:, None, :])
    if x_mask is not None:
        x = x * x_mask

    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = tnn.leaky_relu(x, LRELU_SLOPE)
        x = tnn.conv1d_transpose(
            x, p["ups"][i]["w"], p["ups"][i]["b"], stride=u, padding=(k - u) // 2
        )
        if x_mask is not None:
            x_mask = jnp.repeat(x_mask, u, axis=1)
            x = x * x_mask
        xs = None
        for j in range(num_kernels):
            r = resblock_apply(
                p["resblocks"][i][j],
                x,
                x_mask,
                kernel_size=cfg.resblock_kernel_sizes[j],
                dilations=cfg.resblock_dilation_sizes[j],
                resblock_type=cfg.resblock,
            )
            xs = r if xs is None else xs + r
        x = xs / num_kernels
    # torch F.leaky_relu default slope 0.01 here (models.py:364)
    x = tnn.leaky_relu(x, 0.01)
    x = L.conv(p["conv_post"], x, padding=3)
    x = jnp.tanh(x)
    if x_mask is not None:
        x = x * x_mask
    return x[..., 0]  # (B, T_samples)

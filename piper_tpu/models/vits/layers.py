"""Shared VITS building blocks: dense (1x1 conv), conv, WN, DDSConv.

Parameter convention: each layer is a dict of jnp arrays. 1x1
convolutions are stored as dense matrices (in, out) and executed as
matmuls on the MXU; k>1 convolutions store kernels as (k, in/groups,
out) per ops/nn.py.

Parity targets cited per class against
/root/reference/src/python/piper_train/vits/modules.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...ops import nn as tnn

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initializers (torch-equivalent distributions)
# ---------------------------------------------------------------------------


def _kaiming_uniform_conv(rng, k, c_in, c_out, groups=1):
    """torch.nn.Conv1d default init: kaiming_uniform(a=sqrt(5))."""
    fan_in = (c_in // groups) * k
    bound = 1.0 / math.sqrt(fan_in) * math.sqrt(3.0)
    w_rng, b_rng = jax.random.split(rng)
    w = jax.random.uniform(
        w_rng, (k, c_in // groups, c_out), jnp.float32, -bound, bound
    )
    b_bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(b_rng, (c_out,), jnp.float32, -b_bound, b_bound)
    return w, b


def init_dense(rng, c_in: int, c_out: int, *, zero: bool = False) -> Params:
    if zero:
        return {"w": jnp.zeros((c_in, c_out)), "b": jnp.zeros((c_out,))}
    w, b = _kaiming_uniform_conv(rng, 1, c_in, c_out)
    return {"w": w[0], "b": b}


def init_conv(
    rng, k: int, c_in: int, c_out: int, *, groups: int = 1, zero: bool = False,
    std: Optional[float] = None, bias: bool = True,
) -> Params:
    if zero:
        w = jnp.zeros((k, c_in // groups, c_out))
        b = jnp.zeros((c_out,))
    elif std is not None:
        # HiFiGAN init_weights: normal(0, 0.01) (commons.py:11-14)
        w_rng, b_rng = jax.random.split(rng)
        w = std * jax.random.normal(w_rng, (k, c_in // groups, c_out))
        fan_in = (c_in // groups) * k
        bound = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(b_rng, (c_out,), jnp.float32, -bound, bound)
    else:
        w, b = _kaiming_uniform_conv(rng, k, c_in, c_out, groups)
    p = {"w": w}
    if bias:
        p["b"] = b
    return p


def init_layer_norm(channels: int) -> Params:
    return {"gamma": jnp.ones((channels,)), "beta": jnp.zeros((channels,))}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv as matmul: (B, T, Cin) @ (Cin, Cout) + b."""
    out = jnp.einsum("btc,cd->btd", x, p["w"].astype(x.dtype))
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def conv(
    p: Params,
    x: jnp.ndarray,
    *,
    padding: int = 0,
    dilation: int = 1,
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    return tnn.conv1d(
        x, p["w"], p.get("b"), stride=stride, padding=padding,
        dilation=dilation, groups=groups,
    )


def layer_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return tnn.layer_norm(x, p["gamma"], p["beta"])


def maybe_dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Dropout only when an rng is provided (training)."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# WN — WaveNet-style gated residual stack (modules.py:132-209)
# ---------------------------------------------------------------------------


def init_wn(
    rng,
    hidden: int,
    kernel_size: int,
    dilation_rate: int,
    n_layers: int,
    gin_channels: int = 0,
) -> Params:
    rngs = jax.random.split(rng, 2 * n_layers + 1)
    p: Params = {"in_layers": [], "res_skip_layers": []}
    for i in range(n_layers):
        p["in_layers"].append(
            init_conv(rngs[2 * i], kernel_size, hidden, 2 * hidden)
        )
        res_skip_ch = 2 * hidden if i < n_layers - 1 else hidden
        p["res_skip_layers"].append(init_dense(rngs[2 * i + 1], hidden, res_skip_ch))
    if gin_channels:
        p["cond_layer"] = init_dense(rngs[-1], gin_channels, 2 * hidden * n_layers)
    return p


def wn_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    kernel_size: int,
    dilation_rate: int,
    g: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """x: (B, T, H) masked input; g: (B, gin) speaker embedding."""
    hidden = x.shape[-1]
    n_layers = len(p["in_layers"])
    output = jnp.zeros_like(x)
    g_all = dense(p["cond_layer"], g[:, None, :]) if g is not None else None

    for i in range(n_layers):
        dilation = dilation_rate**i
        pad = (kernel_size * dilation - dilation) // 2
        x_in = conv(p["in_layers"][i], x, padding=pad, dilation=dilation)
        g_l = (
            g_all[..., i * 2 * hidden : (i + 1) * 2 * hidden]
            if g_all is not None
            else None
        )
        acts = tnn.fused_gated_activation(x_in, g_l)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            acts = maybe_dropout(acts, dropout_rate, sub)
        res_skip = dense(p["res_skip_layers"][i], acts)
        if i < n_layers - 1:
            x = (x + res_skip[..., :hidden]) * x_mask
            output = output + res_skip[..., hidden:]
        else:
            output = output + res_skip
    return output * x_mask


# ---------------------------------------------------------------------------
# DDSConv — dilated depth-separable conv stack (modules.py:81-129)
# ---------------------------------------------------------------------------


def init_ddsconv(rng, channels: int, kernel_size: int, n_layers: int) -> Params:
    rngs = jax.random.split(rng, 2 * n_layers)
    p: Params = {"convs_sep": [], "convs_1x1": [], "norms_1": [], "norms_2": []}
    for i in range(n_layers):
        p["convs_sep"].append(
            init_conv(rngs[2 * i], kernel_size, channels, channels, groups=channels)
        )
        p["convs_1x1"].append(init_dense(rngs[2 * i + 1], channels, channels))
        p["norms_1"].append(init_layer_norm(channels))
        p["norms_2"].append(init_layer_norm(channels))
    return p


def ddsconv_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    kernel_size: int,
    g: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """x, g: (B, T, C). Residual stack of depthwise+pointwise convs."""
    channels = x.shape[-1]
    if g is not None:
        x = x + g
    for i in range(len(p["convs_sep"])):
        dilation = kernel_size**i
        pad = (kernel_size * dilation - dilation) // 2
        y = conv(
            p["convs_sep"][i], x * x_mask, padding=pad, dilation=dilation,
            groups=channels,
        )
        y = layer_norm(p["norms_1"][i], y)
        y = tnn.gelu(y)
        y = dense(p["convs_1x1"][i], y)
        y = layer_norm(p["norms_2"][i], y)
        y = tnn.gelu(y)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            y = maybe_dropout(y, dropout_rate, sub)
        x = x + y
    return x * x_mask


# ---------------------------------------------------------------------------
# Flow atoms (modules.py:371-409)
# ---------------------------------------------------------------------------


def flip_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Flip over the channel (last) axis (modules.py:384-391)."""
    return x[..., ::-1]


def init_elementwise_affine(channels: int) -> Params:
    return {"m": jnp.zeros((channels,)), "logs": jnp.zeros((channels,))}


def elementwise_affine(
    p: Params, x: jnp.ndarray, x_mask: jnp.ndarray, *, reverse: bool
):
    if not reverse:
        y = (p["m"] + jnp.exp(p["logs"]) * x) * x_mask
        logdet = jnp.sum(p["logs"] * x_mask, axis=(1, 2))
        return y, logdet
    return (x - p["m"]) * jnp.exp(-p["logs"]) * x_mask

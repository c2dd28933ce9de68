"""Core neural-net primitives in NWC layout.

Everything here operates on arrays shaped (batch, time, channels) —
channels on the TPU lane (last, 128-wide) axis, time on the sublane
axis. The reference (torch) uses NCW; the weight loader transposes
kernels once at load time so the hot path never permutes activations.

Weight conventions:
  conv1d kernel:            (width, in_channels // groups, out_channels)
  conv1d_transpose kernel:  (width, in_channels, out_channels)
  bias:                     (out_channels,)

Numerical parity targets (checked by tests against the reference torch
modules): torch.nn.Conv1d, torch.nn.ConvTranspose1d, modules.LayerNorm
(reference: src/python/piper_train/vits/modules.py:14-26).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NWC", "WIO", "NWC")


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: Union[int, Tuple[int, int], str] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """1D convolution over (B, T, C) input.

    `padding` may be an int (symmetric, torch-style), an explicit
    (left, right) tuple, or "SAME"/"VALID".
    """
    if isinstance(padding, int):
        pad: Union[str, Sequence[Tuple[int, int]]] = [(padding, padding)]
    elif isinstance(padding, tuple):
        pad = [padding]
    else:
        pad = padding
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv1d_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """Transposed 1D convolution matching torch.nn.ConvTranspose1d.

    Output length = (T - 1) * stride - 2 * padding + width.

    Implemented as an input-dilated (fractionally-strided) convolution:
    XLA lowers this to MXU matmuls. The kernel here is stored already
    flipped relative to torch's (in, out, k) layout — the weight loader
    performs `kernel = torch_w.permute(2, 0, 1)[::-1]` → (k, in, out) —
    so no flip happens at trace time.
    """
    width = kernel.shape[0]
    pad_l = width - 1 - padding
    pad_r = width - 1 - padding
    return conv1d(
        _dilate(x, stride),
        kernel,
        bias,
        stride=1,
        padding=(pad_l, pad_r),
    )


def conv1d_transpose_poly(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """conv1d_transpose as a polyphase sum of dense matmuls.

    The input-dilated formulation zero-stuffs the input by `stride`,
    so the MXU does stride-times redundant work on zeros. Polyphase
    decomposition instead computes output phase p of output frame s as
      y[s*u + p] = sum_j x[s - j] @ W_t[j*u + p + padding]
    — ceil(k/u)+1 dense (B·T, C_in) x (C_in, u·C_out) matmuls with no
    zeros (the wide early HiFiGAN stages where the Pallas packed
    weights don't fit VMEM; docs/ROADMAP.md #6). Numerically equal to
    conv1d_transpose up to float reassociation; requires the standard
    generator geometry t_out = t*u (i.e. k = 2*padding + u).

    `kernel` uses the same pre-flipped (k, in, out) layout as
    conv1d_transpose (W_t[w] = kernel[k-1-w]).
    """
    u = stride
    k, cin, cout = kernel.shape
    if (k - u) != 2 * padding:
        # Geometry without the t_out = t*u property: fall back.
        return conv1d_transpose(
            x, kernel, bias, stride=stride, padding=padding
        )
    b, t, _ = x.shape
    j_lo = -((padding + u - 1) // u)
    j_hi = (k - 1 - padding) // u
    y = None
    for j in range(j_lo, j_hi + 1):
        cols = []
        any_valid = False
        for p in range(u):
            w = j * u + p + padding
            if 0 <= w < k:
                cols.append(kernel[k - 1 - w])
                any_valid = True
            else:
                cols.append(jnp.zeros((cin, cout), kernel.dtype))
        if not any_valid:
            continue
        w_j = jnp.stack(cols, axis=1)  # (cin, u, cout)
        if j == 0:
            xs = x
        elif j > 0:
            xs = jnp.pad(x, ((0, 0), (j, 0), (0, 0)))[:, :t]
        else:
            xs = jnp.pad(x, ((0, 0), (0, -j), (0, 0)))[:, -j:]
        contrib = jnp.einsum(
            "btc,cuo->btuo", xs, w_j.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        y = contrib if y is None else y + contrib
    y = y.reshape(b, t * u, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _dilate(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Insert factor-1 zeros between time steps (lhs dilation)."""
    if factor == 1:
        return x
    b, t, c = x.shape
    out = jnp.zeros((b, t, factor, c), x.dtype)
    out = out.at[:, :, 0, :].set(x)
    # Trailing zeros beyond the last real sample are trimmed: torch's
    # transposed conv dilates to (t-1)*stride + 1 before padding.
    return out.reshape(b, t * factor, c)[:, : (t - 1) * factor + 1, :]


def layer_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the channel (last) axis, computed in f32.

    Parity: reference modules.LayerNorm (modules.py:14-26), which
    normalizes over channels in NCW by transposing — in NWC it is a
    plain last-axis layer norm.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(dtype)


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch F.gelu default (used by DDSConv)."""
    return jax.nn.gelu(x, approximate=False)


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length, 1) float mask.

    Parity: reference commons.sequence_mask (commons.py:109-113), with
    the trailing channel axis pre-added for NWC broadcasting.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    mask = pos[None, :] < lengths[:, None]
    return mask[..., None]


def fused_gated_activation(x_in: jnp.ndarray, g: Optional[jnp.ndarray]) -> jnp.ndarray:
    """tanh/sigmoid gate of a 2C-channel pre-activation (WaveNet gate).

    Parity: commons.fused_add_tanh_sigmoid_multiply (commons.py:99-106).
    x_in, g: (B, T, 2C) -> (B, T, C). XLA fuses this elementwise chain
    into the producing conv.
    """
    if g is not None:
        x_in = x_in + g
    c = x_in.shape[-1] // 2
    return jnp.tanh(x_in[..., :c]) * jax.nn.sigmoid(x_in[..., c:])

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


# ---------------------------------------------------------------------------
# Time-major fast path (TPU serving)
#
# The XLA NWC path above keeps channels on the 128-lane axis; the late
# HiFiGAN stages have 32-64 channels, so every conv pads lanes 2-4x and
# the stage runs ~5x off bandwidth speed-of-light (measured 63 ms for
# the medium-voice final MRF stage at batch 32 x 196k samples on v5e).
# This path runs the whole generator time-major (B, C, T):
#   - the MRF residual stacks use the fused Pallas kernel
#     (ops/pallas/vocoder.py): 63 -> 13 ms on that stage;
#   - each ConvTranspose1d is decomposed into its u polyphase dense
#     convs (out[u*v + p] = sum_q Wp[q]^T x[v+q]), computed as
#     time-major shift-matmuls and interleaved with a stack+reshape
#     (u-minor axis merge — no transpose);
#   - conv_post (C -> 1, k=7) is a sum of 7 shifted dot products.
# End to end on the medium voice: 87 -> 44 ms (batch 32 x 768 frames).
# Exactness: per-row compute is batch-size-invariant, and invalid
# (padded) positions are zeroed through the Pallas kernel's length
# masking, matching the reference's x_mask semantics
# (tests/test_pallas_vocoder.py::test_generator_tm_matches_xla).
# ---------------------------------------------------------------------------


def _tm_phase_plan(k: int, u: int):
    """Static polyphase plan for one ConvTranspose1d stage.

    With the pre-flipped (k, c_in, c_out) kernel and the input-dilated
    formulation (conv1d_transpose above), output t = u*v + p is
    out[t] = sum over taps idx = u*q + (k-1-P-p) in [0, k) of
    K[idx]^T x[v + q]. Returns (q0, used, idx): tap offsets start at
    q0, `used[p, qi]` marks real taps, `idx[p, qi]` the kernel row.
    """
    import numpy as np

    pad = (k - u) // 2
    nq = -(-k // u) + 1
    q0 = -1
    used = np.zeros((u, nq), bool)
    idx = np.zeros((u, nq), np.int32)
    for p in range(u):
        base = k - 1 - pad - p
        for qi in range(nq):
            t = u * (q0 + qi) + base
            if 0 <= t < k:
                used[p, qi] = True
                idx[p, qi] = t
    return q0, used, idx


def prepare_tm(dec_params: Params, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    """Host-side derived weights for the time-major path: per-stage
    polyphase upsample tables (u, nq, c_in, c_out) and packed MRF
    weights for the Pallas kernel. Pure reshuffles of dec params —
    attach as `params['dec_tm']` so they flow through jit normally."""
    import numpy as np

    from ...ops.pallas.vocoder import pack_stage_weights

    ks = tuple(cfg.resblock_kernel_sizes)
    ds = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
    start = _tm_start_stage(cfg)
    ups = []
    mrf = []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        if i < start:
            # stage runs in NWC XLA (see generator_tm_apply); no
            # derived weights needed
            ups.append(None)
            mrf.append(None)
            continue
        kern = np.asarray(dec_params["ups"][i]["w"], np.float32)
        q0, used, idx = _tm_phase_plan(k, u)
        w = np.zeros(used.shape + kern.shape[1:], np.float32)
        for p in range(used.shape[0]):
            for qi in range(used.shape[1]):
                if used[p, qi]:
                    w[p, qi] = kern[idx[p, qi]]
        ups.append(jnp.asarray(w, dtype))
        mrf.append(
            pack_stage_weights(
                dec_params["resblocks"][i], ks, ds, cfg.resblock, dtype=dtype
            )
        )
    return {"ups": ups, "mrf": mrf}


def _tm_start_stage(cfg: ModelConfig) -> int:
    """First upsample stage to run time-major: the fused MRF kernel
    keeps its packed (n_convs, k_max, C, C) weights in VMEM, so wide
    early stages (e.g. the high voice's 256-ch stage 0, 26 MB packed)
    stay on the XLA NWC path, which is also faster there (channel dim
    fills the 128-lane axis)."""
    from ...ops.pallas.vocoder import mrf_weight_bytes

    uic = cfg.upsample_initial_channel
    for i in range(len(cfg.upsample_rates)):
        c_out = uic // (2 ** (i + 1))
        if (
            c_out <= 128
            and mrf_weight_bytes(
                c_out, cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes, cfg.resblock,
            )
            <= 8 * 1024 * 1024
        ):
            return i
    return len(cfg.upsample_rates)


def _fused_suffix_start(cfg: ModelConfig, start: int, esize: int = 2) -> int:
    """First stage of the trailing run that executes as chained fused
    phase-plane kernels (ops/pallas/vocoder.fused_upsample_mrf): the
    smallest f >= start such that every stage in [f, n) fits VMEM with
    its compound plane count at `esize` bytes/element. Returns n when
    no suffix qualifies."""
    from ...ops.pallas.vocoder import fused_stage_vmem_ok

    ks = cfg.resblock_kernel_sizes
    ds = cfg.resblock_dilation_sizes
    uic = cfg.upsample_initial_channel
    n = len(cfg.upsample_rates)
    for f in range(start, n):
        u_in = 1
        ok = True
        for j in range(f, n):
            u_j = cfg.upsample_rates[j]
            k_j = cfg.upsample_kernel_sizes[j]
            _, used_j, _ = _tm_phase_plan(k_j, u_j)
            if not fused_stage_vmem_ok(
                uic // (2 ** j), uic // (2 ** (j + 1)), u_j,
                used_j.shape[1], ks, ds, cfg.resblock, u_in=u_in,
                esize=esize,
            ):
                ok = False
                break
            u_in *= u_j
        if ok:
            return f
    return n


def _tconv_tm(x_tm, w_phase, q0, used, bias):
    """Polyphase time-major transposed conv: (B, C_in, V) -> (B, C_out, V*u).

    One einsum over the (phase, tap) axes: the nq shifted input views
    are shared by every phase, so stacking them once and contracting
    (tap, c_in) in a single (nq*C_in)-deep matmul replaces u*nq small
    einsums + a phase stack (w_phase holds zeros at unused taps). The
    output is emitted u-minor ("...vp") so the interleave is a free
    reshape, not a transpose — the old form was HBM-bound on u*nq
    separate full-tensor passes.
    """
    uph, nq = used.shape
    b, c_in, v = x_tm.shape
    segs = []
    for qi in range(nq):
        q = q0 + qi
        if q == 0:
            seg = x_tm
        elif q > 0:
            seg = jnp.pad(x_tm, ((0, 0), (0, 0), (0, q)))[:, :, q:]
        else:
            seg = jnp.pad(x_tm, ((0, 0), (0, 0), (-q, 0)))[:, :, :v]
        segs.append(seg)
    taps = jnp.stack(segs, axis=1)  # (B, nq, C_in, V): shared by phases
    out = jnp.einsum("pqio,bqiv->bovp", w_phase, taps)
    out = out.reshape(b, out.shape[1], v * uph)  # u-minor merge, no transpose
    return out + bias.astype(out.dtype)[None, :, None]


def generator_tm_apply(
    p: Params,
    tm: Params,
    x: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Time-major generator. x: (B, T_frames, C) pre-masked latent;
    frame_lengths: (B,) int32 valid frames. Returns (B, T*u_total)."""
    from ...ops.pallas.vocoder import fused_upsample_mrf, mrf_fused

    ks = tuple(cfg.resblock_kernel_sizes)
    ds = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
    start = _tm_start_stage(cfg)
    x = L.conv(p["conv_pre"], x, padding=3)
    if g is not None:
        x = x + L.dense(p["cond"], g[:, None, :])
    lens = frame_lengths.astype(jnp.int32)
    # Zero invalid frames (the reference applies x_mask here): leading
    # NWC stages and the first polyphase conv (reads one frame ahead,
    # q=+1) must see exact zeros past each row's end; later tm stages
    # are cleaned by the Pallas kernel's length masking.
    num_kernels = len(ks)
    mask = (
        jnp.arange(x.shape[1], dtype=jnp.int32)[None, :, None]
        < lens[:, None, None]
    ).astype(x.dtype)
    x = x * mask
    for i in range(start):
        # wide early stages: XLA NWC (channel dim fills the lanes; the
        # fused kernel's packed weights would not fit VMEM here). The
        # transposed conv runs polyphase — dense MXU matmuls, no
        # zero-stuffed dilation work (measured ~1 ms off the high
        # voice's generator; XLA handles the dilated form better than
        # its 8x nominal zero-work suggests).
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        x = tnn.leaky_relu(x, LRELU_SLOPE)
        x = tnn.conv1d_transpose_poly(
            x, p["ups"][i]["w"].astype(x.dtype), p["ups"][i]["b"],
            stride=u, padding=(k - u) // 2,
        )
        lens = lens * u
        mask = jnp.repeat(mask, u, axis=1)
        x = x * mask
        xs = None
        for j in range(num_kernels):
            r = resblock_apply(
                p["resblocks"][i][j], x, mask,
                kernel_size=ks[j], dilations=ds[j],
                resblock_type=cfg.resblock,
            )
            xs = r if xs is None else xs + r
        x = xs / num_kernels
    x = jnp.transpose(x, (0, 2, 1))  # (B, C, T)
    n_stages = len(cfg.upsample_rates)
    # Fused suffix: the trailing run of stages (incl. conv_post) executes
    # as chained phase-plane Pallas kernels — no interleave ever
    # materializes; stage j's sublane-plane output feeds stage j+1
    # directly, and only the final (B, U, V) waveform planes get a cheap
    # 2-bytes/sample XLA transpose. Static decision from cfg.
    fuse_from = _fused_suffix_start(cfg, start, jnp.dtype(x.dtype).itemsize)
    for i in range(start, fuse_from):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        q0, used, _ = _tm_phase_plan(k, u)
        x = tnn.leaky_relu(x, LRELU_SLOPE)
        x = _tconv_tm(x, tm["ups"][i], q0, used, p["ups"][i]["b"])
        lens = lens * u
        pw, pb = tm["mrf"][i]
        x = mrf_fused(
            x, lens, pw, pb, kernel_sizes=ks, dilation_sizes=ds,
            resblock_type=cfg.resblock, interpret=interpret,
        )
    if fuse_from < n_stages:
        b = x.shape[0]
        v_frames = x.shape[2]
        lens_f = lens  # valid samples at suffix-entry resolution
        u_in = 1
        for j in range(fuse_from, n_stages):
            u, k = cfg.upsample_rates[j], cfg.upsample_kernel_sizes[j]
            q0, _, _ = _tm_phase_plan(k, u)
            pw, pb = tm["mrf"][j]
            post = j == n_stages - 1
            x = fused_upsample_mrf(
                x, lens_f * (u * u_in), tm["ups"][j], p["ups"][j]["b"],
                pw, pb, p["conv_post"]["w"] if post else None,
                u=u, u_in=u_in, q0=q0, kernel_sizes=ks, dilation_sizes=ds,
                resblock_type=cfg.resblock, post=post, interpret=interpret,
            )
            u_in = u * u_in
        vpad = x.shape[2]
        wav = jnp.transpose(x, (0, 2, 1)).reshape(b, vpad * u_in)
        return wav[:, : v_frames * u_in]
    x = tnn.leaky_relu(x, 0.01)
    kp = p["conv_post"]["w"].astype(x.dtype)  # (7, C, 1)
    v = x.shape[2]
    acc = None
    for tau in range(kp.shape[0]):
        sh = tau - (kp.shape[0] - 1) // 2
        if sh == 0:
            seg = x
        elif sh > 0:
            seg = jnp.pad(x, ((0, 0), (0, 0), (0, sh)))[:, :, sh:]
        else:
            seg = jnp.pad(x, ((0, 0), (0, 0), (-sh, 0)))[:, :, :v]
        t = jnp.einsum("i,biv->bv", kp[tau, :, 0], seg)
        acc = t if acc is None else acc + t
    return jnp.tanh(acc)  # (B, T_samples)


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

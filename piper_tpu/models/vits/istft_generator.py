"""MB-iSTFT vocoder: multi-band iSTFT generation head.

An alternative to the HiFiGAN generator (beyond reference parity; the
reference ships only HiFiGAN). Architecture follows Kawamura et al.
(MB-iSTFT-VITS, PAPERS.md): a shortened HiFiGAN stack (conv_pre + a
couple of upsample+MRF stages) predicts per-subband magnitude and
phase spectra; per-band inverse STFT plus a PQMF synthesis filterbank
produce the waveform. Total upsampling
  prod(upsample_rates) * istft_hop * subbands
must equal the mel hop (256 for medium: (4,4) * 4 * 4).

Why on TPU: the expensive final 8x/4x transposed-conv stages (the
HBM-bandwidth-bound tail of HiFiGAN) are replaced by an irfft (XLA
FFT) + static overlap-add + one small conv — roughly 4-8x less
vocoder compute per sample.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from ...ops import nn as tnn
from ...ops.istft import istft, pqmf_synthesis
from . import generator as G
from . import layers as L

Params = Dict[str, Any]


def init_mb_istft_generator(rng, cfg: ModelConfig) -> Params:
    """Parameter tree: reuses HiFiGAN's conv_pre/ups/resblocks init for
    the shortened stack + a spectral projection head."""
    p = G.init_generator(rng, cfg)
    final_ch = cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates))
    out_ch = cfg.subbands * (cfg.istft_n_fft + 2)
    r = jax.random.fold_in(rng, 777)
    p["conv_post"] = L.init_conv(r, 7, final_ch, out_ch)
    return p


def mb_istft_generator_apply(
    p: Params,
    x: jnp.ndarray,
    x_mask: Optional[jnp.ndarray],
    *,
    cfg: ModelConfig,
    g: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x: (B, T_frames, C) latent -> (B, T_frames * upsample_factor)."""
    n_bins = cfg.istft_n_fft // 2 + 1
    sub = cfg.subbands

    x = L.conv(p["conv_pre"], x, padding=3)
    if g is not None:
        x = x + L.dense(p["cond"], g[:, None, :])
    if x_mask is not None:
        x = x * x_mask

    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = tnn.leaky_relu(x, G.LRELU_SLOPE)
        x = tnn.conv1d_transpose(
            x, p["ups"][i]["w"], p["ups"][i]["b"], stride=u, padding=(k - u) // 2
        )
        if x_mask is not None:
            x_mask = jnp.repeat(x_mask, u, axis=1)
            x = x * x_mask
        xs = None
        for j in range(num_kernels):
            r = G.resblock_apply(
                p["resblocks"][i][j], x, x_mask,
                kernel_size=cfg.resblock_kernel_sizes[j],
                dilations=cfg.resblock_dilation_sizes[j],
                resblock_type=cfg.resblock,
            )
            xs = r if xs is None else xs + r
        x = xs / num_kernels
    x = tnn.leaky_relu(x, 0.01)
    spec = L.conv(p["conv_post"], x, padding=3)  # (B, T', sub*(n_fft+2))
    if x_mask is not None:
        spec = spec * x_mask

    b, t, _ = spec.shape
    spec = spec.reshape(b, t, sub, cfg.istft_n_fft + 2)
    log_mag = jnp.clip(spec[..., :n_bins], -12.0, 8.0)
    mag = jnp.exp(log_mag.astype(jnp.float32))
    phase = spec[..., n_bins:].astype(jnp.float32) * math.pi

    frame_mask = x_mask[:, :, 0] if x_mask is not None else None
    bands = []
    for s in range(sub):
        wav = istft(
            mag[:, :, s] * jnp.cos(phase[:, :, s]),
            mag[:, :, s] * jnp.sin(phase[:, :, s]),
            n_fft=cfg.istft_n_fft,
            hop_length=cfg.istft_hop,
            frame_mask=frame_mask,
        )  # (B, t * hop)
        bands.append(wav)
    band_sig = jnp.stack(bands, axis=-1)  # (B, t*hop, sub)
    if frame_mask is not None:
        # zero the OA spillover of the last valid frames so padded
        # rows equal solo synthesis (whose trim discards it)
        band_valid = jnp.repeat(frame_mask, cfg.istft_hop, axis=1)
        band_sig = band_sig * band_valid[..., None].astype(band_sig.dtype)
    audio = pqmf_synthesis(band_sig, sub)  # (B, t*hop*sub)
    audio = jnp.tanh(audio)
    if x_mask is not None:
        sample_mask = jnp.repeat(
            x_mask, cfg.istft_hop * sub, axis=1
        )[:, :, 0]
        audio = audio * sample_mask.astype(audio.dtype)
    return audio

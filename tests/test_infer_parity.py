"""End-to-end inference parity: full VITS infer vs the reference graph.

Injects identical gaussian noise into both graphs (the reference's
exported ONNX embeds RandomNormal ops; here we patch torch.randn /
randn_like) and asserts waveform allclose — the BASELINE.json parity
criterion (atol 1e-3) on random-weight voices.
"""

import contextlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits.model import (
    infer,
    synthesizer_decode,
    synthesizer_encode,
)
from piper_tpu.ops import nn as tnn
from piper_tpu.weights.torch_loader import params_from_state_dict

from reference_oracle import make_ref_synthesizer


@contextlib.contextmanager
def fixed_noise(dur_noise_nct, frame_noise_nct):
    """Patch torch RNG entry points used by SynthesizerTrn.infer
    (models.py:111 randn, models.py:718 randn_like)."""
    orig_randn, orig_like = torch.randn, torch.randn_like

    def randn(*shape, **kw):
        return torch.from_numpy(dur_noise_nct.copy())

    def randn_like(x, **kw):
        return torch.from_numpy(frame_noise_nct.copy())

    torch.randn, torch.randn_like = randn, randn_like
    try:
        yield
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like


def run_parity(cfg, seed, b=1, t=25, sid=None, atol=1e-3,
               model=None, params=None, ids=None, lengths=None):
    """model/params default to a random-init reference oracle; pass a
    (model, params) pair for trained-weight parity, and ids/lengths to
    use real phoneme sequences instead of random ones."""
    if model is None:
        model = make_ref_synthesizer(cfg, seed=seed)
        params = params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(seed)
    if ids is None:
        lengths = np.full((b,), t, np.int64)
        if b > 1:
            lengths[1:] = rng.integers(t // 2, t, b - 1)
        ids = rng.integers(0, cfg.num_symbols, (b, t))
        for i, l in enumerate(lengths):
            ids[i, l:] = 0
    else:
        b, t = ids.shape

    noise_scale, length_scale, noise_w = 0.667, 1.0, 0.8
    dur_noise = rng.standard_normal((b, 2, t)).astype(np.float32)

    # --- our encode stage (to learn the frame count) ---
    mask = np.asarray(tnn.sequence_mask(jnp.asarray(lengths), t), np.float32)
    enc = synthesizer_encode(
        params,
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)),
        cfg=cfg,
        noise_w_scale=jnp.float32(noise_w),
        length_scale=jnp.float32(length_scale),
        sid=jnp.asarray([sid] * b) if sid is not None else None,
        dur_noise=jnp.asarray(dur_noise.transpose(0, 2, 1)),
    )
    durations = np.asarray(enc.durations)
    t_y = int(durations.sum(axis=1).max())
    frame_noise_all = rng.standard_normal((b, cfg.inter_channels, t_y)).astype(
        np.float32
    )
    # Padded frames get zero noise so masking semantics are identical;
    # valid frames share noise with the per-utterance reference runs.
    frame_mask = (np.arange(t_y)[None, :] < durations.sum(1)[:, None])
    frame_noise = frame_noise_all * frame_mask[:, None, :]

    # --- reference infer, per utterance (batch=1, unpadded — exactly how
    # piper serves voices; our masked batch must match each solo run:
    # batch-size invariance) ---
    ref_audio_list = []
    for i in range(b):
        l = int(lengths[i])
        t_y_i = int(durations[i].sum())
        with torch.no_grad(), fixed_noise(
            dur_noise[i : i + 1, :, :l],
            frame_noise_all[i : i + 1, :, :t_y_i],
        ):
            o_ref, attn_ref, _, _ = model.infer(
                torch.from_numpy(ids[i : i + 1, :l]),
                torch.from_numpy(lengths[i : i + 1]),
                sid=torch.from_numpy(np.full((1,), sid)) if sid is not None else None,
                noise_scale=noise_scale,
                length_scale=length_scale,
                noise_scale_w=noise_w,
            )
        ref_dur = attn_ref.squeeze(1).sum(dim=1).numpy().astype(np.int32)
        np.testing.assert_array_equal(durations[i, :l], ref_dur[0])
        ref_audio_list.append(o_ref.numpy()[0, 0, :])

    audio, y_lengths = synthesizer_decode(
        params,
        enc,
        t_y,
        cfg=cfg,
        noise_scale=jnp.float32(noise_scale),
        sid=jnp.asarray([sid] * b) if sid is not None else None,
        frame_noise=jnp.asarray(frame_noise.transpose(0, 2, 1)),
    )
    audio = np.asarray(audio)

    u = cfg.upsample_factor
    for i in range(b):
        n = int(np.asarray(y_lengths)[i]) * u
        assert len(ref_audio_list[i]) == n
        np.testing.assert_allclose(
            audio[i, :n], ref_audio_list[i], atol=atol,
            err_msg=f"waveform mismatch utterance {i}",
        )
    # peak-normalized int16 comparison (the user-facing artifact,
    # reference util.py:5-12)
    for i in range(b):
        n = int(np.asarray(y_lengths)[i]) * u
        a, r = audio[i, :n], ref_audio_list[i]
        a16 = (a * (32767.0 / max(0.01, np.abs(a).max()))).clip(-32767, 32767).astype(np.int16)
        r16 = (r * (32767.0 / max(0.01, np.abs(r).max()))).clip(-32767, 32767).astype(np.int16)
        assert np.abs(a16.astype(np.int32) - r16.astype(np.int32)).max() <= 64


def test_infer_parity_medium():
    run_parity(ModelConfig(num_symbols=130), seed=10)


def test_infer_parity_x_low():
    run_parity(ModelConfig.for_quality("x-low", num_symbols=130), seed=11)


def test_infer_parity_batched():
    run_parity(ModelConfig(num_symbols=130), seed=12, b=3, t=20)


def test_infer_parity_multispeaker():
    cfg = ModelConfig(num_symbols=130, num_speakers=4, gin_channels=64)
    run_parity(cfg, seed=13, sid=2)


def test_fused_infer_matches_two_stage():
    cfg = ModelConfig(num_symbols=130)
    import jax

    model = make_ref_synthesizer(cfg, seed=20)
    params = params_from_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(20)
    b, t = 2, 15
    ids = jnp.asarray(rng.integers(0, cfg.num_symbols, (b, t)).astype(np.int32))
    lengths = jnp.asarray(np.array([15, 10], np.int32))
    key = jax.random.PRNGKey(0)

    audio, y_lengths = infer(
        params, ids, lengths, cfg=cfg, max_frames=256,
        noise_scale=jnp.float32(0.667), length_scale=jnp.float32(1.0),
        noise_w_scale=jnp.float32(0.8), rng=key,
    )
    assert audio.shape == (b, 256 * cfg.upsample_factor)
    assert int(y_lengths[0]) > 0
    # audio beyond each utterance's length is exactly zero (masked)
    for i in range(b):
        n = int(y_lengths[i]) * cfg.upsample_factor
        assert np.all(np.asarray(audio)[i, n:] == 0.0)
        assert np.abs(np.asarray(audio)[i, :n]).max() > 1e-4


def test_infer_parity_deterministic_dp():
    """use_sdp=False voices (plain DurationPredictor, models.py:120-165)."""
    cfg = ModelConfig(num_symbols=130, use_sdp=False)
    run_parity(cfg, seed=14)


def test_infer_parity_high_quality():
    cfg = ModelConfig.for_quality("high", num_symbols=130)
    run_parity(cfg, seed=15, t=18)

"""MB-iSTFT vocoder tests: signal ops (iSTFT COLA, PQMF
reconstruction), generator shape/mask semantics, end-to-end inference
and training."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.config import AudioConfig, ModelConfig
from piper_tpu.models.vits.model import infer, init_synthesizer_params
from piper_tpu.ops.istft import istft, pqmf_analysis, pqmf_synthesis
from piper_tpu.ops.stft import hann_window


def test_istft_reconstructs_cola_signal():
    """STFT -> iSTFT round trip on a known signal (hop=n_fft/4)."""
    n_fft, hop = 16, 4
    rng = np.random.default_rng(0)
    t_frames = 50
    sig = rng.standard_normal((1, t_frames * hop)).astype(np.float32)

    # forward frames with the same centering the iSTFT trims
    pad = (n_fft - hop) // 2
    padded = np.pad(sig, ((0, 0), (pad, pad)), mode="reflect")
    frames = np.stack(
        [padded[0, i * hop : i * hop + n_fft] for i in range(t_frames)]
    )
    spec = np.fft.rfft(frames * hann_window(n_fft), axis=-1)

    out = istft(
        jnp.asarray(spec.real[None].astype(np.float32)),
        jnp.asarray(spec.imag[None].astype(np.float32)),
        n_fft=n_fft, hop_length=hop,
    )
    out = np.asarray(out)[0]
    # interior reconstructs exactly (COLA); edges are affected by padding
    np.testing.assert_allclose(out[n_fft:-n_fft], sig[0, n_fft:-n_fft], atol=1e-4)


def test_pqmf_near_perfect_reconstruction():
    rng = np.random.default_rng(1)
    t = 4096
    sig = rng.standard_normal((1, t)).astype(np.float32) * 0.3
    bands = pqmf_analysis(jnp.asarray(sig), 4)
    assert bands.shape == (1, t // 4, 4)
    recon = np.asarray(pqmf_synthesis(bands, 4))[0]
    # group delay = taps-1 (analysis+synthesis); compare aligned interior
    delay = 62
    a = sig[0, delay:-delay]
    b = recon[delay + delay : len(a) + 2 * delay] if False else recon[2 * delay :2 * delay + len(a) - 2*delay]
    # align by cross-correlation to be robust to the exact group delay
    corr = np.correlate(recon, sig[0], mode="full")
    shift = int(np.argmax(corr)) - (len(sig[0]) - 1)
    aligned = recon[shift : shift + t] if shift >= 0 else None
    assert aligned is not None
    err = np.abs(aligned[200:-200] - sig[0, 200:-200])
    snr = 10 * np.log10(
        np.mean(sig[0, 200:-200] ** 2) / max(np.mean(err**2), 1e-12)
    )
    assert snr > 15, f"PQMF reconstruction SNR too low: {snr:.1f} dB"


def mb_cfg(**kw):
    base = ModelConfig(
        num_symbols=64,
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=1,
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(4, 4),
        upsample_initial_channel=64,
        upsample_kernel_sizes=(8, 8),
        vocoder="mb_istft",
        spec_channels=513,
        segment_size=4096,
        flow_n_layers=2,
        audio=AudioConfig(sample_rate=16000, filter_length=1024,
                          hop_length=256, win_length=1024, mel_channels=20),
        **kw,
    )
    return base


def test_upsample_factor():
    cfg = mb_cfg()
    assert cfg.upsample_factor == 4 * 4 * 4 * 4  # rates * hop * subbands
    full = ModelConfig.mb_istft("medium", num_symbols=256)
    assert full.upsample_factor == 256


def test_mb_istft_infer_end_to_end():
    cfg = mb_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 16
    ids = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)
    lengths = jnp.asarray([16, 10], jnp.int32)
    audio, y_lengths = infer(
        params, ids, lengths, cfg=cfg, max_frames=128,
        noise_scale=jnp.float32(0.667), length_scale=jnp.float32(1.0),
        noise_w_scale=jnp.float32(0.8), rng=jax.random.PRNGKey(1),
    )
    assert audio.shape == (b, 128 * cfg.upsample_factor)
    a = np.asarray(audio)
    for i in range(b):
        n = int(y_lengths[i]) * cfg.upsample_factor
        assert np.abs(a[i, :n]).max() > 1e-6
        assert np.all(np.isfinite(a[i]))
        # masked tail is silent
        np.testing.assert_allclose(a[i, n:], 0.0, atol=1e-6)


def test_mb_istft_batch_equals_solo():
    cfg = mb_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(1), cfg)
    from piper_tpu.models.vits.model import apply_decoder

    rng = np.random.default_rng(2)
    t_full, t_short = 24, 15
    z = rng.standard_normal((2, t_full, cfg.inter_channels)).astype(np.float32)
    mask = (np.arange(t_full)[None, :, None]
            < np.array([t_full, t_short])[:, None, None]).astype(np.float32)
    z = z * mask
    batched = np.asarray(
        apply_decoder(params, jnp.asarray(z), jnp.asarray(mask), cfg=cfg)
    )
    solo = np.asarray(
        apply_decoder(params, jnp.asarray(z[1:2, :t_short]), None, cfg=cfg)
    )
    u = cfg.upsample_factor
    np.testing.assert_allclose(batched[1, : t_short * u], solo[0], atol=1e-4)


def test_mb_istft_train_step():
    cfg = mb_cfg()
    from piper_tpu.train.step import init_train_state, train_step

    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    b, t_x, t_y = 2, 12, 40
    batch = {
        "ids": jnp.asarray(rng.integers(0, 64, (b, t_x)), jnp.int32),
        "id_lengths": jnp.asarray([12, 9], jnp.int32),
        "spec": jnp.asarray(
            np.abs(rng.standard_normal((b, t_y, 513))), jnp.float32
        ),
        "spec_lengths": jnp.asarray([40, 30], jnp.int32),
        "audio": jnp.asarray(
            rng.standard_normal((b, t_y * 256)) * 0.1, jnp.float32
        ),
    }
    state2, metrics = train_step(
        state, batch, jax.random.PRNGKey(1), cfg=cfg, tx=tx
    )
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert np.isfinite(float(metrics["loss_disc_all"]))
    before = jax.tree.leaves(state.params_g["dec"])[0]
    after = jax.tree.leaves(state2.params_g["dec"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))

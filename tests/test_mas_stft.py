"""Tests for on-device MAS and the STFT/mel pipeline."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from piper_tpu.ops.mas import maximum_path, maximum_path_numpy
from piper_tpu.ops.stft import hann_window, mel_filterbank, spectrogram


def test_mas_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    b, t_y, t_x = 4, 37, 13
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    x_lengths = np.array([13, 9, 5, 1])
    y_lengths = np.array([37, 20, 11, 3])
    ref = maximum_path_numpy(neg_cent, x_lengths, y_lengths)
    out = np.asarray(
        maximum_path(
            jnp.asarray(neg_cent), jnp.asarray(x_lengths), jnp.asarray(y_lengths)
        )
    )
    np.testing.assert_array_equal(out, ref)


def test_mas_path_properties():
    rng = np.random.default_rng(1)
    b, t_y, t_x = 3, 50, 20
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    x_lengths = np.array([20, 15, 7])
    y_lengths = np.array([50, 33, 25])
    path = np.asarray(
        maximum_path(
            jnp.asarray(neg_cent), jnp.asarray(x_lengths), jnp.asarray(y_lengths)
        )
    )
    for i in range(b):
        ty, tx = y_lengths[i], x_lengths[i]
        sub = path[i, :ty, :tx]
        # each valid frame aligns to exactly one phoneme
        np.testing.assert_array_equal(sub.sum(axis=1), 1)
        # monotonic, non-decreasing phoneme index
        idx = sub.argmax(axis=1)
        assert np.all(np.diff(idx) >= 0)
        assert np.all(np.diff(idx) <= 1)
        # starts at phoneme 0 and ends at the last
        assert idx[0] == 0 and idx[-1] == tx - 1
        # every phoneme gets >= 1 frame
        assert np.all(sub.sum(axis=0) >= 1)
        # padded region untouched
        assert path[i, ty:, :].sum() == 0
        assert path[i, :, tx:].sum() == 0


def test_mas_matches_reference_cython_semantics():
    """Cross-check against the independent Viterbi in the test oracle
    (tests/reference_oracle.py), which follows core.pyx directly."""
    from reference_oracle import _viterbi

    rng = np.random.default_rng(2)
    t_y, t_x = 23, 11
    neg = rng.standard_normal((1, t_y, t_x)).astype(np.float32)
    ref = _viterbi(neg[0])
    out = np.asarray(
        maximum_path(jnp.asarray(neg), jnp.asarray([t_x]), jnp.asarray([t_y]))
    )[0]
    np.testing.assert_array_equal(out, ref)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_spectrogram_matches_torch_stft():
    rng = np.random.default_rng(3)
    n_fft = hop = None
    for n_fft, hop, win in [(1024, 256, 1024), (512, 128, 512)]:
        t = hop * 40
        y = (rng.standard_normal((2, t)) * 0.3).astype(np.float32)

        yt = torch.from_numpy(y)
        pad = (n_fft - hop) // 2
        yt_p = torch.nn.functional.pad(
            yt.unsqueeze(1), (pad, pad), mode="reflect"
        ).squeeze(1)
        spec_t = torch.stft(
            yt_p, n_fft, hop_length=hop, win_length=win,
            window=torch.hann_window(win), center=False, normalized=False,
            onesided=True, return_complex=True,
        )
        ref = torch.sqrt(
            torch.view_as_real(spec_t).pow(2).sum(-1) + 1e-6
        ).numpy()  # (B, F, T)

        out = np.asarray(
            spectrogram(jnp.asarray(y), n_fft=n_fft, hop_length=hop, win_length=win)
        )  # (B, T, F)
        assert out.shape == (ref.shape[0], ref.shape[2], ref.shape[1])
        np.testing.assert_allclose(
            out.transpose(0, 2, 1), ref, atol=2e-4, rtol=1e-3
        )


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support, triangles overlap
    assert np.all(fb.sum(axis=1) > 0)
    # each filter is a single triangle: rises then falls
    for m in range(0, 80, 13):
        row = fb[m]
        peak = row.argmax()
        nz = np.nonzero(row)[0]
        assert np.all(np.diff(row[nz[0] : peak + 1]) >= -1e-9)
        assert np.all(np.diff(row[peak : nz[-1] + 1]) <= 1e-9)
    # Slaney low-frequency filters are linearly spaced (~66.67 Hz/mel
    # step scaled by n_mels): centers of the first filters increase
    # uniformly.
    centers = fb[:5].argmax(axis=1)
    assert np.all(np.diff(centers) >= 1)

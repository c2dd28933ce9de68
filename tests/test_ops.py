"""Unit parity tests for core ops against torch equivalents."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from piper_tpu.ops import nn as tnn
from piper_tpu.ops.duration import expand_by_duration
from piper_tpu.ops.spline import rational_quadratic_spline


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("k,dilation,groups", [(3, 1, 1), (5, 1, 1), (3, 3, 1), (3, 1, 8), (5, 12, 1)])
def test_conv1d_matches_torch(k, dilation, groups):
    rng = np.random.default_rng(0)
    b, t, cin, cout = 2, 37, 8, 16
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32) * 0.3
    bias = rng.standard_normal((cout,)).astype(np.float32)
    pad = (k * dilation - dilation) // 2

    ref = tF.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w),
        torch.from_numpy(bias),
        padding=pad,
        dilation=dilation,
        groups=groups,
    ).numpy().transpose(0, 2, 1)

    out = tnn.conv1d(
        jnp.asarray(x),
        jnp.asarray(w.transpose(2, 1, 0)),
        jnp.asarray(bias),
        padding=pad,
        dilation=dilation,
        groups=groups,
    )
    np.testing.assert_allclose(_np(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k,stride", [(16, 8), (8, 4), (4, 2), (16, 16)])
def test_conv1d_transpose_matches_torch(k, stride):
    rng = np.random.default_rng(1)
    b, t, cin, cout = 2, 19, 6, 4
    pad = (k - stride) // 2
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.2
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ref = tF.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w),
        torch.from_numpy(bias),
        stride=stride,
        padding=pad,
    ).numpy().transpose(0, 2, 1)

    w_jax = np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])  # (k, in, out) flipped
    out = tnn.conv1d_transpose(
        jnp.asarray(x), jnp.asarray(w_jax), jnp.asarray(bias),
        stride=stride, padding=pad,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(_np(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k,stride", [(16, 8), (8, 4), (4, 2), (11, 3), (5, 2)])
def test_conv1d_transpose_poly_matches_dilated(k, stride):
    """The polyphase MXU formulation (generator fast path) equals the
    input-dilated formulation; geometries without t_out = t*u fall
    back to the dilated path."""
    rng = np.random.default_rng(4)
    b, t, cin, cout = 2, 23, 6, 4
    pad = (k - stride) // 2
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal((cout,)).astype(np.float32)
    ref = tnn.conv1d_transpose(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
        stride=stride, padding=pad,
    )
    out = tnn.conv1d_transpose_poly(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
        stride=stride, padding=pad,
    )
    if (k - stride) == 2 * pad:
        assert out.shape == (b, t * stride, cout)
        np.testing.assert_allclose(
            _np(out), _np(ref)[:, : t * stride], atol=2e-5, rtol=1e-5
        )
    else:
        np.testing.assert_allclose(_np(out), _np(ref), atol=2e-5, rtol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 17, 24)).astype(np.float32)
    gamma = rng.standard_normal(24).astype(np.float32)
    beta = rng.standard_normal(24).astype(np.float32)
    ref = tF.layer_norm(
        torch.from_numpy(x), (24,), torch.from_numpy(gamma), torch.from_numpy(beta)
    ).numpy()
    out = tnn.layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))
    np.testing.assert_allclose(_np(out), ref, atol=1e-5, rtol=1e-5)


def test_spline_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference/src/python")
    from piper_train.vits import transforms as ref_transforms

    rng = np.random.default_rng(3)
    shape = (2, 11, 1)
    num_bins = 10
    inputs = rng.uniform(-8, 8, shape).astype(np.float32)
    uw = rng.standard_normal(shape + (num_bins,)).astype(np.float32)
    uh = rng.standard_normal(shape + (num_bins,)).astype(np.float32)
    ud = rng.standard_normal(shape + (num_bins - 1,)).astype(np.float32)

    for inverse in (False, True):
        ref_out, ref_ld = ref_transforms.piecewise_rational_quadratic_transform(
            torch.from_numpy(inputs),
            torch.from_numpy(uw),
            torch.from_numpy(uh),
            torch.from_numpy(ud),
            inverse=inverse,
            tails="linear",
            tail_bound=5.0,
        )
        out, ld = rational_quadratic_spline(
            jnp.asarray(inputs), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud),
            inverse=inverse, tail_bound=5.0,
        )
        np.testing.assert_allclose(_np(out), ref_out.numpy(), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(_np(ld), ref_ld.numpy(), atol=1e-4, rtol=1e-4)


def test_spline_inverse_roundtrip():
    rng = np.random.default_rng(4)
    shape = (4, 9, 2)
    num_bins = 10
    x = rng.uniform(-4.5, 4.5, shape).astype(np.float32)
    uw = rng.standard_normal(shape + (num_bins,)).astype(np.float32)
    uh = rng.standard_normal(shape + (num_bins,)).astype(np.float32)
    ud = rng.standard_normal(shape + (num_bins - 1,)).astype(np.float32)
    y, ld = rational_quadratic_spline(jnp.asarray(x), uw, uh, ud, inverse=False)
    x2, ld_inv = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(_np(x2), x, atol=1e-4)
    np.testing.assert_allclose(_np(ld + ld_inv), 0.0, atol=1e-4)


def test_expand_by_duration_matches_generate_path_matmul():
    import sys

    sys.path.insert(0, "/root/reference/src/python")
    from piper_train.vits import commons as ref_commons

    rng = np.random.default_rng(5)
    b, t_x, c = 3, 7, 5
    durations = rng.integers(0, 4, (b, t_x)).astype(np.int64)
    # emulate reference masking: valid lengths per element
    lengths = np.array([7, 5, 3])
    for i, l in enumerate(lengths):
        durations[i, l:] = 0
        durations[i, : l] = np.maximum(durations[i, : l], 0)
    values = rng.standard_normal((b, t_x, c)).astype(np.float32)
    t_y = int(durations.sum(axis=1).max())

    # reference path: dense attn matmul (models.py:709-716)
    dur_t = torch.from_numpy(durations)[:, None, :].float()
    x_mask = (torch.arange(t_x)[None, :] < torch.from_numpy(lengths)[:, None]).float()
    y_lengths = torch.clamp_min(dur_t.sum(dim=(1, 2)), 1).long()
    y_mask = ref_commons.sequence_mask(y_lengths, t_y).unsqueeze(1).float()
    attn_mask = x_mask[:, None, None, :] * y_mask.unsqueeze(-1)
    attn = ref_commons.generate_path(dur_t, attn_mask)
    ref = torch.matmul(
        attn.squeeze(1), torch.from_numpy(values)
    ).numpy()  # (b, t_y, c)

    out, mask = expand_by_duration(
        jnp.asarray(values), jnp.asarray(durations.astype(np.int32)), t_y
    )
    np.testing.assert_allclose(_np(out), ref, atol=1e-6)
    np.testing.assert_array_equal(
        _np(mask)[..., 0], (np.arange(t_y)[None] < durations.sum(1, keepdims=True))
    )

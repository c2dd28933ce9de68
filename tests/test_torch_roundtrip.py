"""jax -> torch state-dict round trip: a piper_tpu voice loads into
the reference torch SynthesizerTrn (weight-norm reconstruction) and
produces the same audio — the bridge that lets TPU-trained voices be
fine-tuned or validated under the original piper_train, and the
mechanism behind trained-weight parity tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits.model import init_synthesizer_params
from piper_tpu.weights.torch_export import to_torch_state_dict
from piper_tpu.weights.torch_loader import params_from_state_dict

from reference_oracle import make_ref_synthesizer
from test_infer_parity import run_parity


def test_jax_params_load_into_reference_torch_model():
    cfg = ModelConfig.for_quality("x-low", num_symbols=130)
    params = init_synthesizer_params(jax.random.PRNGKey(3), cfg)

    model = make_ref_synthesizer(cfg, seed=0)
    target_keys = set(model.state_dict().keys())
    sd = to_torch_state_dict(params, cfg, target_keys)

    # All inference-path keys must be provided (the posterior encoder
    # and SDP posterior flows exist only in training params).
    missing = {
        k for k in target_keys - set(sd)
        if not (k.startswith("enc_q.") or k.startswith("dp.post_"))
    }
    assert not missing, sorted(missing)[:10]
    extra = set(sd) - target_keys
    assert not extra, sorted(extra)[:10]

    model.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                          strict=False)

    # Round trip back through the .ckpt loader path: identical pytree.
    params2 = params_from_state_dict(model.state_dict(), cfg)
    for (path1, p1), (_, p2) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(params2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), atol=1e-5,
            err_msg=jax.tree_util.keystr(path1),
        )


def test_torch_model_with_injected_params_matches_jax():
    """Full waveform parity where the TORCH side carries params that
    ORIGINATED in jax (the direction a TPU-trained voice takes)."""
    cfg = ModelConfig.for_quality("x-low", num_symbols=130)
    params = init_synthesizer_params(jax.random.PRNGKey(4), cfg)

    model = make_ref_synthesizer(cfg, seed=0)
    sd = to_torch_state_dict(params, cfg, set(model.state_dict().keys()))
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False,
    )

    # Reuse the batched parity harness with OUR params on both sides.
    from piper_tpu.models.vits.model import (
        synthesizer_decode,
        synthesizer_encode,
    )
    import contextlib

    from test_infer_parity import fixed_noise

    rng = np.random.default_rng(4)
    b, t = 1, 22
    ids = rng.integers(0, cfg.num_symbols, (b, t))
    lengths = np.full((b,), t, np.int64)
    dur_noise = rng.standard_normal((b, 2, t)).astype(np.float32)

    enc = synthesizer_encode(
        params, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)), cfg=cfg,
        noise_w_scale=jnp.float32(0.8), length_scale=jnp.float32(1.0),
        dur_noise=jnp.asarray(dur_noise.transpose(0, 2, 1)),
    )
    durations = np.asarray(enc.durations)
    t_y = int(durations.sum(axis=1).max())
    frame_noise = rng.standard_normal((b, cfg.inter_channels, t_y)).astype(
        np.float32
    )
    with torch.no_grad(), fixed_noise(dur_noise, frame_noise):
        o_ref, *_ = model.infer(
            torch.from_numpy(ids), torch.from_numpy(lengths),
            noise_scale=0.667, length_scale=1.0, noise_scale_w=0.8,
        )
    audio, y_lengths = synthesizer_decode(
        params, enc, t_y, cfg=cfg, noise_scale=jnp.float32(0.667),
        frame_noise=jnp.asarray(frame_noise.transpose(0, 2, 1)),
    )
    n = int(np.asarray(y_lengths)[0]) * cfg.upsample_factor
    np.testing.assert_allclose(
        np.asarray(audio)[0, :n], o_ref.numpy()[0, 0], atol=1e-3,
    )

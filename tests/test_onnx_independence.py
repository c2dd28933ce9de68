"""Independent-producer ONNX parity (round-1 review item 3).

Three legs over the SAME weights, deterministic mode (noise scales 0,
so the graphs' RandomNormal ops are multiplied away):

  A. reference torch graph -> torch.onnx export -> onnx_io.interp
  B. our JAX graph (parity precision, zero injected noise)
  C. our params -> onnx_io.graph writer -> onnx_io.interp

A's producer is torch's exporter (not this repo); C's producer is this
repo's writer. Both run under one executor and must match B's device
graph — so a writer bug and an interp bug can no longer mask each
other. Reference contract: export_onnx.py:88-101, piper.cpp:386.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits.model import synthesizer_decode, synthesizer_encode
from piper_tpu.onnx_io import export_onnx_voice
from piper_tpu.onnx_io.interp import OnnxModel, run
from piper_tpu.weights.onnx_loader import load_onnx_voice
from piper_tpu.weights.torch_loader import params_from_state_dict

from reference_oracle import make_ref_synthesizer
from torch_onnx_oracle import export_reference_onnx


def _jax_deterministic_audio(params, cfg, ids, lengths, sid=None,
                             length_scale=1.0):
    b, t = ids.shape
    enc = synthesizer_encode(
        params,
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)),
        cfg=cfg,
        noise_w_scale=jnp.float32(0.0),
        length_scale=jnp.float32(length_scale),
        sid=jnp.asarray(sid) if sid is not None else None,
        dur_noise=jnp.zeros((b, t, 2), jnp.float32),
    )
    durations = np.asarray(enc.durations)
    t_y = int(durations.sum(axis=1).max())
    audio, y_lengths = synthesizer_decode(
        params, enc, t_y, cfg=cfg,
        noise_scale=jnp.float32(0.0),
        sid=jnp.asarray(sid) if sid is not None else None,
        frame_noise=jnp.zeros((b, t_y, cfg.inter_channels), jnp.float32),
    )
    return np.asarray(audio), np.asarray(y_lengths), durations


def _run_graph(model_bytes_or_model, ids, lengths, sid=None,
               length_scale=1.0):
    m = (
        model_bytes_or_model
        if isinstance(model_bytes_or_model, OnnxModel)
        else OnnxModel(model_bytes_or_model)
    )
    feeds = {
        "input": ids.astype(np.int64),
        "input_lengths": lengths.astype(np.int64),
        "scales": np.array([0.0, length_scale, 0.0], np.float32),
    }
    if sid is not None:
        feeds["sid"] = np.asarray(sid, np.int64)
    (out,) = run(m, feeds, rng=np.random.default_rng(0))
    return out[:, 0, :]


def _triangulate(cfg, seed, t=20, sid=None, atol=1e-3):
    model = make_ref_synthesizer(cfg, seed=seed)
    # Make every parameter tensor unique: torch's exporter dedupes
    # byte-identical initializers (at random init all LayerNorm gammas
    # are ones), which a trained voice never exhibits — without this
    # the graph drops names the weight loader must see.
    torch.manual_seed(seed + 1)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 1e-3)
    params = params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.num_symbols, (1, t))
    lengths = np.full((1,), t, np.int64)

    # Leg B: our device graph.
    audio_jax, y_lengths, durations = _jax_deterministic_audio(
        params, cfg, ids, lengths, sid=sid
    )
    n = int(y_lengths[0]) * cfg.upsample_factor

    # Leg A: torch-exported reference graph under our executor.
    ref_bytes = export_reference_onnx(
        model, cfg.num_symbols, multispeaker=sid is not None, example_t=t
    )
    audio_ref = _run_graph(ref_bytes, ids, lengths, sid=sid)
    assert audio_ref.shape[1] == n, (
        f"frame-count mismatch: ref graph {audio_ref.shape[1]} vs "
        f"jax {n} (durations {durations.sum()})"
    )
    np.testing.assert_allclose(
        audio_jax[0, :n], audio_ref[0], atol=atol,
        err_msg="torch-exported reference graph vs JAX graph",
    )

    # Leg C: our own exported graph under the same executor.
    own_bytes = export_onnx_voice(params, cfg)
    audio_own = _run_graph(own_bytes, ids, lengths, sid=sid)
    assert audio_own.shape[1] == n
    np.testing.assert_allclose(
        audio_own[0], audio_ref[0], atol=atol,
        err_msg="our exported graph vs torch-exported reference graph",
    )

    # Round-trip: the torch-exported voice also loads back through the
    # weight loader (the path released .onnx voices take).
    return ref_bytes, params, ids, lengths, audio_jax[:, :n]


def test_independence_x_low():
    _triangulate(ModelConfig.for_quality("x-low", num_symbols=130), seed=31)


def test_independence_medium():
    _triangulate(ModelConfig(num_symbols=130), seed=32, t=16)


def test_independence_multispeaker():
    cfg = ModelConfig(num_symbols=130, num_speakers=4, gin_channels=64)
    _triangulate(cfg, seed=33, sid=[2])


def test_torch_exported_voice_loads_into_jax(tmp_path):
    """A torch-exported .onnx (weight-norm folded by the exporter's
    constant folding) loads through weights/onnx_loader like a released
    piper voice, and reproduces the same audio on device."""
    cfg = ModelConfig.for_quality("x-low", num_symbols=130)
    ref_bytes, params, ids, lengths, audio_jax = _triangulate(
        cfg, seed=34
    )
    p = tmp_path / "voice.onnx"
    p.write_bytes(ref_bytes)
    loaded_params, loaded_cfg = load_onnx_voice(str(p), cfg)
    audio2, y2, _ = _jax_deterministic_audio(
        loaded_params, loaded_cfg, ids, lengths
    )
    n = audio_jax.shape[1]
    np.testing.assert_allclose(
        audio2[0, :n], audio_jax[0], atol=1e-3,
        err_msg="onnx_loader round-trip of a torch-exported voice",
    )

"""ORT tier: exported voices under the REAL reference runtime.

The reference serves voices through onnxruntime
(/root/reference/src/cpp/piper.cpp:386, python_run/piper/voice.py:183);
every offline triangulation in this repo executes ONNX under the
bundled numpy interpreter instead, because this image has no
onnxruntime and no network egress. This tier closes that gap wherever
the `[ort]` extra is installable (`pip install piper-tpu[ort]`;
`make test-ort`):

  1. every exporter product (random x-low/medium, multispeaker, the
     trained fixture voice) runs under real ORT and must match the JAX
     graph waveform at atol 1e-3 (the BASELINE criterion, now against
     the actual reference executor);
  2. a torch.onnx-exported reference graph runs under ORT and under
     onnx_io.interp — pinning the interpreter itself against ORT;
  3. the bundled Silero VAD model runs under ORT vs our interpreter;
  4. the reference benchmark schema (benchmark_onnx.py:73-81) is
     produced against an ORT session.

Marked `ort`, auto-skipped when onnxruntime is not importable.
"""

import json
import time

import numpy as np
import pytest

ort = pytest.importorskip("onnxruntime")

import jax  # noqa: E402

from piper_tpu.config import ModelConfig  # noqa: E402
from piper_tpu.onnx_io import export_onnx_voice  # noqa: E402
from piper_tpu.weights.torch_loader import params_from_state_dict  # noqa: E402

from reference_oracle import make_ref_synthesizer  # noqa: E402
from test_onnx_independence import _jax_deterministic_audio  # noqa: E402

pytestmark = pytest.mark.ort


def _ort_session(model_bytes: bytes) -> "ort.InferenceSession":
    """Session options per the reference's measured-optimal settings
    (piper.cpp:282-290: graph optimization disabled, no mem pattern,
    no profiling)."""
    opts = ort.SessionOptions()
    opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_DISABLE_ALL
    opts.enable_cpu_mem_arena = False
    opts.enable_mem_pattern = False
    opts.enable_profiling = False
    return ort.InferenceSession(model_bytes, sess_options=opts)


def _run_ort(sess, ids, lengths, sid=None, length_scale=1.0):
    feeds = {
        "input": ids.astype(np.int64),
        "input_lengths": lengths.astype(np.int64),
        "scales": np.array([0.0, length_scale, 0.0], np.float32),
    }
    if sid is not None:
        feeds["sid"] = np.asarray(sid, np.int64)
    (out,) = sess.run(None, feeds)
    return out[:, 0, :]


def _check_voice_under_ort(params, cfg, seed, t=20, sid=None,
                           length_scale=1.0, atol=1e-3):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.num_symbols, (1, t))
    lengths = np.full((1,), t, np.int64)
    audio_jax, y_lengths, _ = _jax_deterministic_audio(
        params, cfg, ids, lengths, sid=sid, length_scale=length_scale
    )
    n = int(y_lengths[0]) * cfg.upsample_factor

    sess = _ort_session(export_onnx_voice(params, cfg))
    audio_ort = _run_ort(sess, ids, lengths, sid=sid,
                         length_scale=length_scale)
    assert audio_ort.shape[1] == n, (
        f"frame count under ORT {audio_ort.shape[1] // cfg.upsample_factor}"
        f" != jax {n // cfg.upsample_factor}"
    )
    np.testing.assert_allclose(
        audio_jax[0, :n], audio_ort[0], atol=atol,
        err_msg="exported voice under real onnxruntime vs JAX graph",
    )


def _random_voice(cfg, seed):
    model = make_ref_synthesizer(cfg, seed=seed)
    return params_from_state_dict(model.state_dict(), cfg)


def test_ort_exported_x_low():
    cfg = ModelConfig.for_quality("x-low", num_symbols=130)
    _check_voice_under_ort(_random_voice(cfg, 41), cfg, seed=41)


def test_ort_exported_medium():
    cfg = ModelConfig(num_symbols=130)
    _check_voice_under_ort(_random_voice(cfg, 42), cfg, seed=42, t=16)


def test_ort_exported_multispeaker():
    cfg = ModelConfig(num_symbols=130, num_speakers=4, gin_channels=64)
    _check_voice_under_ort(_random_voice(cfg, 43), cfg, seed=43, sid=[2])


def test_ort_trained_voice():
    """The trained fixture voice under real ORT (length_scale 1.01:
    trained durations are near-integer — see docs/PARITY.md)."""
    from piper_tpu.weights.native import load_native
    from test_trained_parity import _trained_voice_path

    path = _trained_voice_path()
    if not path.exists():
        pytest.skip(f"no trained checkpoint at {path}")
    params, cfg = load_native(str(path))
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    _check_voice_under_ort(params, cfg, seed=44, length_scale=1.01)


def test_ort_pins_numpy_interpreter():
    """One torch.onnx-exported reference graph, two executors: real
    ORT and onnx_io.interp must agree — validating the interpreter
    against the reference runtime itself."""
    import torch

    from test_onnx_independence import _run_graph
    from torch_onnx_oracle import export_reference_onnx

    cfg = ModelConfig.for_quality("x-low", num_symbols=130)
    model = make_ref_synthesizer(cfg, seed=45)
    torch.manual_seed(46)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 1e-3)
    ref_bytes = export_reference_onnx(model, cfg.num_symbols, example_t=18)

    rng = np.random.default_rng(45)
    ids = rng.integers(0, cfg.num_symbols, (1, 18))
    lengths = np.full((1,), 18, np.int64)
    a_interp = _run_graph(ref_bytes, ids, lengths)
    a_ort = _run_ort(_ort_session(ref_bytes), ids, lengths)
    assert a_interp.shape == a_ort.shape
    np.testing.assert_allclose(a_interp[0], a_ort[0], atol=1e-3)


def test_ort_silero_vad_matches_interp():
    """The bundled Silero VAD under real ORT vs our interpreter
    (reference: norm_audio/vad.py:14-54)."""
    from pathlib import Path

    from piper_tpu.onnx_io.interp import OnnxModel, run

    vad_path = (
        Path(__file__).parent.parent
        / "piper_tpu" / "train" / "models" / "silero_vad.onnx"
    )
    model = OnnxModel(str(vad_path))
    sess = ort.InferenceSession(str(vad_path))

    rng = np.random.default_rng(7)
    chunk = (rng.standard_normal(480) * 0.1).astype(np.float32)
    feeds = {
        "input": chunk[None, :].astype(np.float32),
        "h0": np.zeros((2, 1, 64), np.float32),
        "c0": np.zeros((2, 1, 64), np.float32),
    }
    outs_interp = run(model, dict(feeds))
    outs_ort = sess.run(None, feeds)
    for a, b in zip(outs_interp, outs_ort):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


def test_ort_reference_benchmark_schema(tmp_path):
    """Produce the reference benchmark output schema
    (benchmark_onnx.py:73-81: load_sec + per-utterance RTF stats)
    against a real ORT session of an exported voice."""
    cfg = ModelConfig.for_quality("x-low", num_symbols=130)
    params = _random_voice(cfg, 47)
    model_bytes = export_onnx_voice(params, cfg)

    t0 = time.perf_counter()
    sess = _ort_session(model_bytes)
    load_sec = time.perf_counter() - t0

    rng = np.random.default_rng(47)
    rtfs = []
    for _ in range(3):
        t = int(rng.integers(10, 24))
        ids = rng.integers(0, cfg.num_symbols, (1, t))
        lengths = np.full((1,), t, np.int64)
        t0 = time.perf_counter()
        audio = _run_ort(sess, ids, lengths)
        infer_sec = time.perf_counter() - t0
        audio_sec = audio.shape[1] / cfg.audio.sample_rate
        rtfs.append(infer_sec / audio_sec)
    report = {
        "load_sec": load_sec,
        "rtf_mean": float(np.mean(rtfs)),
        "rtf_stdev": float(np.std(rtfs)),
        "rtfs": rtfs,
    }
    (tmp_path / "report.json").write_text(json.dumps(report))
    assert set(report) == {"load_sec", "rtf_mean", "rtf_stdev", "rtfs"}
    assert report["rtf_mean"] > 0

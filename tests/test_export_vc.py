"""Export CLI and voice conversion tests."""

import json
import wave
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.config import AudioConfig, ModelConfig
from piper_tpu.models.vits.model import init_synthesizer_params
from piper_tpu.runtime.voice_conversion import voice_convert_audio
from piper_tpu.weights.native import load_native, save_native


def tiny_multi_cfg():
    return ModelConfig(
        num_symbols=40,
        num_speakers=3,
        gin_channels=16,
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=1,
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=64,
        spec_channels=33,
        audio=AudioConfig(
            sample_rate=16000, filter_length=64, hop_length=16, win_length=64
        ),
    )


def test_voice_conversion_roundtrip():
    cfg = tiny_multi_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg, training=True)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16 * 64) * 0.1).astype(np.float32)
    out = voice_convert_audio(
        params, audio, sid_src=0, sid_tgt=2, cfg=cfg,
        rng=jax.random.PRNGKey(1),
    )
    assert out.ndim == 1 and out.size > 0
    assert np.isfinite(out).all()
    # different target speaker changes the audio
    out_same = voice_convert_audio(
        params, audio, sid_src=0, sid_tgt=0, cfg=cfg,
        rng=jax.random.PRNGKey(1),
    )
    assert not np.allclose(out, out_same)


def test_voice_conversion_requires_posterior():
    cfg = tiny_multi_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg, training=False)
    with pytest.raises(ValueError, match="posterior"):
        voice_convert_audio(
            params, np.zeros(1024, np.float32), 0, 1, cfg=cfg
        )


def test_export_cli_npz_roundtrip(tmp_path):
    from piper_tpu.export import main as export_main

    cfg = tiny_multi_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(3), cfg)
    src = tmp_path / "a.npz"
    save_native(str(src), params, cfg)
    (tmp_path / "a.npz.json").write_text(json.dumps({"num_symbols": 40}))
    dst = tmp_path / "b.npz"
    export_main(["--input", str(src), "--output", str(dst)])
    assert dst.exists()
    assert (tmp_path / "b.npz.json").exists()
    params2, cfg2 = load_native(str(dst))
    assert cfg2.num_speakers == 3
    np.testing.assert_allclose(
        np.asarray(params2["emb_g"]["weight"]),
        np.asarray(params["emb_g"]["weight"]),
    )


def test_stage_timer():
    from piper_tpu.runtime.profiling import StageTimer

    t = StageTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2

"""benchmark.py / infer.py CLI tests (JSONL protocol parity)."""

import io
import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from test_cli_server import codepoint_id_map, tiny_cfg


@pytest.fixture(scope="module")
def voice_files(tmp_path_factory):
    from piper_tpu.models.vits.model import init_synthesizer_params
    from piper_tpu.weights.native import save_native

    d = tmp_path_factory.mktemp("voice")
    cfg = tiny_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    model_path = d / "tiny.npz"
    save_native(str(model_path), params, cfg)
    config = {
        "audio": {"sample_rate": 16000},
        "espeak": {"voice": "en-us"},
        "inference": {"noise_scale": 0.667, "length_scale": 1, "noise_w": 0.8},
        "phoneme_type": "text",
        "phoneme_id_map": codepoint_id_map(),
        "num_symbols": 256,
        "num_speakers": 1,
    }
    (d / "tiny.npz.json").write_text(json.dumps(config))
    return model_path


def jsonl_input():
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        ids = [1] + [int(x) for x in rng.integers(32, 120, 20 + 5 * i)] + [2]
        lines.append(json.dumps({"phoneme_ids": ids}))
    return "\n".join(lines) + "\n"


def test_benchmark_cli(voice_files, monkeypatch, capsys):
    from piper_tpu.benchmark import main

    monkeypatch.setattr("sys.stdin", io.StringIO(jsonl_input()))
    main(["-m", str(voice_files), "--precision", "parity", "--batch"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert report["load_sec"] > 0
    assert 0 < report["rtf_mean"]
    assert len(report["rtfs"]) == 3
    assert report["batch"]["utterances"] == 3
    assert report["batch"]["audio_seconds_per_s_per_chip"] > 0


def test_infer_cli(voice_files, monkeypatch, tmp_path):
    from piper_tpu.infer import main

    out_dir = tmp_path / "wavs"
    monkeypatch.setattr("sys.stdin", io.StringIO(jsonl_input()))
    main([
        "-m", str(voice_files), "-o", str(out_dir), "--batch",
        "--seed", "0", "--precision", "parity",
    ])
    wavs = sorted(out_dir.glob("*.wav"))
    assert len(wavs) == 3
    from piper_tpu.runtime.wav import read_wav

    sr, data = read_wav(wavs[0])
    assert sr == 16000 and len(data) > 100


def test_warm_cache_cli(voice_files, tmp_path):
    """piper-tpu-warm drives TpuVoice.warmup(full) end to end and
    populates the configured compilation cache directory. Runs in a
    subprocess: jax binds the persistent-cache directory at first use,
    so an in-process run would inherit whatever an earlier test set."""
    import os
    import subprocess

    cache = tmp_path / "cache"
    env = dict(
        os.environ,
        PIPER_TPU_CACHE=str(cache),
        JAX_PLATFORMS="cpu",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
        PYTHONPATH=str(Path(__file__).resolve().parent.parent),
    )
    subprocess.run(
        [sys.executable, "-m", "piper_tpu.tools.warm_cache",
         "-m", str(voice_files),
         "--batch-sizes", "1",
         "--max-phoneme-bucket", "32",
         "--max-frame-bucket", "128",
         "--threads", "2"],
        env=env, check=True, timeout=500,
    )
    assert cache.is_dir() and any(cache.iterdir()), (
        "warm run left no entries in the persistent compilation cache"
    )

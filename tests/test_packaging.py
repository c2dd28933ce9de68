"""Install story (reference counterpart: src/python/setup.py,
src/python_run/setup.py, Makefile:3-10): `pip install .` into a clean
venv must yield working `piper-tpu` console scripts with the native
C++ kernels compiled into the wheel.

This image has no package index, so the venv gets its dependencies
(jax/numpy) by a .pth pointing at the base environment's
site-packages — the piper-tpu package itself is still resolved purely
from the fresh install.
"""

import json
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _clean_env():
    env = dict(os.environ)
    # Drop the session's TPU plugin autoload so the subprocess runs CPU.
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_pip_install_console_script(tmp_path):
    venv = tmp_path / "venv"
    subprocess.run(
        [sys.executable, "-m", "venv", str(venv)], check=True,
        capture_output=True,
    )
    site = venv / "lib" / f"python{sys.version_info.major}.{sys.version_info.minor}" / "site-packages"
    base_site = sysconfig.get_paths()["purelib"]
    (site / "_basedeps.pth").write_text(base_site + "\n")

    env = _clean_env()
    r = subprocess.run(
        [str(venv / "bin" / "pip"), "install", "--no-index",
         "--no-build-isolation", "-q", str(ROOT)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # Native kernels compiled into the installed package.
    installed_native = site / "piper_tpu" / "native"
    assert (installed_native / "libpiper_tpu_native.so").exists()

    # Build a tiny native voice with the *installed* package.
    make_voice = (
        "import json, jax;"
        "from piper_tpu.config import ModelConfig, AudioConfig;"
        "from piper_tpu.models.vits.model import init_synthesizer_params;"
        "from piper_tpu.weights.native import save_native;"
        "cfg = ModelConfig(num_symbols=64, inter_channels=32,"
        " hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,"
        " resblock='2', resblock_kernel_sizes=(3,),"
        " resblock_dilation_sizes=((1, 2),), upsample_rates=(4, 4),"
        " upsample_initial_channel=64, upsample_kernel_sizes=(8, 8),"
        " spec_channels=33, segment_size=256,"
        " audio=AudioConfig(sample_rate=16000, filter_length=64,"
        " hop_length=16, win_length=64, mel_channels=20));"
        "params = init_synthesizer_params(jax.random.PRNGKey(0), cfg);"
        f"save_native({str(str(tmp_path / 'voice.npz'))!r}, params, cfg)"
    )
    r = subprocess.run(
        [str(venv / "bin" / "python"), "-c", make_voice],
        capture_output=True, text=True, env=env, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    id_map = {chr(97 + i): [i + 3] for i in range(26)}
    id_map.update({"_": [0], "^": [1], "$": [2], " ": [3]})
    (tmp_path / "voice.npz.json").write_text(json.dumps({
        "num_symbols": 64, "num_speakers": 1,
        "audio": {"sample_rate": 16000},
        "espeak": {"voice": "en-us"},
        "inference": {"noise_scale": 0.667, "length_scale": 1,
                      "noise_w": 0.8},
        "phoneme_type": "text",
        "phoneme_id_map": id_map,
    }))

    out_wav = tmp_path / "out.wav"
    r = subprocess.run(
        [str(venv / "bin" / "piper-tpu"), "-m", str(tmp_path / "voice.npz"),
         "-f", str(out_wav), "-q"],
        input="hi\n", capture_output=True, text=True, env=env, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_wav.exists() and out_wav.stat().st_size > 44
    assert out_wav.read_bytes()[:4] == b"RIFF"

    # Every declared console script resolves and answers --help.
    for script in ("piper-tpu-train", "piper-tpu-server", "piper-tpu-export"):
        r = subprocess.run(
            [str(venv / "bin" / script), "--help"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, f"{script}: {r.stderr[-500:]}"

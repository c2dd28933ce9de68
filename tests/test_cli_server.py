"""CLI and HTTP server end-to-end tests with a tiny native voice."""

import io
import json
import sys
import threading
import urllib.request
import wave
from pathlib import Path

import numpy as np
import pytest

import jax

from piper_tpu.config import AudioConfig, ModelConfig, SynthesisConfig
from piper_tpu.models.vits.model import init_synthesizer_params
from piper_tpu.runtime.voice import TpuVoice
from piper_tpu.weights.native import load_native, save_native


def tiny_cfg():
    return ModelConfig(
        num_symbols=256,
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=2,
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(4, 4),
        upsample_initial_channel=64,
        upsample_kernel_sizes=(8, 8),
        audio=AudioConfig(sample_rate=16000),
    )


def codepoint_id_map():
    """ASCII codepoint voice (phoneme_type='text')."""
    id_map = {"_": [0], "^": [1], "$": [2]}
    for i in range(32, 127):
        ch = chr(i)
        if ch not in id_map:
            id_map[ch] = [i]
    return id_map


@pytest.fixture(scope="module")
def voice_files(tmp_path_factory):
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
    config_path = d / "tiny.npz.json"
    config_path.write_text(json.dumps(config))
    return model_path, config_path


def test_native_roundtrip(voice_files):
    model_path, _ = voice_files
    params, cfg = load_native(str(model_path))
    assert cfg.upsample_rates == (4, 4)
    assert params["enc_p"]["emb"]["weight"].shape == (256, 32)
    assert isinstance(params["flow"]["layers"], list)


def test_cli_output_file(voice_files, tmp_path, monkeypatch, capsys):
    from piper_tpu.__main__ import main

    model_path, config_path = voice_files
    out = tmp_path / "out.wav"
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("Hello world. This is a test.")
    )
    main([
        "-m", str(model_path), "-c", str(config_path), "-f", str(out),
        "--seed", "0", "-q",
    ])
    with wave.open(str(out), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnframes() > 1000


def test_cli_json_input_output_dir(voice_files, tmp_path, monkeypatch):
    from piper_tpu.__main__ import main

    model_path, config_path = voice_files
    out_dir = tmp_path / "wavs"
    target = tmp_path / "custom.wav"
    lines = json.dumps({"text": "Direct output.", "output_file": str(target)})
    monkeypatch.setattr("sys.stdin", io.StringIO(lines + "\n"))
    main([
        "-m", str(model_path), "-c", str(config_path), "-d", str(out_dir),
        "--json-input", "--seed", "0", "-q",
    ])
    assert target.exists()


def test_http_server(voice_files):
    from piper_tpu.server.http_server import serve

    model_path, config_path = voice_files
    voice = TpuVoice.load(model_path, config_path, precision="parity", seed=0)
    server = serve(voice, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health"
        ) as resp:
            health = json.loads(resp.read())
            assert health["status"] == "ok"
            assert health["sample_rate"] == 16000

        # GET synthesis
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?text=Hello%20world.&seed=1"
        ) as resp:
            assert resp.headers["Content-Type"] == "audio/wav"
            data = resp.read()
            assert len(data) > 1000
            with wave.open(io.BytesIO(data), "rb") as w:
                assert w.getframerate() == 16000

        # POST raw body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", data=b"Post body text.",
            headers={"Content-Type": "text/plain"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"] == "audio/wav"

        # batch endpoint
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/batch",
            data=json.dumps({"texts": ["One.", "Two two two."]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            wavs = json.loads(resp.read())["wavs"]
            assert len(wavs) == 2
    finally:
        server.shutdown()


def test_http_stream_endpoint(voice_files):
    import http.client

    from piper_tpu.server.http_server import serve

    model_path, config_path = voice_files
    voice = TpuVoice.load(model_path, config_path, precision="parity", seed=0)
    server = serve(voice, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request(
            "GET",
            "/stream?text=Streaming%20endpoint%20delivers%20audio%20in%20chunks%20for%20low%20latency%20playback.&seed=4",
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "audio/L16"
        assert resp.headers["X-Sample-Rate"] == "16000"
        data = resp.read()  # http.client reassembles chunked body
        assert len(data) > 2000 and len(data) % 2 == 0
        pcm = np.frombuffer(data, np.int16)
        assert np.abs(pcm).max() > 0
        conn.close()

        # probe: missing text
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/stream")
        assert conn.getresponse().status == 400
        conn.close()
    finally:
        server.shutdown()

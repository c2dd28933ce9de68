"""Voice-registry resolution (reference: download.py:23-139 +
vendored voices.json). The embedded snapshot must resolve every
released voice name offline — no network fetch on first use."""

import numpy as np
import pytest

from piper_tpu.runtime.download import (
    VoiceNotFoundError,
    ensure_voice_exists,
    find_voice,
    get_file_hash,
    get_voices,
)


def test_embedded_registry_resolves_offline(tmp_path):
    voices = get_voices(tmp_path)  # no cached copy, no update -> embedded
    assert len(voices) >= 97
    info = voices["en_US-lessac-medium"]
    assert info["language"]["code"] == "en_US"
    assert info["quality"] == "medium"
    onnx_files = [p for p in info["files"] if p.endswith(".onnx")]
    assert len(onnx_files) == 1
    meta = info["files"][onnx_files[0]]
    assert meta["size_bytes"] > 1_000_000
    assert len(meta["md5_digest"]) == 32
    # a multi-speaker voice keeps its speaker count
    assert voices["en_US-libritts-high"]["num_speakers"] > 1


def test_cached_registry_preferred(tmp_path):
    (tmp_path / "voices.json").write_text('{"fake-voice": {"files": {}}}')
    voices = get_voices(tmp_path)
    assert list(voices) == ["fake-voice"]


def test_ensure_voice_exists_validates_local_files(tmp_path):
    """A voice whose files are present with correct size+md5 needs no
    network: ensure_voice_exists returns without touching urlopen."""
    payload = b"x" * 128
    (tmp_path / "tiny.onnx").write_bytes(payload)
    voices_info = {
        "tiny": {
            "files": {
                "lang/tiny.onnx": {
                    "size_bytes": len(payload),
                    "md5_digest": get_file_hash(tmp_path / "tiny.onnx"),
                }
            }
        }
    }
    ensure_voice_exists("tiny", [tmp_path], tmp_path, voices_info)


def test_ensure_voice_exists_unknown_name(tmp_path):
    with pytest.raises(VoiceNotFoundError):
        ensure_voice_exists("nope", [tmp_path], tmp_path, {})


def test_find_voice(tmp_path):
    (tmp_path / "v.onnx").write_bytes(b"")
    (tmp_path / "v.onnx.json").write_text("{}")
    model, cfg = find_voice("v", [tmp_path])
    assert model.name == "v.onnx" and cfg.name == "v.onnx.json"
    with pytest.raises(VoiceNotFoundError):
        find_voice("missing", [tmp_path])

"""End-to-end data pipeline: synthetic ljspeech corpus -> preprocess ->
bucketed loader -> one training step; plus checkpoint save/restore."""

import json
import wave
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.train.dataset import BucketedLoader, load_dataset
from piper_tpu.train.norm_audio import load_audio, trim_silence
from piper_tpu.train.preprocess import main as preprocess_main


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    wav_dir = d / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    texts = [
        "hello world this is a test",
        "the quick brown fox",
        "jumps over the lazy dog",
        "text to speech on tensor processors",
        "a longer sentence with several words in it for padding",
        "short one",
    ]
    sr = 16000
    for i, text in enumerate(texts):
        dur = 0.4 + 0.15 * i
        t = np.arange(int(sr * dur)) / sr
        sig = 0.4 * np.sin(2 * np.pi * (120 + 20 * i) * t).astype(np.float32)
        # leading/trailing silence to exercise trimming
        sig = np.concatenate(
            [np.zeros(1600, np.float32), sig, np.zeros(2400, np.float32)]
        )
        pcm = (sig * 32767).astype(np.int16)
        with wave.open(str(wav_dir / f"utt{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        rows.append(f"utt{i}|{text}")
    (d / "metadata.csv").write_text("\n".join(rows))
    return d


@pytest.fixture(scope="module")
def preprocessed(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("preprocessed")
    preprocess_main([
        "--input-dir", str(corpus),
        "--output-dir", str(out),
        "--language", "en-us",
        "--sample-rate", "16000",
        "--dataset-format", "ljspeech",
        "--phoneme-type", "text",
        "--max-workers", "1",
        "--single-speaker",
    ])
    return out


def test_preprocess_outputs(preprocessed):
    config = json.loads((preprocessed / "config.json").read_text())
    assert config["audio"]["sample_rate"] == 16000
    assert config["phoneme_type"] == "text"
    assert config["num_speakers"] == 1
    assert config["phoneme_id_map"]["_"] == [0]
    lines = [
        json.loads(l)
        for l in (preprocessed / "dataset.jsonl").read_text().splitlines()
        if l
    ]
    assert len(lines) == 6
    for rec in lines:
        assert rec["phoneme_ids"][0] == 1  # BOS
        assert rec["phoneme_ids"][-1] == 2  # EOS
        assert Path(rec["audio_norm_path"]).exists()
        assert Path(rec["audio_spec_path"]).exists()
        spec = np.load(rec["audio_spec_path"])
        audio = np.load(rec["audio_norm_path"])
        assert spec.shape[1] == 1024 // 2 + 1
        # frames * hop ≈ samples
        assert abs(spec.shape[0] - len(audio) // 256) <= 1


def test_trim_silence():
    sr = 16000
    sig = np.concatenate([
        np.zeros(8000, np.float32),
        0.5 * np.sin(np.linspace(0, 800, 16000)).astype(np.float32),
        np.zeros(8000, np.float32),
    ])
    start, end = trim_silence(sig)
    assert 4000 < start <= 8000
    assert 24000 <= end < 28000


def test_bucketed_loader_and_train_step(preprocessed):
    from piper_tpu.train.step import init_train_state, train_step
    from test_train import tiny_cfg

    cfg = tiny_cfg()
    utts = load_dataset([preprocessed / "dataset.jsonl"])
    assert len(utts) == 6
    loader = BucketedLoader(
        utts, batch_size=3, hop_length=256,
        segment_size=cfg.segment_size, seed=0,
    )
    batches = list(loader)
    assert sum(b["ids"].shape[0] for b in batches) == 6
    batch = batches[0]
    assert batch["spec"].shape[2] == 513

    # One real train step on this data (tiny cfg but 513 spec channels)
    import dataclasses

    cfg = dataclasses.replace(cfg, spec_channels=513)
    cfg = dataclasses.replace(
        cfg,
        audio=dataclasses.replace(
            cfg.audio, filter_length=1024, hop_length=256, win_length=1024,
            mel_channels=80,
        ),
        segment_size=256 * 16,
        upsample_rates=(16, 16),
        upsample_kernel_sizes=(32, 32),
    )
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state2, metrics = train_step(state, jb, jax.random.PRNGKey(1), cfg=cfg, tx=tx)
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert np.isfinite(float(metrics["loss_disc_all"]))


def test_bucketed_loader_single_shape(preprocessed):
    """single_shape=True pads every batch to one (phoneme, frame)
    shape — exactly one train-step compilation."""
    utts = load_dataset([preprocessed / "dataset.jsonl"])
    loader = BucketedLoader(
        utts, batch_size=3, hop_length=256, segment_size=4096, seed=0,
        single_shape=True,
    )
    batches = list(loader)
    assert sum(b["ids"].shape[0] for b in batches) == len(utts)
    shapes = {(b["ids"].shape[1], b["spec"].shape[1]) for b in batches}
    assert len(shapes) == 1
    (pb, fb), = shapes
    assert pb % 16 == 0 and fb % 16 == 0
    assert pb >= max(len(u.phoneme_ids) for u in utts)
    # every utterance still fits its row
    for b in batches:
        assert np.all(b["id_lengths"] <= pb)
        assert np.all(b["spec_lengths"] <= fb)


def test_checkpoint_roundtrip(tmp_path):
    from piper_tpu.train.__main__ import restore_checkpoint, save_checkpoint
    from piper_tpu.train.step import init_train_state
    from test_train import tiny_cfg

    cfg = tiny_cfg()
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(tmp_path / "ckpt", jax.device_get(state), 7)

    fresh, _ = init_train_state(jax.random.PRNGKey(99), cfg)
    restored, step = restore_checkpoint(tmp_path / "ckpt", fresh)
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(restored.params_g["enc_p"]["emb"]["weight"]),
        np.asarray(state.params_g["enc_p"]["emb"]["weight"]),
    )


def test_merge_params_surgery():
    from piper_tpu.models.vits.model import init_synthesizer_params
    from piper_tpu.train.__main__ import merge_params
    from test_train import tiny_cfg
    import dataclasses

    cfg_single = tiny_cfg()
    cfg_multi = dataclasses.replace(cfg_single, num_speakers=3, gin_channels=16)
    p_single = init_synthesizer_params(jax.random.PRNGKey(0), cfg_single)
    p_multi = init_synthesizer_params(jax.random.PRNGKey(1), cfg_multi)
    merged = merge_params(p_multi, p_single)
    # shared weights copied from the single-speaker checkpoint
    np.testing.assert_allclose(
        np.asarray(merged["enc_p"]["emb"]["weight"]),
        np.asarray(p_single["enc_p"]["emb"]["weight"]),
    )
    # speaker-conditioning params keep the fresh multi-speaker init
    assert "emb_g" in merged
    np.testing.assert_allclose(
        np.asarray(merged["emb_g"]["weight"]),
        np.asarray(p_multi["emb_g"]["weight"]),
    )
    # WN cond layers exist only in multi: fresh init preserved
    assert "cond_layer" in merged["flow"]["layers"][0]["enc"]


def test_training_cli_end_to_end(preprocessed, tmp_path):
    """Full training CLI: a few steps on the synthetic corpus, with
    checkpointing, resume, validation samples, and voice export."""
    import sys

    from piper_tpu.train.__main__ import main as train_main

    ckpt_dir = tmp_path / "ckpt"
    overrides = json.dumps({
        "inter_channels": 32, "hidden_channels": 32, "filter_channels": 64,
        "n_heads": 2, "n_layers": 1,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 2]],
        "upsample_rates": [16, 16], "upsample_kernel_sizes": [32, 32],
        "segment_size": 4096,
        "audio": {"filter_length": 1024, "hop_length": 256,
                  "win_length": 1024, "mel_channels": 20},
    })
    common = [
        "--dataset-dir", str(preprocessed),
        "--checkpoint-dir", str(ckpt_dir),
        "--batch-size", "2",
        "--config-overrides", overrides,
        "--checkpoint-steps", "2",
        "--log-steps", "1",
        "--validate-steps", "2",
        "--num-test-examples", "1",
        "--validation-split", "0.34",
    ]
    train_main(common + ["--max-steps", "2"])
    assert (ckpt_dir / "metrics.jsonl").exists()
    metrics = [json.loads(l) for l in (ckpt_dir / "metrics.jsonl").read_text().splitlines()]
    assert any("loss_gen_all" in m for m in metrics)
    assert any("val_mel_l1" in m for m in metrics)
    exports = list(ckpt_dir.glob("voice_*.npz"))
    assert exports
    samples = list((ckpt_dir / "samples").rglob("*.wav"))
    assert samples

    # resume continues from step 2
    train_main(common + ["--max-steps", "3", "--resume"])
    metrics = [json.loads(l) for l in (ckpt_dir / "metrics.jsonl").read_text().splitlines()]
    assert any(m.get("step") == 3 for m in metrics)


def test_training_cli_scan_steps(preprocessed, tmp_path):
    """--scan-steps K: K steps per dispatch through the scanned
    executable; cadences fire on counter crossings, checkpoints and
    metrics advance by K."""
    from piper_tpu.train.__main__ import main as train_main

    ckpt_dir = tmp_path / "ckpt_scan"
    overrides = json.dumps({
        "inter_channels": 32, "hidden_channels": 32, "filter_channels": 64,
        "n_heads": 2, "n_layers": 1,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 2]],
        "upsample_rates": [16, 16], "upsample_kernel_sizes": [32, 32],
        "segment_size": 4096,
        "audio": {"filter_length": 1024, "hop_length": 256,
                  "win_length": 1024, "mel_channels": 20},
    })
    train_main([
        "--dataset-dir", str(preprocessed),
        "--checkpoint-dir", str(ckpt_dir),
        "--batch-size", "2",
        "--config-overrides", overrides,
        "--checkpoint-steps", "2",
        "--log-steps", "1",
        "--validate-steps", "0",
        "--num-test-examples", "1",
        "--validation-split", "0.34",
        "--scan-steps", "2",
        "--max-steps", "4",
    ])
    metrics = [
        json.loads(l)
        for l in (ckpt_dir / "metrics.jsonl").read_text().splitlines()
    ]
    steps = [m["step"] for m in metrics if "loss_gen_all" in m]
    assert steps and all(s % 2 == 0 for s in steps), steps
    assert any(s >= 4 for s in steps)
    exports = list(ckpt_dir.glob("voice_*.npz"))
    assert exports

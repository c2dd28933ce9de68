"""Streaming chunked decode: seam consistency vs full decode."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.config import SynthesisConfig, VoiceConfig
from piper_tpu.models.vits.model import (
    init_synthesizer_params,
    synthesizer_latents,
    synthesizer_vocode,
)
from piper_tpu.runtime.streaming import StreamingDecoder, synthesize_stream_chunks
from piper_tpu.runtime.voice import TpuVoice
from piper_tpu.text.phonemize import FixturePhonemizer

REF_CONFIG = "/root/reference/etc/test_voice.onnx.json"
REF_JSONL = "/root/reference/etc/test_sentences/test_en-us.jsonl"


@pytest.fixture(scope="module")
def voice():
    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(1), model_cfg)
    return TpuVoice(
        params, model_cfg, config, seed=1,
        phonemizer=FixturePhonemizer(REF_JSONL),
        phoneme_buckets=[128, 256, 512],
        frame_buckets=[256, 512, 1024, 2048],
    )


def test_streaming_matches_full_decode(voice):
    recs = [json.loads(l) for l in open(REF_JSONL)]
    ids = recs[0]["phoneme_ids"]
    syn = SynthesisConfig(seed=11)

    chunks = list(synthesize_stream_chunks(voice, ids, syn=syn))
    assert len(chunks) > 2  # long enough to actually stream
    streamed = np.concatenate(chunks)

    full = voice.synthesize_ids_batch([ids], syn=syn)[0]
    # noise draw differs between the two paths only in shape batching;
    # lengths must agree structurally
    assert len(streamed) % voice.model_cfg.upsample_factor == 0

    # For an apples-to-apples seam test, decode the same z_p both ways.
    u = voice.model_cfg.upsample_factor
    inf = voice.config.inference
    keys = jnp.stack([jax.random.PRNGKey(123)])
    import numpy as _np

    bucket = 512
    ids_arr = _np.zeros((1, bucket), _np.int32)
    ids_arr[0, : len(ids)] = ids
    enc, frames_dev = voice._encode(
        voice.params, jnp.asarray(ids_arr), jnp.asarray([len(ids)], _np.int32),
        jnp.float32(inf.noise_w), jnp.float32(1.0), keys, None,
    )
    n_frames = int(frames_dev[0])
    fbucket = 2048 if n_frames > 1024 else 1024
    z_p, y_mask = synthesizer_latents(
        voice.params, enc, fbucket, cfg=voice.model_cfg,
        noise_scale=jnp.float32(inf.noise_scale), rng=jax.random.PRNGKey(7),
    )
    full_audio = np.asarray(
        synthesizer_vocode(voice.params, z_p, y_mask, cfg=voice.model_cfg)
    )[0, : n_frames * u]

    dec = StreamingDecoder(voice, chunk_frames=45, pad_frames=10)
    streamed2 = np.concatenate(list(dec.stream(z_p, n_frames)))
    assert len(streamed2) == len(full_audio)
    # interior seam error is bounded by the receptive field beyond the
    # 10-frame pad; assert close overall
    err = np.abs(streamed2 - full_audio)
    assert np.percentile(err, 99) < 5e-3
    assert err.mean() < 1e-3


def test_streaming_short_utterance(voice):
    recs = [json.loads(l) for l in open(REF_JSONL)]
    ids = recs[1]["phoneme_ids"][:40]  # short
    chunks = list(
        synthesize_stream_chunks(voice, ids, syn=SynthesisConfig(seed=2))
    )
    audio = np.concatenate(chunks)
    assert audio.size > 0

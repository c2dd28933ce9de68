"""Frame-bucket overflow (long-form) serving.

VERDICT r3 weak #2: a phrase whose frame count exceeds the largest
frame bucket must neither raise mid-serving (exact path) nor be
silently truncated (speculative path). Policy: decode in overlapping
windows of the max bucket (halo >= the decoder's receptive field) and
stitch — full-length audio, seam-consistent with an unbounded
monolithic decode. The reference handles unbounded lengths natively
(src/python_run/piper/voice.py:158); these tests pin the same
contract for the static-shape runtime.
"""

import numpy as np
import pytest

from piper_tpu.config import (
    AudioConfig,
    InferenceDefaults,
    ModelConfig,
    SynthesisConfig,
    VoiceConfig,
)
from piper_tpu.runtime.voice import TpuVoice


def tiny_cfg():
    return ModelConfig(
        num_symbols=64,
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
        spec_channels=33,
        segment_size=256,
        audio=AudioConfig(
            sample_rate=16000, filter_length=64, hop_length=16,
            win_length=64, mel_channels=20,
        ),
    )


def make_voice(params, cfg, frame_buckets, precision="parity", **kw):
    id_map = {chr(32 + i): [i] for i in range(cfg.num_symbols)}
    id_map.update({"_": [0], "^": [1], "$": [2]})
    vconfig = VoiceConfig(
        num_symbols=cfg.num_symbols, num_speakers=1,
        sample_rate=cfg.audio.sample_rate, espeak_voice="en-us",
        inference=InferenceDefaults(), phoneme_id_map=id_map,
    )
    return TpuVoice(
        params, cfg, vconfig, precision=precision,
        phoneme_buckets=[32], frame_buckets=frame_buckets, seed=0, **kw
    )


@pytest.fixture(scope="module")
def tiny_params():
    import jax

    from piper_tpu.models.vits.model import init_synthesizer_params

    cfg = tiny_cfg()
    return cfg, init_synthesizer_params(jax.random.PRNGKey(3), cfg)


def _overflow_ids_and_ref(cfg, params, max_fb, monolith_buckets=(2048,)):
    """ids + a length_scale that overflows max_fb, plus the monolithic
    reference waveform decoded in one window."""
    rng = np.random.default_rng(5)
    ids = rng.integers(3, cfg.num_symbols, 24).tolist()
    mono = make_voice(params, cfg, list(monolith_buckets))
    syn = SynthesisConfig(seed=11, length_scale=2.0)
    ref = mono.synthesize_ids_batch([ids], syn=syn)[0]
    frames = len(ref) // cfg.upsample_factor
    if frames <= max_fb:
        # push further: the duration predictor at random init can be
        # conservative; scale until we genuinely overflow the ladder
        syn = SynthesisConfig(seed=11, length_scale=8.0)
        ref = mono.synthesize_ids_batch([ids], syn=syn)[0]
        frames = len(ref) // cfg.upsample_factor
    assert frames > max_fb, "fixture must overflow the bucket ladder"
    assert frames <= monolith_buckets[-1]
    return ids, syn, ref, frames


def test_exact_path_longform_matches_monolith(tiny_params):
    cfg, params = tiny_params
    max_fb = 192
    ids, syn, ref, frames = _overflow_ids_and_ref(cfg, params, max_fb)

    voice = make_voice(params, cfg, [96, max_fb])
    out = voice.synthesize_ids_batch([ids], syn=syn)[0]

    # Full length — no mid-serving ValueError, no truncation.
    assert len(out) == len(ref) == frames * cfg.upsample_factor
    # Seam-consistent: windowed decode == monolithic decode (halo >=
    # receptive field; f32 parity mode, differences are XLA
    # fusion-level float noise).
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=0)


def test_speculative_path_longform_matches_monolith(tiny_params):
    cfg, params = tiny_params
    max_fb = 192
    ids, syn, ref_parity, frames = _overflow_ids_and_ref(cfg, params, max_fb)

    # Monolithic fast-mode reference (int16 wire quantization included).
    mono = make_voice(params, cfg, [2048], precision="fast")
    ref = mono.synthesize_ids_batch([ids], syn=syn)[0]
    assert len(ref) == frames * cfg.upsample_factor

    voice = make_voice(params, cfg, [96, max_fb], precision="fast")
    # Seed the frames-per-id estimator so submit() takes the
    # speculative zero-sync path immediately; the estimate clamps at
    # max_fb, the true count rides back in the packed header, and the
    # overflow re-decode must go long-form.
    voice._ratio = (2.0, 2.5)
    handle = voice.submit([ids], syn=syn)
    assert handle.get("spec") is not None, "must take the speculative path"
    out = voice.collect(handle)[0]

    assert len(out) == len(ref), "speculative path must not truncate"
    # bf16 compute: window-vs-monolith reassociation noise is larger
    # than parity mode but the waveforms must agree closely.
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0)
    # and not trivially so:
    assert np.max(np.abs(ref)) > 1e-3


def test_mixed_batch_long_and_short_rows(tiny_params):
    cfg, params = tiny_params
    max_fb = 192
    ids, syn, ref, frames = _overflow_ids_and_ref(cfg, params, max_fb)
    rng = np.random.default_rng(7)
    short_ids = rng.integers(3, cfg.num_symbols, 6).tolist()

    mono = make_voice(params, cfg, [2048])
    refs = mono.synthesize_ids_batch([ids, short_ids, short_ids], syn=syn)

    voice = make_voice(params, cfg, [96, max_fb])
    outs = voice.synthesize_ids_batch([ids, short_ids, short_ids], syn=syn)
    assert [len(o) for o in outs] == [len(r) for r in refs]
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(o, r, atol=2e-4, rtol=0)


def test_streaming_longform(tiny_params):
    from piper_tpu.runtime.streaming import synthesize_stream_chunks

    cfg, params = tiny_params
    max_fb = 192
    ids, syn, ref, frames = _overflow_ids_and_ref(cfg, params, max_fb)

    voice = make_voice(params, cfg, [96, max_fb])
    chunks = list(synthesize_stream_chunks(voice, ids, syn=syn))
    audio = np.concatenate(chunks)
    assert len(audio) == frames * cfg.upsample_factor
    assert np.all(np.isfinite(audio))
    # The streaming chunker trims its own pad context (reference
    # semantics, 10-frame pads < receptive field), so allow a looser
    # tolerance than the batch path — but the waveform must track the
    # monolithic decode, not just have the right length.
    err = np.max(np.abs(audio - ref))
    assert err < 0.1

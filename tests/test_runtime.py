"""Runtime tests: voice config contract, id mapping vs shipped
fixtures, bucketed batched synthesis, WAV output.

Uses the reference repo's own test fixtures (etc/test_voice.onnx.json
and etc/test_sentences/test_en-us.jsonl) as ground truth for the text
front end, and a random-weight voice for the synthesis smoke test
(the reference's test-voice ONNX binary is absent from this mount).
"""

import io
import json
import wave
from pathlib import Path

import numpy as np
import pytest

import jax

from piper_tpu.config import SynthesisConfig, VoiceConfig
from piper_tpu.models.vits.model import init_synthesizer_params
from piper_tpu.runtime.batching import group_by_bucket, pick_bucket
from piper_tpu.runtime.voice import SynthesisStats, TpuVoice
from piper_tpu.runtime.wav import audio_float_to_int16, read_wav, wav_bytes
from piper_tpu.text.phonemes import phonemes_to_ids
from piper_tpu.text.phonemize import FixturePhonemizer, split_sentences

REF_CONFIG = "/root/reference/etc/test_voice.onnx.json"
REF_JSONL = "/root/reference/etc/test_sentences/test_en-us.jsonl"


def test_voice_config_contract():
    cfg = VoiceConfig.from_file(REF_CONFIG)
    assert cfg.num_symbols == 130
    assert cfg.num_speakers == 1
    assert cfg.sample_rate == 16000
    assert cfg.espeak_voice == "en-us"
    assert cfg.inference.noise_scale == 0.667
    assert cfg.inference.noise_w == 0.8
    assert cfg.phoneme_id_map["_"] == [0]
    assert cfg.phoneme_id_map["^"] == [1]
    assert cfg.phoneme_id_map["$"] == [2]
    # round trip
    d = cfg.to_dict()
    cfg2 = VoiceConfig.from_dict(d)
    assert cfg2.num_symbols == cfg.num_symbols
    assert cfg2.phoneme_id_map == cfg.phoneme_id_map


def test_phoneme_ids_match_reference_fixtures():
    """Our phonemes_to_ids must reproduce the shipped phoneme_ids for
    every en-us fixture record (BOS/EOS/interspersed-PAD semantics)."""
    cfg = VoiceConfig.from_file(REF_CONFIG)
    # fixture ids were generated with the full espeak id map; use the
    # voice config map (same layout for en-us)
    n = 0
    with open(REF_JSONL) as f:
        for line in f:
            rec = json.loads(line)
            ids = phonemes_to_ids(rec["phonemes"], cfg.phoneme_id_map)
            assert ids == rec["phoneme_ids"], rec["text"][:40]
            n += 1
    assert n >= 5


def test_split_sentences():
    assert split_sentences("Hello there. How are you? Good!") == [
        "Hello there.", "How are you?", "Good!",
    ]
    assert split_sentences("no punctuation at all") == ["no punctuation at all"]


def test_bucketing():
    assert pick_bucket(1, [32, 64]) == 32
    assert pick_bucket(33, [32, 64]) == 64
    groups = dict(group_by_bucket([5, 40, 10, 64], [32, 64]))
    assert groups[32] == [0, 2]
    assert groups[64] == [1, 3]


def test_plan_packed_groups():
    from piper_tpu.runtime.batching import plan_packed_groups

    ladder = [256, 384, 512, 640, 768, 896, 1024, 1536, 2048, 4096]

    def p2(n):
        p = 1
        while p < n:
            p <<= 1
        return p

    # Representative serving batch: mixed lengths, 32 rows.
    ests = [237] * 5 + [316] * 5 + [345] * 5 + [404] * 5 \
        + [412] * 4 + [643] * 4 + [797] * 4
    groups = plan_packed_groups(ests, ladder, round_rows=p2)
    # Every row appears exactly once and fits its group's bucket.
    idx = sorted(i for _, rows in groups for i in rows)
    assert idx == list(range(len(ests)))
    for b, rows in groups:
        assert all(ests[i] <= b for i in rows)
    # Strictly beats decode-at-the-max-bucket (uniform) on padded
    # row-frames for this mix, and never does worse than uniform + one
    # dispatch charge by construction (uniform is a candidate
    # partition).
    padded = sum(p2(len(rows)) * b for b, rows in groups)
    assert padded < p2(len(ests)) * pick_bucket(max(ests), ladder)

    # Degenerate cases.
    assert plan_packed_groups([], ladder) == []
    assert plan_packed_groups([100], ladder, round_rows=p2) == [(256, [0])]
    # Power-of-two rounding can make splitting 3 equal rows cheaper
    # than padding to 4 — the DP must find that.
    g3 = plan_packed_groups([4000] * 3, ladder, round_rows=p2)
    assert sorted(len(r) for _, r in g3) == [1, 2]


def test_wav_roundtrip(tmp_path):
    audio = (np.sin(np.linspace(0, 100, 1600)) * 0.5).astype(np.float32)
    pcm = audio_float_to_int16(audio)
    b = wav_bytes(pcm, 16000)
    p = tmp_path / "t.wav"
    p.write_bytes(b)
    sr, data = read_wav(p)
    assert sr == 16000
    np.testing.assert_array_equal(data, pcm)


@pytest.fixture(scope="module")
def fixture_voice():
    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    assert model_cfg.audio.sample_rate == 16000
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    return TpuVoice(
        params, model_cfg, config,
        phonemizer=FixturePhonemizer(REF_JSONL),
        seed=0,
        phoneme_buckets=[64, 128, 256, 512],
        frame_buckets=[128, 256, 512, 1024, 2048],
    )


def test_synthesize_smoke(fixture_voice):
    """The reference smoke test floor: WAV >= 10000 bytes for one
    sentence (reference: src/cpp/test.cpp:52-55)."""
    text = "It takes the form of a multi-colored circular arc."
    stats = SynthesisStats()
    audio = fixture_voice.synthesize(text, stats=stats)
    assert audio.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        fixture_voice.synthesize_wav(text, w)
    assert len(buf.getvalue()) >= 10_000
    assert stats.audio_seconds > 0 and stats.infer_seconds > 0


def test_batched_equals_individual(fixture_voice):
    """Bucketed batch synthesis returns the same waveforms as one-by-one
    synthesis with the same seed."""
    recs = [json.loads(l) for l in open(REF_JSONL)][:4]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=7)
    batch = fixture_voice.synthesize_ids_batch(ids_list, syn=syn)
    for i, ids in enumerate(ids_list):
        solo = fixture_voice.synthesize_ids_batch([ids], syn=syn)[0]
        assert len(solo) == len(batch[i])
        np.testing.assert_allclose(batch[i], solo, atol=2e-4)


def test_sentence_silence(fixture_voice):
    recs = [json.loads(l) for l in open(REF_JSONL)][:1]
    text = recs[0]["text"]
    syn0 = SynthesisConfig(sentence_silence_seconds=0.0, seed=3)
    syn1 = SynthesisConfig(sentence_silence_seconds=0.25, seed=3)
    a0 = fixture_voice.synthesize(text, syn=syn0)
    a1 = fixture_voice.synthesize(text, syn=syn1)
    extra = len(a1) - len(a0)
    assert extra == int(0.25 * fixture_voice.config.sample_rate)
    assert np.all(a1[-extra:] == 0)


def test_overlong_sentence_is_split(fixture_voice):
    """A sentence whose ids exceed the largest phoneme bucket is split
    at word boundaries instead of raising."""
    from piper_tpu.runtime.voice import _split_phonemes

    # max_ids=11 -> budget 8 ids -> 4 phonemes per chunk at cost 2
    chunks = _split_phonemes(list("ab cd ef"), 11)
    assert all(len(c) <= 4 for c in chunks)
    assert [''.join(c) for c in chunks] == ["ab ", "cd ", "ef"]

    # multi-id phonemes (cost 3 each): tighter split
    chunks = _split_phonemes(list("abcd"), 11, id_cost=lambda p: 3)
    assert all(len(c) <= 2 for c in chunks)

    # 600 phonemes > max bucket 512 -> must synthesize without error
    words = ("phoneme stream " * 60).strip()
    phonemes = [list(words)]
    voice = fixture_voice
    orig = voice.phonemizer
    voice.phonemizer = lambda text, v="": phonemes
    try:
        audio = voice.synthesize("anything", syn=SynthesisConfig(seed=5))
        assert audio.size > 0
    finally:
        voice.phonemizer = orig


@pytest.fixture(scope="module")
def fast_voice():
    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    return TpuVoice(
        params, model_cfg, config,
        phonemizer=FixturePhonemizer(REF_JSONL),
        seed=0,
        precision="fast",
        phoneme_buckets=[64, 128, 256, 512],
        frame_buckets=[128, 256, 512, 1024, 2048],
    )


def test_speculative_matches_exact(fast_voice):
    """Batch 1 runs the exact path (calibrates the frames-per-id
    estimator); batch 2 runs the speculative path. Outputs must be
    identical (counter-mode noise is frame-bucket-invariant)."""
    recs = [json.loads(l) for l in open(REF_JSONL)][:6]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=3)
    assert fast_voice._ratio is None
    exact = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    assert fast_voice._ratio is not None
    spec = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    for a, b in zip(exact, spec):
        assert len(a) == len(b)
        np.testing.assert_array_equal(a, b)


def test_dispatch_fusion_matches(fast_voice):
    """After a batch plan recurs, the speculative path swaps its
    per-group decode + pack dispatches for one background-compiled
    fused executable. The audio must be identical (same ops, one
    executable) and the cache must report the plan ready."""
    import time as _time

    recs = [json.loads(l) for l in open(REF_JSONL)][:6]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=11)
    assert fast_voice._fusion
    baseline = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    # Recur the plan past the compile threshold.
    for _ in range(4):
        fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    # Wait for the background compile to land.
    deadline = _time.time() + 120
    while _time.time() < deadline:
        with fast_voice._fused_lock:
            states = {v[0] for v in fast_voice._fused_cache.values()}
        if "ready" in states:
            break
        assert "failed" not in states, "fused compile failed"
        _time.sleep(0.5)
    else:
        raise AssertionError("fused executable never became ready")
    fused_out = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    for a, b in zip(baseline, fused_out):
        np.testing.assert_array_equal(a, b)


def test_speculative_misprediction_recovery(fast_voice):
    """Force the estimator wrong in both directions: tiny upper ratio
    (bucket overflow -> re-decode) and tiny mean (packed-total
    truncation -> direct re-fetch). Output must stay exact."""
    recs = [json.loads(l) for l in open(REF_JSONL)][:5]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=9)
    baseline = fast_voice.synthesize_ids_batch(ids_list, syn=syn)

    # upper ratio far too small: every row overflows its bucket
    fast_voice._ratio = (0.01, 0.01)
    low = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    for a, b in zip(baseline, low):
        np.testing.assert_array_equal(a, b)

    # mean far too small with ample buckets: packed buffer truncates
    fast_voice._ratio = (0.001, 50.0)
    trunc = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    for a, b in zip(baseline, trunc):
        np.testing.assert_array_equal(a, b)


def test_spec_margin_adapts(fast_voice):
    """The packed-transfer headroom margin tightens on a steady
    workload (after a full hysteresis window of realized totals) and
    jumps back up after a forced shortfall — with exact audio
    throughout."""
    recs = [json.loads(l) for l in open(REF_JSONL)][:4]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=11)
    saved = (fast_voice._ratio, fast_voice._spec_margin,
             fast_voice._spec_calibrated,
             list(fast_voice._spec_need_hist))
    try:
        fast_voice._ratio = None
        fast_voice._spec_margin = 1.12
        fast_voice._spec_calibrated = False
        fast_voice._spec_need_hist.clear()
        baseline = fast_voice.synthesize_ids_batch(ids_list, syn=syn)

        for _ in range(6):
            out = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
        assert fast_voice._spec_calibrated
        assert fast_voice._spec_margin < 1.12
        assert fast_voice._spec_margin > 0.25
        for a, b in zip(baseline, out):
            np.testing.assert_array_equal(a, b)

        # Forced shortfall: margin far below the realized need ->
        # refetch path serves exact audio and the margin steps up.
        fast_voice._spec_margin = 0.05
        fast_voice._spec_need_hist.clear()
        short = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
        for a, b in zip(baseline, short):
            np.testing.assert_array_equal(a, b)
        assert fast_voice._spec_margin > 0.05
    finally:
        (fast_voice._ratio, fast_voice._spec_margin,
         fast_voice._spec_calibrated, hist) = saved
        fast_voice._spec_need_hist[:] = hist


def test_estimator_persistence(tmp_path):
    """With estimator_cache=True, calibrated estimators snapshot into
    the compilation-cache dir and a fresh voice instance loads them —
    its first batch takes the speculative path, with audio identical
    to the calibrating instance's."""
    import jax as _jax

    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    kw = dict(
        phonemizer=FixturePhonemizer(REF_JSONL), seed=0,
        precision="fast", phoneme_buckets=[64, 128, 256, 512],
        frame_buckets=[128, 256, 512, 1024, 2048],
        estimator_cache=True,
    )
    recs = [json.loads(l) for l in open(REF_JSONL)][:3]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=21)

    old_cache = _jax.config.jax_compilation_cache_dir
    _jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        v1 = TpuVoice(params, model_cfg, config, **kw)
        assert v1._ratio is None  # nothing to load yet
        baseline = v1.synthesize_ids_batch(ids_list, syn=syn)
        v1.synthesize_ids_batch(ids_list, syn=syn)
        snaps = list((tmp_path / "estimators").glob("*.json"))
        assert len(snaps) == 1

        v2 = TpuVoice(params, model_cfg, config, **kw)
        assert v2._ratio is not None
        assert v2._spec_calibrated
        assert v2._ratio == pytest.approx(v1._ratio)
        out = v2.synthesize_ids_batch(ids_list, syn=syn)
        for a, b in zip(baseline, out):
            np.testing.assert_array_equal(a, b)
    finally:
        _jax.config.update("jax_compilation_cache_dir", old_cache)


@pytest.fixture(scope="module")
def mulaw_voice():
    """Same graph/weights as fast_voice, mu-law packed wire."""
    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    return TpuVoice(
        params, model_cfg, config,
        phonemizer=FixturePhonemizer(REF_JSONL),
        seed=0,
        precision="fast",
        phoneme_buckets=[64, 128, 256, 512],
        frame_buckets=[128, 256, 512, 1024, 2048],
        wire_format="mulaw",
    )


def test_wire_mulaw_matches_int16_through_codec(fast_voice, mulaw_voice):
    """wire_format='mulaw' serving == the int16 wire's audio routed
    through the G.711 codec (the wire is lossy but deterministically
    so), on both the exact first batch and the speculative
    steady-state path."""
    from piper_tpu import native
    from piper_tpu.runtime import codec

    recs = [json.loads(l) for l in open(REF_JSONL)][:6]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=3)
    ref = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    assert mulaw_voice._ratio is None
    exact = mulaw_voice.synthesize_ids_batch(ids_list, syn=syn)
    assert mulaw_voice._ratio is not None
    spec = mulaw_voice.synthesize_ids_batch(ids_list, syn=syn)
    for r, a, b in zip(ref, exact, spec):
        # recover the device int16 wire samples from the float output
        # (exact: |f*32767 - i| << 0.5 for all int16)
        i16 = np.round(np.asarray(r) * 32767.0).astype(np.int16)
        expect = native.int16_to_float(
            codec.mulaw_decode(codec.mulaw_encode(i16))
        )
        np.testing.assert_array_equal(np.asarray(a), expect)
        np.testing.assert_array_equal(np.asarray(b), expect)


def test_wire_mulaw_misprediction_recovery(mulaw_voice):
    """Speculative re-decode/re-fetch rows must match the packed wire
    bit-exactly (they are routed through the same codec host-side)."""
    recs = [json.loads(l) for l in open(REF_JSONL)][:5]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=9)
    baseline = mulaw_voice.synthesize_ids_batch(ids_list, syn=syn)

    saved = mulaw_voice._ratio
    try:
        mulaw_voice._ratio = (0.01, 0.01)  # every row overflows
        low = mulaw_voice.synthesize_ids_batch(ids_list, syn=syn)
        for a, b in zip(baseline, low):
            np.testing.assert_array_equal(a, b)

        mulaw_voice._ratio = (0.001, 50.0)  # packed buffer truncates
        trunc = mulaw_voice.synthesize_ids_batch(ids_list, syn=syn)
        for a, b in zip(baseline, trunc):
            np.testing.assert_array_equal(a, b)
    finally:
        mulaw_voice._ratio = saved


def test_wire_mulaw_rejects_parity():
    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    with pytest.raises(ValueError, match="mulaw"):
        TpuVoice(
            params, model_cfg, config, precision="parity",
            wire_format="mulaw",
        )


def test_pack_total_pow2_matches_quantum(fast_voice):
    """pack_total='pow2' (the HTTP server's shape-stable default) must
    produce bit-identical audio to the default quantum sizing — only
    the padded tail of the packed transfer differs — and its static
    pack totals must be powers of two of the quantum."""
    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    v2 = TpuVoice(
        params, model_cfg, config,
        phonemizer=FixturePhonemizer(REF_JSONL),
        seed=0, precision="fast",
        phoneme_buckets=[64, 128, 256, 512],
        frame_buckets=[128, 256, 512, 1024, 2048],
        pack_total="pow2",
    )
    recs = [json.loads(l) for l in open(REF_JSONL)][:6]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=9)
    base = fast_voice.synthesize_ids_batch(ids_list, syn=syn)
    # calibrate, then take the speculative path under pow2 sizing
    out = v2.synthesize_ids_batch(ids_list, syn=syn)
    for a, b in zip(base, out):
        np.testing.assert_array_equal(a, b)
    handle = v2.submit(ids_list, syn=syn)
    spec = handle.get("spec")
    assert spec is not None
    body = spec["total"] - spec["a0"]
    q = TpuVoice._PACK_QUANTUM
    assert body >= q and (body & (body - 1)) == 0, body
    v2.collect(handle)


def test_pack_total_rejects_unknown():
    config = VoiceConfig.from_file(REF_CONFIG)
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    with pytest.raises(ValueError, match="pack_total"):
        TpuVoice(
            params, model_cfg, config, seed=0, precision="fast",
            pack_total="nope",
        )

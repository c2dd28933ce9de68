"""Cross-request dynamic batching (server admission queue).

VERDICT r3 weak #3: the reference server is batch-1 per request
(src/python_run/piper/http_server.py:103-123) and so was ours across
requests — N concurrent clients degenerated to N interleaved small
batches. The CoalescingBatcher gathers a few-ms window into one
device batch; these tests pin (a) result correctness vs solo serving,
(b) that coalescing actually happens, (c) mixed synthesis-parameter
isolation, and (d) the HTTP server end-to-end under concurrent load.
"""

import io
import json
import threading
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

import jax

from piper_tpu.config import SynthesisConfig
from piper_tpu.server.batcher import CoalescingBatcher

from test_longform import make_voice, tiny_cfg


@pytest.fixture(scope="module")
def tiny_voice():
    from piper_tpu.models.vits.model import init_synthesizer_params

    cfg = tiny_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(3), cfg)
    return make_voice(params, cfg, [128, 256])


def _request_sets(cfg, n=8):
    rng = np.random.default_rng(11)
    return [
        [rng.integers(3, cfg.num_symbols, int(rng.integers(4, 20))).tolist()]
        for _ in range(n)
    ]


def test_coalesced_results_match_solo(tiny_voice):
    voice = tiny_voice
    syn = SynthesisConfig(seed=5)
    req = _request_sets(voice.model_cfg, n=8)
    solo = [voice.synthesize_ids_batch(ids, syn=syn) for ids in req]

    submits = []
    orig_submit = voice.submit

    def counting_submit(ids_list, **kw):
        submits.append(len(ids_list))
        return orig_submit(ids_list, **kw)

    voice.submit = counting_submit
    batcher = CoalescingBatcher(voice, window_ms=100.0, max_batch=32)
    try:
        results = [None] * len(req)
        errors = []

        def worker(i):
            try:
                results[i] = batcher.synthesize_ids_batch(req[i], syn=syn)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(req))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors
        # (b) the window coalesced concurrent requests into fewer,
        # larger submits (8 single-utterance requests, 100 ms window).
        assert len(submits) < len(req)
        assert max(submits) > 1
        # (a) per-utterance content-hash keys make audio independent of
        # batch composition: coalesced == solo.
        for got, want in zip(results, solo):
            assert len(got) == len(want) == 1
            assert len(got[0]) == len(want[0])
            np.testing.assert_allclose(got[0], want[0], atol=1e-5, rtol=0)
    finally:
        voice.submit = orig_submit
        batcher.close()


def test_mixed_syn_keys_are_isolated(tiny_voice):
    voice = tiny_voice
    req = _request_sets(voice.model_cfg, n=4)
    syns = [
        SynthesisConfig(seed=5, length_scale=1.0),
        SynthesisConfig(seed=5, length_scale=2.0),
        SynthesisConfig(seed=5, length_scale=1.0),
        SynthesisConfig(seed=7, length_scale=1.0),
    ]
    solo = [
        voice.synthesize_ids_batch(ids, syn=s) for ids, s in zip(req, syns)
    ]
    batcher = CoalescingBatcher(voice, window_ms=100.0, max_batch=32)
    try:
        results = [None] * len(req)

        def worker(i):
            results[i] = batcher.synthesize_ids_batch(req[i], syn=syns[i])

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(req))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for got, want in zip(results, solo):
            assert got is not None
            np.testing.assert_allclose(got[0], want[0], atol=1e-5, rtol=0)
    finally:
        batcher.close()


def test_large_and_negative_seeds_match_solo(tiny_voice):
    """Seeds are normalized mod 2^32 everywhere (solo, streaming,
    batcher row seeds), so coalescing stays invisible for any Python
    int seed — including > 2^32 and negative (code-review finding)."""
    voice = tiny_voice
    req = _request_sets(voice.model_cfg, n=2)
    seeds = [(1 << 40) + 123, -7]
    solo = [
        voice.synthesize_ids_batch(ids, syn=SynthesisConfig(seed=s))
        for ids, s in zip(req, seeds)
    ]
    batcher = CoalescingBatcher(voice, window_ms=100.0, max_batch=32)
    try:
        results = [None] * 2

        def worker(i):
            results[i] = batcher.synthesize_ids_batch(
                req[i], syn=SynthesisConfig(seed=seeds[i])
            )

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for got, want in zip(results, solo):
            assert got is not None
            np.testing.assert_allclose(got[0], want[0], atol=1e-5, rtol=0)
    finally:
        batcher.close()


def test_batch_cap_is_respected(tiny_voice):
    """A multi-utterance request that would push a window past
    max_batch seeds the next window instead of compiling a
    never-warmed oversize batch (code-review finding)."""
    voice = tiny_voice
    rng = np.random.default_rng(3)
    reqs = [
        [rng.integers(3, 60, 8).tolist() for _ in range(6)]
        for _ in range(4)
    ]
    submits = []
    orig_submit = voice.submit

    def counting_submit(ids_list, **kw):
        submits.append(len(ids_list))
        return orig_submit(ids_list, **kw)

    voice.submit = counting_submit
    batcher = CoalescingBatcher(voice, window_ms=100.0, max_batch=8)
    try:
        results = [None] * len(reqs)

        def worker(i):
            results[i] = batcher.synthesize_ids_batch(
                reqs[i], syn=SynthesisConfig(seed=1)
            )

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(reqs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None and len(r) == 6 for r in results)
        assert max(submits) <= 8, submits
    finally:
        voice.submit = orig_submit
        batcher.close()


def test_close_never_strands_requests(tiny_voice):
    """Requests racing close() either complete or get the
    'batcher is closed' error — never a permanent event.wait() hang
    (code-review finding)."""
    voice = tiny_voice
    batcher = CoalescingBatcher(voice, window_ms=2.0, max_batch=8)
    outcomes = []

    def worker(i):
        try:
            batcher.synthesize_ids_batch(
                [[3, 4, 5, 6 + i]], syn=SynthesisConfig(seed=i)
            )
            outcomes.append("ok")
        except RuntimeError:
            outcomes.append("closed")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    batcher.close()
    for t in threads:
        t.join(timeout=120)
    assert not any(t.is_alive() for t in threads), "stranded request thread"
    assert len(outcomes) == 6


def test_batcher_error_propagates(tiny_voice):
    voice = tiny_voice
    batcher = CoalescingBatcher(voice, window_ms=1.0, max_batch=8)
    try:
        orig = voice.submit
        voice.submit = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("boom")
        )
        try:
            with pytest.raises(RuntimeError, match="boom"):
                batcher.synthesize_ids_batch([[3, 4, 5]], syn=SynthesisConfig())
        finally:
            voice.submit = orig
        # batcher still serves after an error
        out = batcher.synthesize_ids_batch(
            [[3, 4, 5, 6]], syn=SynthesisConfig(seed=1)
        )
        assert len(out) == 1 and len(out[0]) > 0
    finally:
        batcher.close()


@pytest.fixture(scope="module")
def text_voice():
    """Codepoint (phoneme_type='text') voice so the server can
    synthesize raw text without espeak."""
    import dataclasses

    from piper_tpu.config import (
        InferenceDefaults, ModelConfig, PhonemeType, VoiceConfig,
    )
    from piper_tpu.models.vits.model import init_synthesizer_params
    from piper_tpu.runtime.voice import TpuVoice

    cfg = dataclasses.replace(tiny_cfg(), num_symbols=256)
    params = init_synthesizer_params(jax.random.PRNGKey(4), cfg)
    id_map = {"_": [0], "^": [1], "$": [2]}
    for i in range(32, 127):
        id_map.setdefault(chr(i), [i])
    vconfig = VoiceConfig(
        num_symbols=256, num_speakers=1,
        sample_rate=cfg.audio.sample_rate, espeak_voice="en-us",
        inference=InferenceDefaults(), phoneme_id_map=id_map,
        phoneme_type=PhonemeType.TEXT,
    )
    return TpuVoice(
        params, cfg, vconfig, precision="parity",
        phoneme_buckets=[64, 128], frame_buckets=[128, 256, 512], seed=0,
    )


def test_http_server_concurrent_load(text_voice):
    """16 concurrent clients through the real HTTP server with the
    coalescing batcher attached: all succeed, and the device saw
    coalesced batches (not 16 x batch-1)."""
    from piper_tpu.server.http_server import serve

    voice = text_voice
    submits = []
    orig_submit = voice.submit

    def counting_submit(ids_list, **kw):
        submits.append(len(ids_list))
        return orig_submit(ids_list, **kw)

    voice.submit = counting_submit
    voice.batcher = CoalescingBatcher(voice, window_ms=30.0, max_batch=32)
    server = serve(voice, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # warm the shapes once so the timed burst measures serving
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?text=warm%20up%20request.&seed=1",
            timeout=300,
        ) as resp:
            resp.read()
        submits.clear()

        n_clients = 16
        payloads = [None] * n_clients
        errors = []

        def client(i):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/?text=Concurrent%20client"
                    f"%20number%20{i}%20speaking.&seed={i}",
                    timeout=300,
                ) as resp:
                    payloads[i] = resp.read()
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors
        for p in payloads:
            assert p is not None
            with wave.open(io.BytesIO(p), "rb") as w:
                assert w.getnframes() > 0
        # Coalescing must have happened: fewer submits than clients.
        assert len(submits) < n_clients, submits
    finally:
        server.shutdown()
        voice.batcher.close()
        voice.batcher = None
        voice.submit = orig_submit


# -- admission priorities / deadlines (ROADMAP #7) ---------------------


def _stub_voice(record, gate=None):
    """Pure-Python voice stand-in: submit() records dispatch order (and
    optionally blocks on `gate`), so priority/deadline behavior is
    deterministic with no device in the loop."""
    import types

    def submit(ids_list, syn=None, row_seeds=None):
        if gate is not None:
            gate.wait()
        record.append(list(ids_list))
        return [np.zeros(8, np.float32) for _ in ids_list]

    return types.SimpleNamespace(
        submit=submit,
        collect=lambda handle: handle,
        config=types.SimpleNamespace(
            sample_rate=16000,
            inference=types.SimpleNamespace(
                noise_scale=0.667, length_scale=1.0, noise_w=0.8
            ),
        ),
    )


def test_priority_orders_backlogged_queue():
    """While the dispatcher is busy, queued requests dispatch by
    syn.priority (lower first), FIFO within a priority."""
    record = []
    gate = threading.Event()
    batcher = CoalescingBatcher(
        _stub_voice(record, gate), window_ms=1.0, max_batch=1
    )
    try:
        results = {}

        def worker(tag, prio):
            results[tag] = batcher.synthesize_ids_batch(
                [[tag]], syn=SynthesisConfig(priority=prio)
            )

        t0 = threading.Thread(target=worker, args=(100, 0))
        t0.start()
        time.sleep(0.15)  # dispatcher now blocked in submit(A)
        later = [
            threading.Thread(target=worker, args=(tag, prio))
            for tag, prio in [(101, 5), (102, 0), (103, 9), (104, 5)]
        ]
        for t in later:
            t.start()
        time.sleep(0.15)  # all four queued behind the gate
        gate.set()
        for t in [t0, *later]:
            t.join(timeout=60)
        assert len(results) == 5
        order = [ids[0][0] for ids in record]
        # 100 dispatched first (it was in flight); the backlog drains
        # priority-first: 102 (prio 0), then 101 before 104 (FIFO at
        # prio 5), then 103 (prio 9).
        assert order == [100, 102, 101, 104, 103], order
    finally:
        batcher.close()


def test_deadline_sheds_queued_request():
    """A request still queued past its deadline_s is shed with
    DeadlineExceeded before reaching the device; others complete."""
    from piper_tpu.server.batcher import DeadlineExceeded

    record = []
    gate = threading.Event()
    batcher = CoalescingBatcher(
        _stub_voice(record, gate), window_ms=1.0, max_batch=1
    )
    try:
        outcome = {}

        def worker(tag, syn):
            try:
                outcome[tag] = batcher.synthesize_ids_batch([[tag]], syn=syn)
            except DeadlineExceeded:
                outcome[tag] = "shed"

        t0 = threading.Thread(target=worker, args=(1, SynthesisConfig()))
        t0.start()
        time.sleep(0.15)  # dispatcher blocked in submit(1)
        t1 = threading.Thread(
            target=worker, args=(2, SynthesisConfig(deadline_s=0.05))
        )
        t1.start()
        time.sleep(0.3)  # request 2's queue-wait deadline passes
        gate.set()
        t0.join(timeout=60)
        t1.join(timeout=60)
        assert outcome[2] == "shed"
        assert isinstance(outcome[1], list) and len(outcome[1]) == 1
        assert [ids[0][0] for ids in record] == [1]  # 2 never dispatched
    finally:
        batcher.close()


def test_http_deadline_returns_503(text_voice):
    """deadline_ms through the HTTP surface: a request shed in the
    admission queue returns 503; a concurrent normal request is 200."""
    from piper_tpu.server.http_server import serve

    voice = text_voice
    gate = threading.Event()
    orig_submit = voice.submit

    def gated_submit(ids_list, **kw):
        gate.wait()
        return orig_submit(ids_list, **kw)

    voice.submit = gated_submit
    voice.batcher = CoalescingBatcher(voice, window_ms=1.0, max_batch=1)
    server = serve(voice, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        status = {}

        def client(tag, qs):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/?text=hello%20there.&{qs}",
                    timeout=300,
                ) as resp:
                    status[tag] = resp.status
            except urllib.error.HTTPError as e:
                status[tag] = e.code

        t0 = threading.Thread(target=client, args=("ok", "seed=1"))
        t0.start()
        time.sleep(0.2)  # first request holds the gated dispatcher
        t1 = threading.Thread(
            target=client, args=("late", "seed=2&deadline_ms=50")
        )
        t1.start()
        time.sleep(0.4)  # the late request's queue deadline passes
        gate.set()
        t0.join(timeout=300)
        t1.join(timeout=300)
        assert status["ok"] == 200
        assert status["late"] == 503
    finally:
        server.shutdown()
        voice.batcher.close()
        voice.batcher = None
        voice.submit = orig_submit


def test_stream_slot_admission(text_voice):
    """/stream decode slots are capped: with 1 slot held, a second
    stream with a deadline is shed 503; the first completes 200."""
    from piper_tpu.server.http_server import serve

    voice = text_voice
    gate = threading.Event()
    calls = []
    orig_phonemize = voice.phonemize

    def gated_phonemize(text):
        # called after slot acquisition: the first stream holds its
        # slot here until released
        calls.append(text)
        if len(calls) == 1:
            gate.wait()
        return orig_phonemize(text)

    voice.phonemize = gated_phonemize
    server = serve(
        voice, host="127.0.0.1", port=0, stream_max_concurrent=1
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        status = {}

        def client(tag, qs):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stream?text=slot%20test.&{qs}",
                    timeout=300,
                ) as resp:
                    resp.read()
                    status[tag] = resp.status
            except urllib.error.HTTPError as e:
                status[tag] = e.code

        t0 = threading.Thread(target=client, args=("holder", "seed=1"))
        t0.start()
        for _ in range(100):  # wait until the slot is held
            if calls:
                break
            time.sleep(0.05)
        assert calls, "first stream never started"
        t1 = threading.Thread(
            target=client, args=("shed", "seed=2&deadline_ms=100")
        )
        t1.start()
        t1.join(timeout=300)
        gate.set()
        t0.join(timeout=300)
        assert status["shed"] == 503
        assert status["holder"] == 200
    finally:
        server.shutdown()
        voice.phonemize = orig_phonemize


def test_stream_decoder_is_cached(tiny_voice):
    """synthesize_stream_chunks reuses one StreamingDecoder per chunk
    shape instead of re-tracing the chunk vocoder every request."""
    from piper_tpu.runtime.streaming import synthesize_stream_chunks

    voice = tiny_voice
    voice._stream_decoders.clear()
    ids = [3, 4, 5, 6, 7, 8]
    a1 = np.concatenate(
        list(synthesize_stream_chunks(voice, ids, syn=SynthesisConfig(seed=2)))
    )
    assert len(voice._stream_decoders) == 1
    dec = next(iter(voice._stream_decoders.values()))
    a2 = np.concatenate(
        list(synthesize_stream_chunks(voice, ids, syn=SynthesisConfig(seed=2)))
    )
    assert next(iter(voice._stream_decoders.values())) is dec
    np.testing.assert_allclose(a1, a2, atol=1e-6, rtol=0)


def test_metrics_endpoint(text_voice):
    """GET /metrics exposes server counters and batcher stats."""
    from piper_tpu.server.http_server import serve

    voice = text_voice
    voice.batcher = CoalescingBatcher(voice, window_ms=2.0, max_batch=8)
    server = serve(voice, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?text=metrics%20probe.&seed=1",
            timeout=300,
        ) as resp:
            assert resp.status == 200
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=60
        ) as resp:
            m = json.loads(resp.read())
        assert m["wav_requests"] == 1
        assert m["uptime_s"] >= 0
        assert m["streams_active"] == 0
        b = m["batcher"]
        assert b is not None
        assert b["requests"] >= 1 and b["batches"] >= 1
        assert b["utterances"] >= 1
        assert b["shed_deadline"] == 0
    finally:
        server.shutdown()
        voice.batcher.close()
        voice.batcher = None

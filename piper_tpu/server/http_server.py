"""HTTP TTS server.

Counterpart of the reference Flask server
(src/python_run/piper/http_server.py:17-127): GET or POST `/` with
`text` (query param, form body, or raw/JSON body) returns a WAV.
Optional query params: speaker_id, length_scale, noise_scale, noise_w,
sentence_silence, seed.

Built on the stdlib ThreadingHTTPServer (no Flask dependency); device
work is serialized through the voice's jit functions, which are
thread-safe (JAX dispatch) — concurrent requests batch naturally when
using the /batch endpoint.

Extra endpoints beyond the reference:
  POST /batch  — JSON {"texts": [...]} -> JSON list of base64 WAVs
  GET  /stream — chunked raw PCM as it is decoded (45-frame vocoder
                 chunks; first audio before the full utterance is
                 synthesized). `format=s16le` (default) or
                 `format=mulaw` (G.711, half the bytes).
  GET  /health — liveness + voice metadata
  GET  /metrics — serving counters (requests, shed deadlines, active
                 streams, coalescing-batcher batch/utterance totals)
"""

from __future__ import annotations

import base64
import json
import logging
import urllib.parse

import numpy as np
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from ..config import SynthesisConfig
from ..runtime.voice import SynthesisStats, TpuVoice
from ..runtime.wav import audio_float_to_int16, wav_bytes

_LOGGER = logging.getLogger("piper_tpu.http_server")


def make_handler(
    voice: TpuVoice,
    default_syn: SynthesisConfig,
    stream_slots=None,
):
    import time as _time

    # Server-level gauges/counters, exposed by GET /metrics. Written
    # from request threads: int += is atomic under the GIL.
    metrics = {
        "started_monotonic": _time.monotonic(),
        "wav_requests": 0,
        "wav_shed_deadline": 0,
        "streams_served": 0,
        "streams_active": 0,
        "streams_shed": 0,
    }

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked /stream needs 1.1

        def log_message(self, fmt, *args):
            _LOGGER.debug(fmt, *args)

        def _syn_from_query(self, query) -> SynthesisConfig:
            syn = SynthesisConfig(**{**default_syn.__dict__})
            if "speaker_id" in query:
                syn.speaker_id = int(query["speaker_id"][0])
            if "speaker" in query and voice.config.speaker_id_map:
                syn.speaker_id = voice.config.speaker_id_map.get(
                    query["speaker"][0], syn.speaker_id
                )
            for k in ("length_scale", "noise_scale", "noise_w"):
                if k in query:
                    setattr(syn, k, float(query[k][0]))
            if "sentence_silence" in query:
                syn.sentence_silence_seconds = float(query["sentence_silence"][0])
            if "seed" in query:
                syn.seed = int(query["seed"][0])
            # admission-queue controls (used when cross-request
            # batching is on; lower priority dispatches sooner)
            if "priority" in query:
                syn.priority = int(query["priority"][0])
            if "deadline_ms" in query:
                syn.deadline_s = float(query["deadline_ms"][0]) / 1000.0
            return syn

        def _respond_wav(self, text: str, syn: SynthesisConfig):
            from .batcher import DeadlineExceeded

            if not text.strip():
                self.send_error(400, "no text provided")
                return
            stats = SynthesisStats()
            metrics["wav_requests"] += 1
            try:
                audio = voice.synthesize(text.strip(), syn=syn, stats=stats)
            except DeadlineExceeded as e:
                metrics["wav_shed_deadline"] += 1
                self.send_error(503, str(e))
                return
            payload = wav_bytes(audio, voice.config.sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.send_header("X-RTF", f"{stats.real_time_factor:.5f}")
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/stream":
                query = urllib.parse.parse_qs(parsed.query)
                text = query.get("text", [""])[0]
                if not text.strip():
                    self.send_error(400, "no text provided")
                    return
                syn = self._syn_from_query(query)
                fmt = query.get("format", ["s16le"])[0]
                from ..runtime.codec import RAW_FORMATS, encode_chunk
                from ..runtime.streaming import synthesize_stream_chunks

                if fmt not in RAW_FORMATS:
                    self.send_error(
                        400, f"unknown format {fmt!r} (one of {RAW_FORMATS})"
                    )
                    return
                # Stream admission: each /stream holds a decode slot
                # for its whole lifetime (it owns the device in 45-frame
                # chunks), so unbounded concurrent streams would thrash
                # every client's time-to-first-chunk. Waiting is bounded
                # by the request's deadline_s (503 on expiry); without a
                # deadline the request queues for a slot indefinitely.
                if stream_slots is not None:
                    # timeout=None blocks until a slot frees
                    if not stream_slots.acquire(timeout=syn.deadline_s):
                        metrics["streams_shed"] += 1
                        self.send_error(
                            503,
                            "stream shed: no decode slot within "
                            f"deadline_s={syn.deadline_s}",
                        )
                        return
                metrics["streams_active"] += 1
                try:
                    self._stream_body(text, syn, fmt)
                    metrics["streams_served"] += 1
                finally:
                    metrics["streams_active"] -= 1
                    if stream_slots is not None:
                        stream_slots.release()
                return
            if parsed.path == "/metrics":
                body = dict(metrics)
                body["uptime_s"] = round(
                    _time.monotonic() - body.pop("started_monotonic"), 3
                )
                body["batcher"] = (
                    dict(voice.batcher.stats)
                    if voice.batcher is not None
                    else None
                )
                # speculative-transfer margin: the live calibration
                # state behind packed-transfer sizing (diagnosing
                # refetch/redecode regressions; see runtime/voice.py)
                body["spec_margin"] = round(
                    getattr(voice, "_spec_margin", 0.0), 4
                )
                payload = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            if parsed.path == "/health":
                body = json.dumps(
                    {
                        "status": "ok",
                        "sample_rate": voice.config.sample_rate,
                        "num_speakers": voice.config.num_speakers,
                        "espeak_voice": voice.config.espeak_voice,
                        "precision": voice.precision,
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            query = urllib.parse.parse_qs(parsed.query)
            text = query.get("text", [""])[0]
            self._respond_wav(text, self._syn_from_query(query))

        def _stream_body(self, text: str, syn: SynthesisConfig, fmt: str):
            from ..runtime.codec import encode_chunk
            from ..runtime.streaming import synthesize_stream_chunks

            self.send_response(200)
            self.send_header(
                "Content-Type",
                "audio/L16" if fmt == "s16le" else "audio/x-mulaw",
            )
            self.send_header(
                "X-Sample-Rate", str(voice.config.sample_rate)
            )
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                for sentence in voice.phonemize(text.strip()):
                    ids = voice.phonemes_to_ids(sentence)
                    for chunk in synthesize_stream_chunks(
                        voice, ids, syn=syn
                    ):
                        # fixed scaling (no per-chunk peak normalize:
                        # the global peak is unknown mid-stream)
                        pcm = encode_chunk(chunk, fmt)
                        self.wfile.write(
                            f"{len(pcm):X}\r\n".encode()
                        )
                        self.wfile.write(pcm)
                        self.wfile.write(b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            except BrokenPipeError:
                pass

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")

            if parsed.path == "/batch":
                try:
                    obj = json.loads(body)
                    texts = obj["texts"]
                except (json.JSONDecodeError, KeyError):
                    self.send_error(400, "expected JSON {'texts': [...]}")
                    return
                syn = self._syn_from_query(urllib.parse.parse_qs(parsed.query))
                ids_list = []
                for t in texts:
                    phonemes = voice.phonemize(t)
                    ids = []
                    for sent in phonemes:
                        ids.extend(voice.phonemes_to_ids(sent))
                    ids_list.append(ids)
                batch_fn = (
                    voice.batcher.synthesize_ids_batch
                    if voice.batcher is not None
                    else voice.synthesize_ids_batch
                )
                from .batcher import DeadlineExceeded

                try:
                    audios = batch_fn(ids_list, syn=syn)
                except DeadlineExceeded as e:
                    self.send_error(503, str(e))
                    return
                out = [
                    base64.b64encode(
                        wav_bytes(
                            audio_float_to_int16(a), voice.config.sample_rate
                        )
                    ).decode()
                    for a in audios
                ]
                payload = json.dumps({"wavs": out}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return

            query = urllib.parse.parse_qs(parsed.query)
            if "application/json" in ctype:
                try:
                    text = json.loads(body).get("text", "")
                except json.JSONDecodeError:
                    text = ""
            elif "application/x-www-form-urlencoded" in ctype:
                form = urllib.parse.parse_qs(body.decode("utf-8"))
                text = form.get("text", [""])[0]
            else:
                text = body.decode("utf-8")
            text = query.get("text", [text])[0]
            self._respond_wav(text, self._syn_from_query(query))

    return Handler


def serve(
    voice: TpuVoice,
    host: str = "0.0.0.0",
    port: int = 5000,
    syn: Optional[SynthesisConfig] = None,
    stream_max_concurrent: int = 4,
) -> ThreadingHTTPServer:
    import threading

    stream_slots = (
        threading.BoundedSemaphore(stream_max_concurrent)
        if stream_max_concurrent > 0
        else None
    )
    handler = make_handler(voice, syn or SynthesisConfig(), stream_slots)
    server = ThreadingHTTPServer((host, port), handler)
    _LOGGER.info("Serving on http://%s:%s", host, port)
    return server


def main(argv=None):
    import time

    from ..__main__ import build_parser, load_voice

    parser = build_parser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument(
        "--warmup", choices=["off", "encode", "full", "background"],
        default="background",
        help="Pre-compile serving shapes. 'background' (default) binds "
        "the port immediately and warms the full ladder on a daemon "
        "thread — the first request pays only its OWN shape's "
        "compile/cache-load instead of the whole ladder; 'full' "
        "blocks until every decode bucket, the packed-transfer "
        "kernels, and the speculative estimator seed are compiled; "
        "compiled code persists in PIPER_TPU_CACHE so later starts "
        "take seconds",
    )
    parser.add_argument(
        "--warmup-batch-sizes", default="1,8",
        help="Comma-separated batch sizes to warm (see --warmup)",
    )
    parser.add_argument(
        "--batch-window-ms", type=float, default=4.0,
        help="Cross-request coalescing window: concurrent requests "
        "arriving within this window share one device batch "
        "(0 disables; default 4 ms)",
    )
    parser.add_argument(
        "--batch-max", type=int, default=None,
        help="Utterance cap per coalesced batch (default: the largest "
        "warmed batch size)",
    )
    parser.add_argument(
        "--stream-max-concurrent", type=int, default=4,
        help="Decode-slot cap for concurrent /stream requests (each "
        "stream owns the device in small chunks, so unbounded "
        "concurrency thrashes time-to-first-chunk; excess streams "
        "queue for a slot, bounded by their deadline_ms; 0 = no cap)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)
    # Server defaults differ from the CLI's: coalesced batches change
    # composition every window, so shape-stable pack totals (pow2) and
    # one decode group per batch (uniform) keep steady-state serving
    # free of mid-run jits (each fresh pack compile costs seconds on a
    # tunneled chip and serialized onto request latency).
    if args.pack_total is None:
        args.pack_total = "pow2"
    if args.decode_grouping is None:
        args.decode_grouping = "uniform"
    voice = load_voice(args)
    sizes = tuple(int(s) for s in args.warmup_batch_sizes.split(",") if s)
    if args.batch_window_ms > 0:
        from .batcher import CoalescingBatcher

        voice.batcher = CoalescingBatcher(
            voice,
            window_ms=args.batch_window_ms,
            max_batch=args.batch_max or max(sizes),
        )

    def _warm(kind):
        t0 = time.perf_counter()
        voice.warmup(sizes, full=kind in ("full", "background"))
        _LOGGER.info(
            "warmup(%s, batch_sizes=%s) in %.1fs",
            kind, sizes, time.perf_counter() - t0,
        )

    if args.warmup in ("encode", "full"):
        _warm(args.warmup)
    elif args.warmup == "background":
        import threading

        threading.Thread(
            target=_warm, args=("background",), daemon=True,
            name="piper-tpu-warmup",
        ).start()
    syn = SynthesisConfig(
        speaker_id=args.speaker,
        length_scale=args.length_scale,
        noise_scale=args.noise_scale,
        noise_w=args.noise_w,
        sentence_silence_seconds=args.sentence_silence,
        seed=args.seed,
    )
    server = serve(
        voice, args.host, args.port, syn,
        stream_max_concurrent=args.stream_max_concurrent,
    )
    server.serve_forever()


if __name__ == "__main__":
    main()

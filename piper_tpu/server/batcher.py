"""Cross-request dynamic batching.

The reference HTTP server synthesizes batch-1 per request — each Flask
request runs its own ONNX session call
(src/python_run/piper/http_server.py:103-123) — the structural
throughput limit this framework exists to beat. The TpuVoice pipeline
batches *within* a request; this module coalesces *across* requests:
N concurrent single-sentence clients ride one device batch.

Design: request threads enqueue their phrase id-lists and block on an
event. A dispatcher thread gathers a few-ms window (capped at
`max_batch` utterances), groups by the device-relevant synthesis
parameters, and calls `voice.submit()` once per group — handles flow
to a collector thread, so consecutive windows pipeline exactly like
the benchmark's in-flight batches. Waveform order within a request is
preserved; under a fixed `syn.seed` the voice's per-utterance
content-hash keys make each utterance's audio identical regardless of
batch composition, so coalescing is semantically invisible.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import List, Optional, Sequence

from ..config import SynthesisConfig

_LOGGER = logging.getLogger(__name__)


class _Pending:
    __slots__ = ("ids_list", "syn", "key", "event", "results", "error")

    def __init__(self, ids_list, syn, key):
        self.ids_list = ids_list
        self.syn = syn
        self.key = key
        self.event = threading.Event()
        self.results: Optional[list] = None
        self.error: Optional[BaseException] = None


def _syn_key(voice, syn: SynthesisConfig):
    """Device-relevant synthesis parameters: requests may share one
    submit() only when these agree (silence/volume are applied
    host-side after synthesis and do not gate batching; SEEDS are
    per-row — submit(row_seeds=...) derives each utterance's noise key
    independently, so differently-seeded requests still coalesce)."""
    inf = voice.config.inference
    return (
        syn.speaker_id,
        syn.noise_scale if syn.noise_scale is not None else inf.noise_scale,
        syn.length_scale if syn.length_scale is not None else inf.length_scale,
        syn.noise_w if syn.noise_w is not None else inf.noise_w,
    )


class CoalescingBatcher:
    """Admission queue in front of a TpuVoice's batched pipeline."""

    def __init__(
        self,
        voice,
        *,
        window_ms: float = 4.0,
        max_batch: int = 32,
        max_queue: int = 1024,
    ):
        self.voice = voice
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self._q: "queue.Queue" = queue.Queue(max_queue)
        self._handles: "queue.Queue" = queue.Queue()
        self._closed = False
        # Guards the closed-flag/sentinel pair: no request may enqueue
        # after the shutdown sentinel (it would strand its thread in
        # event.wait() forever).
        self._close_lock = threading.Lock()
        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, daemon=True,
            name="piper-tpu-batch-dispatch",
        )
        self._collector = threading.Thread(
            target=self._collect_loop, daemon=True,
            name="piper-tpu-batch-collect",
        )
        self._dispatcher.start()
        self._collector.start()

    # -- request side --------------------------------------------------

    def synthesize_ids_batch(
        self,
        ids_list: Sequence[Sequence[int]],
        *,
        syn: Optional[SynthesisConfig] = None,
        stats=None,
    ) -> List:
        """Drop-in for TpuVoice.synthesize_ids_batch; blocks the
        calling (request) thread until its waveforms are ready."""
        import time

        if not ids_list:
            return []
        syn = syn or SynthesisConfig()
        t0 = time.perf_counter()
        p = _Pending(list(ids_list), syn, _syn_key(self.voice, syn))
        with self._close_lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            try:
                # non-blocking: a blocking put would hold the close
                # lock and deadlock close(); at max_queue depth the
                # server is overloaded and should shed load anyway
                self._q.put_nowait(p)
            except queue.Full:
                raise RuntimeError(
                    "batcher admission queue full (overloaded)"
                ) from None
        p.event.wait()
        if p.error is not None:
            raise p.error
        if stats is not None:
            stats.infer_seconds += time.perf_counter() - t0
            stats.audio_seconds += sum(
                len(r) for r in p.results
            ) / self.voice.config.sample_rate
        return p.results

    def close(self) -> None:
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._dispatcher.join(timeout=5)
        self._handles.put(None)
        self._collector.join(timeout=5)

    # -- worker side ---------------------------------------------------

    def _dispatch_loop(self) -> None:
        import time

        carry = None
        while True:
            first = carry if carry is not None else self._q.get()
            carry = None
            if first is None:
                return
            group = [first]
            n = len(first.ids_list)
            deadline = time.monotonic() + self.window_s
            while n < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    p = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if p is None:
                    self._flush(group)
                    return
                if n + len(p.ids_list) > self.max_batch and n > 0:
                    # Would exceed the warmed-shape cap: this request
                    # seeds the NEXT window instead (never compile a
                    # never-warmed oversize batch mid-serving).
                    carry = p
                    break
                group.append(p)
                n += len(p.ids_list)
            self._flush(group)

    def _flush(self, group: List[_Pending]) -> None:
        by_key: dict = {}
        for p in group:
            by_key.setdefault(p.key, []).append(p)
        for ps in by_key.values():
            ids: List = []
            seeds: List = []
            spans = []
            for p in ps:
                spans.append((p, len(ids), len(ids) + len(p.ids_list)))
                ids.extend(p.ids_list)
                seeds.extend([p.syn.seed] * len(p.ids_list))
            try:
                handle = self.voice.submit(
                    ids, syn=ps[0].syn, row_seeds=seeds
                )
            except BaseException as e:  # noqa: BLE001 - propagate to waiters
                for p in ps:
                    p.error = e
                    p.event.set()
                continue
            _LOGGER.debug(
                "coalesced %d requests (%d utterances) into one batch",
                len(ps), len(ids),
            )
            self._handles.put((handle, spans))

    def _collect_loop(self) -> None:
        while True:
            item = self._handles.get()
            if item is None:
                return
            handle, spans = item
            try:
                audios = self.voice.collect(handle)
            except BaseException as e:  # noqa: BLE001
                for p, _a, _b in spans:
                    p.error = e
                    p.event.set()
                continue
            for p, a, b in spans:
                p.results = audios[a:b]
                p.event.set()

"""Profiling and observability.

The reference ships only wall-clock RTF counters (SURVEY.md §5 —
tracing "none"). Here profiling is first-class:

- RTF / audio-seconds-per-second counters: SynthesisStats (voice.py).
- Device traces: `with device_trace(dir):` wraps jax.profiler and
  produces TensorBoard/Perfetto-compatible traces of the XLA/Pallas
  execution.
- Per-stage timers: StageTimer accumulates named host-side spans and
  reports a JSON breakdown (used by bench/infer with --profile).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock span accumulator."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(
                    1000 * self.totals[name] / max(self.counts[name], 1), 2
                ),
            }
            for name in sorted(self.totals)
        }

    def dump(self) -> str:
        return json.dumps(self.report(), indent=2)


def annotate(name: str):
    """Decorator: mark a function as a named trace span (shows up in
    jax.profiler device traces via TraceAnnotation)."""

    def wrap(fn):
        def inner(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return inner

    return wrap

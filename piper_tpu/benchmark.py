"""Benchmark harness with the reference's stdin-JSONL protocol.

Parity: src/benchmark/benchmark_onnx.py — reads {"phoneme_ids": [...]}
JSONL from stdin, synthesizes each utterance, and prints a JSON report
{load_sec, rtf_mean, rtf_stdev, rtfs[]}.

Extensions: --batch mode reports batched throughput
(audio-seconds/s/chip) alongside per-utterance RTF, and --repeat for
steady-state timing after compilation.

Usage:
  python -m piper_tpu.benchmark -m voice.npz < test_en-us.jsonl
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from typing import List

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-c", "--config")
    p.add_argument("--precision", choices=("fast", "parity"), default="fast")
    p.add_argument("--batch", action="store_true",
                   help="Also measure batched throughput")
    p.add_argument("--repeat", type=int, default=1,
                   help="Timing repetitions (after warmup)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from .config import SynthesisConfig
    from .runtime.voice import TpuVoice

    start = time.perf_counter()
    voice = TpuVoice.load(args.model, args.config, precision=args.precision,
                          estimator_cache=True)
    load_sec = time.perf_counter() - start

    utterances: List[List[int]] = []
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        utterances.append(json.loads(line)["phoneme_ids"])

    syn = SynthesisConfig(seed=args.seed)
    sr = voice.config.sample_rate

    # Warmup/compile on the full set.
    voice.synthesize_ids_batch(utterances, syn=syn)

    # Per-utterance RTF (reference protocol: one at a time).
    rtfs: List[float] = []
    for ids in utterances:
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            audio = voice.synthesize_ids_batch([ids], syn=syn)[0]
            dt = time.perf_counter() - t0
            best = min(best, dt)
        audio_sec = len(audio) / sr
        if audio_sec > 0:
            rtfs.append(best / audio_sec)

    report = {
        "load_sec": load_sec,
        "rtf_mean": statistics.mean(rtfs) if rtfs else None,
        "rtf_stdev": statistics.stdev(rtfs) if len(rtfs) > 1 else 0.0,
        "rtfs": rtfs,
    }

    if args.batch:
        times = []
        audio_sec = 0.0
        for _ in range(max(args.repeat, 3)):
            t0 = time.perf_counter()
            out = voice.synthesize_ids_batch(utterances, syn=syn)
            times.append(time.perf_counter() - t0)
            audio_sec = sum(len(a) for a in out) / sr
        batch_wall = float(np.median(times))
        n_chips = max(jax.device_count(), 1)
        report["batch"] = {
            "utterances": len(utterances),
            "audio_seconds": audio_sec,
            "wall_s": batch_wall,
            "audio_seconds_per_s_per_chip": audio_sec / batch_wall / n_chips,
            "rtf": batch_wall / audio_sec,
        }

    json.dump(report, sys.stdout)
    print("")


if __name__ == "__main__":
    main()

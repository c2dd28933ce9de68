#!/usr/bin/env python
"""Benchmark: audio-seconds/s/chip for batched VITS synthesis.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.md): >=50x realtime audio-seconds/s/chip,
medium-quality voice, batch 32, on one TPU v5e chip. vs_baseline is
value / 50.

Methodology mirrors the reference harness semantics
(src/benchmark/benchmark_onnx.py): pre-tokenized phoneme ids in,
waveform out, wall-clock end-to-end on device including host
orchestration; warmup excluded. Sentences come from the reference's
en-us fixture set; the voice is random-weight medium quality (the
graph/compute is identical to a trained voice).
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--vocoder", default="hifigan",
                    choices=["hifigan", "mb_istft"])
    ap.add_argument("--variant", default="vits", choices=["vits", "vits2"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--precision", default="fast", choices=["fast", "parity"])
    ap.add_argument(
        "--wire", default="int16", choices=["int16", "mulaw"],
        help="packed-transfer wire format: int16 (lossless PCM, the "
        "headline) or mulaw (G.711, 1 byte/sample — halves link bytes "
        "per audio-second on bandwidth-bound hosts; lossy, reported as "
        "a secondary number)",
    )
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    import os
    from pathlib import Path

    import jax

    # Persistent compilation cache: PIPER_TPU_CACHE wins; else a
    # .jax_cache next to this script (the repo checkout); else the
    # runtime's default (~/.cache/piper_tpu/jax) kicks in on voice load.
    cache = os.environ.get("PIPER_TPU_CACHE") or str(
        Path(__file__).resolve().parent / ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from piper_tpu.runtime.voice import TpuVoice
    from piper_tpu.config import SynthesisConfig

    # Fixture sentences (pre-phonemized ids, reference test set).
    ids_list = []
    with open("/root/reference/etc/test_sentences/test_en-us.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            ids_list.append(rec["phoneme_ids"])
    while len(ids_list) < args.batch:
        ids_list = ids_list + ids_list
    ids_list = ids_list[: args.batch]

    # Finer frame buckets cut padded-tail device->host bytes (the
    # bottleneck on tunneled chips) at the cost of more one-time
    # compilations (persistently cached).
    # One phoneme bucket (encoder padding is cheap; one encode dispatch
    # and one duration sync per batch); fine frame buckets minimize
    # padded device->host audio bytes — the bottleneck on tunneled
    # chips is the host link, and compute hides behind it.
    # decode_grouping="uniform": the tunneled host link makes dispatch
    # round-trips, not FLOPs, the scarce resource — one decode shape
    # per frame bucket, ~4 dispatches per batch, minimal cold start.
    voice = TpuVoice.random(
        args.quality, num_symbols=256, seed=0, precision=args.precision,
        vocoder=args.vocoder, variant=args.variant,
        phoneme_buckets=[512],
        frame_buckets=[256, 384, 512, 640, 768, 896, 1024, 1536, 2048, 4096],
        decode_grouping="uniform",
        wire_format=args.wire,
        estimator_cache=True,
    )
    sr = voice.config.sample_rate
    syn = SynthesisConfig(seed=0)

    # Warmup (compilation): warm-everything path — heavy vocode shapes
    # compile concurrently and persist in the compilation cache, so a
    # later process's cold start is seconds (docs/BENCH_NOTES.md).
    t0 = time.perf_counter()
    voice.warmup((args.batch,), full=True)
    out = voice.synthesize_ids_batch(ids_list, syn=syn)
    load_sec = time.perf_counter() - t0

    audio_seconds = sum(len(a) for a in out) / sr

    # Let the speculative estimators settle (frames-per-id ratio and
    # the packed-transfer margin snap within the first few batches;
    # each snap re-sizes the transfer = a one-time jit shape) so the
    # timed regions below see steady-state serving.
    for _ in range(6):
        voice.synthesize_ids_batch(ids_list, syn=syn)

    # Sequential (latency) timing.
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = voice.synthesize_ids_batch(ids_list, syn=syn)
        times.append(time.perf_counter() - t0)
    seq_sec = float(np.median(times))

    # Pipelined (throughput) timing: keep 3 batches in flight so the
    # next batches' device work and transfers overlap the current
    # collect (measured ~2-3% over double buffering — the third slot
    # hides the submit/collect host gaps, deeper adds nothing).
    n_pipe = max(args.reps * 2, 8)
    depth = 3
    t0 = time.perf_counter()
    inflight = [voice.submit(ids_list, syn=syn) for _ in range(depth)]
    done = 0
    while done < n_pipe:
        handle = inflight.pop(0)
        if done + len(inflight) + 1 < n_pipe:
            inflight.append(voice.submit(ids_list, syn=syn))
        voice.collect(handle)
        done += 1
    infer_sec = (time.perf_counter() - t0) / n_pipe

    # Host-link diagnostic: the tunneled d2h link (10-50 MB/s,
    # fluctuating) is the serving bottleneck in this environment —
    # compute is fully hidden behind the transfer. Report the momentary
    # link rate so throughput numbers can be normalized.
    import jax.numpy as jnp

    probe = jax.jit(lambda x, s: (x + s).astype(jnp.int16))(
        jnp.zeros((4 << 20,), jnp.int16), 1
    )
    probe.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(probe)
    link_mbps = 8.0 / (time.perf_counter() - t0)

    n_chips = max(jax.device_count(), 1)
    value = audio_seconds / infer_sec / n_chips
    result = {
        "metric": "audio-seconds/s/chip",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / 50.0, 3),
    }
    if not args.json_only:
        detail = {
            "quality": args.quality,
            "vocoder": args.vocoder,
            "batch": args.batch,
            "precision": args.precision,
            "wire": args.wire,
            "sample_rate": sr,
            "audio_seconds_per_batch": round(audio_seconds, 2),
            "batch_wall_s_pipelined": round(infer_sec, 4),
            "compile_plus_first_batch_s": round(load_sec, 2),
            "rtf": round(infer_sec / audio_seconds, 6),
            "p50_latency_per_batch_s": round(seq_sec, 4),
            "devices": n_chips,
            "link_MBps": round(link_mbps, 1),
            "sequential_times": [round(t, 4) for t in times],
        }
        print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

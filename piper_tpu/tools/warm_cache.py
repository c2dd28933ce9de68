"""Populate the persistent XLA compilation cache for a voice's
serving ladder, ahead of deployment.

The serving runtime compiles one executable per (bucket-shape); the
first process to hit each shape pays the compile (~20-60 s/shape on a
tunneled chip). This tool runs `TpuVoice.warmup(full=True)` over the
ladder a CLI/server deployment will use and leaves every executable in
the persistent compilation cache (machine-keyed under PIPER_TPU_CACHE,
default ~/.cache/piper_tpu/<host-fp> — runtime/cache.py), so later
processes on the same host cold-start in seconds —
executable *loading*, not compilation, becomes the floor.

Usage:
    piper-tpu-warm -m en_US-lessac-medium.onnx            # default ladder
    piper-tpu-warm --quality medium --batch-sizes 1,8,32  # no voice file
    piper-tpu-warm -m voice.npz --serving-profile bench   # bench.py ladder

Run it once per (voice architecture, bucket ladder, batch-size set,
jax/runtime version) — the cache key covers all of these.
"""

from __future__ import annotations

import argparse
import logging
import time

_LOGGER = logging.getLogger(__name__)

# bench.py / throughput-serving ladder: one phoneme bucket, fine frame
# buckets (see bench.py for the rationale on link-bound hosts).
BENCH_PHONEME_BUCKETS = [512]
BENCH_FRAME_BUCKETS = [256, 384, 512, 640, 768, 896, 1024, 1536, 2048, 4096]


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Pre-compile a voice's serving shapes into the "
        "persistent compilation cache"
    )
    ap.add_argument("-m", "--model",
                    help="Voice file (.npz/.onnx/.ckpt); omit to warm a "
                         "random-weight voice of --quality (same graph, "
                         "same compiled shapes as any trained voice of "
                         "that architecture)")
    ap.add_argument("--config", help="Voice config JSON (default: <model>.json)")
    ap.add_argument("--quality", default="medium",
                    choices=("x-low", "low", "medium", "high"))
    ap.add_argument("--batch-sizes", default="1,8,32",
                    help="Comma-separated batch sizes to warm")
    ap.add_argument("--serving-profile", choices=("default", "bench"),
                    default="default",
                    help="default = the CLI/server bucket ladders; "
                         "bench = bench.py's ladder "
                         "(uniform decode grouping, fine frame buckets)")
    ap.add_argument("--precision", choices=("fast", "parity"), default="fast")
    ap.add_argument("--max-phoneme-bucket", type=int,
                    help="Skip phoneme buckets above this (partial warm)")
    ap.add_argument("--max-frame-bucket", type=int,
                    help="Skip frame buckets above this (partial warm)")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        format="%(levelname)s:%(name)s:%(message)s",
    )

    from ..runtime.voice import TpuVoice

    kw = {}
    if args.serving_profile == "bench":
        kw = dict(
            phoneme_buckets=BENCH_PHONEME_BUCKETS,
            frame_buckets=BENCH_FRAME_BUCKETS,
            decode_grouping="uniform",
        )
    t0 = time.perf_counter()
    if args.model:
        voice = TpuVoice.load(
            args.model, args.config, precision=args.precision,
            estimator_cache=True, **kw
        )
    else:
        voice = TpuVoice.random(
            args.quality, num_symbols=256, seed=0,
            precision=args.precision, **kw
        )
    sizes = tuple(int(s) for s in args.batch_sizes.split(",") if s)
    _LOGGER.info(
        "warming %s ladder: phoneme buckets %s, frame buckets %s, "
        "batch sizes %s",
        args.serving_profile, voice.phoneme_buckets, voice.frame_buckets,
        sizes,
    )
    voice.warmup(
        sizes, full=True, threads=args.threads,
        max_phoneme_bucket=args.max_phoneme_bucket,
        max_frame_bucket=args.max_frame_bucket,
    )
    import jax

    _LOGGER.info(
        "warm in %.1fs; persistent cache: %s",
        time.perf_counter() - t0, jax.config.jax_compilation_cache_dir,
    )


if __name__ == "__main__":
    main()

"""Batch inference harness: stdin JSONL of utterances -> WAV files.

Parity: src/python/piper_train/infer.py — reads {"phoneme_ids": [...],
optional "text", "speaker_id"} JSONL from stdin, writes numbered WAVs
to --output-dir, and logs per-utterance + overall RTF.

Usage:
  python -m piper_tpu.infer -m voice.npz -o wavs/ < test_en-us.jsonl
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

from .config import SynthesisConfig
from .runtime.voice import TpuVoice
from .runtime.wav import audio_float_to_int16, write_wav

_LOGGER = logging.getLogger("piper_tpu.infer")


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-c", "--config")
    p.add_argument("-o", "--output-dir", required=True)
    p.add_argument("--precision", choices=("fast", "parity"), default="fast")
    p.add_argument("--seed", type=int)
    p.add_argument("--batch", action="store_true",
                   help="Synthesize all utterances as one bucketed batch")
    p.add_argument("--noise-scale", type=float)
    p.add_argument("--length-scale", type=float)
    p.add_argument("--noise-w", type=float)
    p.add_argument("--denoiser-strength", type=float, default=0.0,
                   help="Spectral bias-subtraction strength "
                        "(runtime/denoise.py; 0 = off)")
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    voice = TpuVoice.load(args.model, args.config, precision=args.precision,
                          estimator_cache=True)
    sr = voice.config.sample_rate
    syn = SynthesisConfig(
        seed=args.seed, noise_scale=args.noise_scale,
        length_scale=args.length_scale, noise_w=args.noise_w,
    )

    records = []
    for line in sys.stdin:
        line = line.strip()
        if line:
            records.append(json.loads(line))

    start = time.perf_counter()
    if args.batch:
        audios = voice.synthesize_ids_batch(
            [r["phoneme_ids"] for r in records], syn=syn
        )
    else:
        audios = [
            voice.synthesize_ids_batch([r["phoneme_ids"]], syn=syn)[0]
            for r in records
        ]
    infer_sec = time.perf_counter() - start

    from .runtime.denoise import maybe_denoiser

    denoiser = maybe_denoiser(voice, args.denoiser_strength)

    total_audio = 0.0
    for i, (rec, audio) in enumerate(zip(records, audios)):
        if denoiser is not None:
            audio = denoiser(audio, args.denoiser_strength)
        total_audio += len(audio) / sr
        write_wav(output_dir / f"{i}.wav", audio_float_to_int16(audio), sr)

    _LOGGER.info(
        "Wrote %s wav(s) | audio %.2fs | infer %.2fs | RTF %.5f",
        len(records), total_audio, infer_sec,
        infer_sec / total_audio if total_audio else 0.0,
    )


if __name__ == "__main__":
    main()

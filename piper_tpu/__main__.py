"""piper_tpu CLI.

Flag-compatible with the reference CLIs (python -m piper,
src/python_run/piper/__main__.py:17-159, and the C++ main.cpp:404-447):
stdin lines -> WAV file / directory / stdout / raw stream, plus the
C++ --json-input protocol ({"text", "speaker_id", "output_file"} per
line, main.cpp:77-84).

Extras over the reference: --precision fast|parity, --seed for
deterministic synthesis, --batch to synthesize stdin lines as one
bucketed device batch.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
import wave
from pathlib import Path
from typing import Any, Dict

from .config import SynthesisConfig
from .runtime.voice import SynthesisStats, TpuVoice

_LOGGER = logging.getLogger("piper_tpu")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="piper_tpu")
    parser.add_argument("-m", "--model", required=True,
                        help="Path to voice model (.npz, .ckpt, .onnx) or voice name to download")
    parser.add_argument("-c", "--config", help="Path to voice JSON config")
    parser.add_argument("-f", "--output-file", "--output_file",
                        help="Output WAV file (default: stdout)")
    parser.add_argument("-d", "--output-dir", "--output_dir",
                        help="Output directory for per-line WAVs")
    parser.add_argument("--output-raw", "--output_raw", action="store_true",
                        help="Stream raw audio to stdout")
    parser.add_argument("--raw-format", "--raw_format",
                        choices=["s16le", "mulaw"], default="s16le",
                        help="Raw stream wire format: s16le int16 PCM "
                             "(default, the reference's format) or G.711 "
                             "mu-law (8 bits/sample, half the bytes)")
    parser.add_argument("--json-input", action="store_true",
                        help="stdin lines are JSON objects (C++ CLI protocol)")
    parser.add_argument("-s", "--speaker", type=int, help="Speaker id")
    parser.add_argument("--length-scale", "--length_scale", type=float)
    parser.add_argument("--noise-scale", "--noise_scale", type=float)
    parser.add_argument("--noise-w", "--noise_w", type=float)
    parser.add_argument("--sentence-silence", "--sentence_silence",
                        type=float, default=0.0)
    parser.add_argument("--data-dir", "--data_dir", action="append",
                        default=[str(Path.cwd())])
    parser.add_argument("--download-dir", "--download_dir")
    parser.add_argument("--update-voices", action="store_true")
    parser.add_argument("--precision", choices=["parity", "fast"], default="fast")
    parser.add_argument(
        "--pack-total", "--pack_total", choices=["quantum", "pow2"],
        default=None,
        help="packed-transfer sizing: 'quantum' (minimal padding; "
        "default for the CLI's recurring batch shapes) or 'pow2' "
        "(shape-stable pack executables; default for the HTTP server, "
        "whose coalesced batches vary every window)",
    )
    parser.add_argument(
        "--decode-grouping", "--decode_grouping",
        choices=["bucketed", "uniform", "packed"], default=None,
        help="decode planner (default: bucketed for the CLI, uniform "
        "for the HTTP server)",
    )
    parser.add_argument("--wire-format", "--wire_format",
                        choices=["int16", "mulaw"], default="int16",
                        help="Packed device->host transfer format: int16 "
                             "PCM (default, lossless) or G.711 mu-law "
                             "encoded ON DEVICE (1 byte/sample — halves "
                             "link bytes/audio-second on bandwidth-bound "
                             "hosts; lossy; needs --precision fast)")
    parser.add_argument("--seed", type=int, help="Deterministic synthesis seed")
    parser.add_argument("--batch", action="store_true",
                        help="Synthesize all stdin lines as one bucketed batch")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("-q", "--quiet", action="store_true")
    return parser


def load_voice(args) -> TpuVoice:
    model_path = Path(args.model)
    if not model_path.exists():
        from urllib.error import URLError

        from .runtime.download import (
            VoiceNotFoundError,
            ensure_voice_exists,
            find_voice,
            get_voices,
        )

        download_dir = args.download_dir or args.data_dir[0]
        try:
            voices_info = get_voices(
                download_dir, update_voices=args.update_voices
            )
            aliases: Dict[str, Any] = {}
            for vi in voices_info.values():
                for alias in vi.get("aliases", []):
                    aliases[alias] = {"_is_alias": True, **vi}
            voices_info.update(aliases)
            ensure_voice_exists(
                args.model, args.data_dir, download_dir, voices_info
            )
            args.model, args.config = find_voice(args.model, args.data_dir)
        except VoiceNotFoundError:
            raise SystemExit(
                f"Voice '{args.model}' is not a local file and is not in "
                "the voices.json registry. Check the name or pass a path "
                "to a .npz/.ckpt/.onnx voice."
            )
        except (URLError, OSError) as e:
            raise SystemExit(
                f"Voice '{args.model}' is not a local file and the voice "
                f"registry could not be reached ({e}). Pass a path to a "
                "local voice, or place voices.json in the download dir."
            )
    return TpuVoice.load(
        args.model, args.config, precision=args.precision,
        wire_format=getattr(args, "wire_format", "int16"),
        estimator_cache=True,
        pack_total=getattr(args, "pack_total", None) or "quantum",
        decode_grouping=getattr(args, "decode_grouping", None) or "bucketed",
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    level = (
        logging.DEBUG if args.debug else
        logging.WARNING if args.quiet else logging.INFO
    )
    logging.basicConfig(level=level)

    voice = load_voice(args)
    base_syn = SynthesisConfig(
        speaker_id=args.speaker,
        length_scale=args.length_scale,
        noise_scale=args.noise_scale,
        noise_w=args.noise_w,
        sentence_silence_seconds=args.sentence_silence,
        seed=args.seed,
    )
    stats = SynthesisStats()

    def parse_line(line: str):
        """(text, syn, output_file) from a stdin line."""
        if not args.json_input:
            return line, base_syn, None
        obj = json.loads(line)
        syn = SynthesisConfig(**{**base_syn.__dict__})
        if "speaker_id" in obj:
            syn.speaker_id = int(obj["speaker_id"])
        elif "speaker" in obj and voice.config.speaker_id_map:
            syn.speaker_id = voice.config.speaker_id_map.get(str(obj["speaker"]))
        return obj["text"], syn, obj.get("output_file")

    if args.output_raw:
        transcode = None
        if args.raw_format == "mulaw":
            import numpy as np

            from .runtime.codec import mulaw_encode

            def transcode(pcm_bytes: bytes) -> bytes:
                return mulaw_encode(
                    np.frombuffer(pcm_bytes, "<i2")
                ).tobytes()

        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            text, syn, _ = parse_line(line)
            for chunk in voice.synthesize_stream_raw(text, syn=syn, stats=stats):
                sys.stdout.buffer.write(transcode(chunk) if transcode else chunk)
                sys.stdout.buffer.flush()
    elif args.output_dir:
        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        lines = [l.strip() for l in sys.stdin if l.strip()]
        for line in lines:
            text, syn, out_file = parse_line(line)
            wav_path = (
                Path(out_file) if out_file else out_dir / f"{time.monotonic_ns()}.wav"
            )
            with wave.open(str(wav_path), "wb") as wav_file:
                voice.synthesize_wav(text, wav_file, syn=syn, stats=stats)
            _LOGGER.info("Wrote %s", wav_path)
    else:
        text = sys.stdin.read()
        target = (
            sys.stdout.buffer
            if not args.output_file or args.output_file == "-"
            else args.output_file
        )
        with wave.open(target, "wb") as wav_file:
            voice.synthesize_wav(text, wav_file, syn=base_syn, stats=stats)

    _LOGGER.info(
        "RTF %.4f (infer %.2fs / audio %.2fs; includes one-time "
        "compilation on first use of each shape)",
        stats.real_time_factor, stats.infer_seconds, stats.audio_seconds,
    )


if __name__ == "__main__":
    main()

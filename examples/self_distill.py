#!/usr/bin/env python
"""Self-distillation demo: the full piper_tpu product loop on one chip.

No speech dataset ships in this environment, so the demo makes its own:
a frozen random-weight "teacher" voice synthesizes audio for the
reference's pre-phonemized multilingual fixture sentences
(/root/reference/etc/test_sentences/test_*.jsonl), those WAVs are
cached/spectrogrammed through the training preprocessing path, and a
fresh "student" is GAN-trained from scratch to reproduce the teacher.
This exercises, end to end, on real hardware:

  dataset build -> norm/spec cache -> bucketed loader -> jitted GAN
  step (G + MPD, on-device MAS) -> checkpointing -> validation (mel L1
  + sample WAVs) -> .npz export -> serving the trained voice.

The convergence signal is real even though the teacher is random: the
student's mel/KL/duration losses must fall and the validation mel-L1
against the teacher's held-out audio must beat an untrained student.

Usage:
  python examples/self_distill.py --out /tmp/distill --steps 1000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_dataset(
    out: Path, quality: str, seed: int, max_utterances: int = 0,
    teacher_path: Path = None, teacher_config: Path = None,
    speakers: int = 1,
) -> dict:
    """Teacher-synthesize the fixture sentences into a training dir.

    With --teacher, the teacher is a *trained* voice (chained
    distillation: e.g. the committed 3000-step x-low student becomes
    the teacher of a higher-capacity student); otherwise a frozen
    random-weight voice. With --speakers N, N differently-seeded
    teachers each voice a share of the utterances and the dataset gets
    speaker ids — a multi-speaker student must learn to separate them
    through its speaker embedding (evaluated by the sid-swap control
    in eval_exported_voice)."""
    from piper_tpu.config import AudioConfig, SynthesisConfig
    from piper_tpu.runtime.voice import TpuVoice
    from piper_tpu.runtime.wav import audio_float_to_int16, write_wav
    from piper_tpu.train.norm_audio import cache_norm_audio
    from piper_tpu.train.preprocess import default_espeak_id_map

    if teacher_path is not None:
        teacher = TpuVoice.load(
            teacher_path, teacher_config or Path(str(teacher_path) + ".json")
        )
        id_map = {
            k: list(v) for k, v in teacher.config.phoneme_id_map.items()
        }
        num_symbols = teacher.config.num_symbols
    else:
        id_map = default_espeak_id_map()
        num_symbols = max(i[0] for i in id_map.values()) + 1

    utts = []
    for p in sorted(Path("/root/reference/etc/test_sentences").glob("test_*.jsonl")):
        for line in p.read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            ids = rec["phoneme_ids"]
            if max(ids) < num_symbols and 8 <= len(ids) <= 256:
                utts.append({"text": rec.get("text", ""), "phoneme_ids": ids})
    if max_utterances:
        utts = utts[:max_utterances]
    print(f"fixture utterances: {len(utts)} (num_symbols {num_symbols})")

    if teacher_path is None:
        teachers = [
            TpuVoice.random(quality, num_symbols=num_symbols, seed=seed + k)
            for k in range(speakers)
        ]
    else:
        assert speakers == 1, "--teacher with --speakers>1 not supported"
        teachers = [teacher]
    sr = teachers[0].config.sample_rate
    wav_dir = out / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    # utterance i -> speaker i % N; synthesize per-teacher batches
    audios = [None] * len(utts)
    for k, tk in enumerate(teachers):
        rows = [i for i in range(len(utts)) if i % speakers == k]
        outs = tk.synthesize_ids_batch(
            [utts[i]["phoneme_ids"] for i in rows],
            syn=SynthesisConfig(seed=seed),
        )
        for i, a in zip(rows, outs):
            audios[i] = a
    print(f"teacher synthesis: {time.perf_counter() - t0:.1f}s "
          f"({sum(len(a) for a in audios) / sr:.0f} audio-s, "
          f"{speakers} speaker(s))")

    audio_cfg = AudioConfig(sample_rate=sr)
    cache_dir = out / "cache" / str(sr)
    # Cap utterance audio so the single-bucket train shape stays small.
    max_samples = 896 * audio_cfg.hop_length
    with open(out / "dataset.jsonl", "w", encoding="utf-8") as ds:
        for i, (u, audio) in enumerate(zip(utts, audios)):
            wav_path = wav_dir / f"utt_{i:04d}.wav"
            write_wav(wav_path, audio_float_to_int16(audio[:max_samples]), sr)
            # teacher output has no leading/trailing silence to trim
            norm_path, spec_path = cache_norm_audio(
                wav_path, cache_dir, audio_cfg, do_trim=False
            )
            rec = {
                "text": u["text"],
                "phoneme_ids": u["phoneme_ids"],
                "audio_norm_path": str(norm_path),
                "audio_spec_path": str(spec_path),
            }
            if speakers > 1:
                rec["speaker_id"] = i % speakers
            ds.write(json.dumps(rec) + "\n")

    config = {
        "dataset": "self_distill",
        "audio": {"sample_rate": sr},
        "espeak": {"voice": "en-us"},
        "language": {"code": "en-us"},
        "inference": {"noise_scale": 0.667, "length_scale": 1, "noise_w": 0.8},
        "phoneme_type": "espeak",
        "phoneme_map": {},
        "phoneme_id_map": id_map,
        "num_symbols": num_symbols,
        "num_speakers": speakers,
        "speaker_id_map": {
            f"spk{k}": k for k in range(speakers)
        } if speakers > 1 else {},
        "piper_version": "piper_tpu 0.1.0",
    }
    (out / "config.json").write_text(
        json.dumps(config, ensure_ascii=False, indent=2), encoding="utf-8"
    )
    return {"utterances": len(utts), "sample_rate": sr}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/self_distill"))
    ap.add_argument("--quality", default="x-low")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--skip-build", action="store_true",
                    help="Reuse an existing dataset in --out")
    ap.add_argument("--max-utterances", type=int, default=0,
                    help="Cap the teacher dataset size (0 = all fixtures)")
    ap.add_argument("--teacher", type=Path,
                    help=".npz voice to distill from (chained "
                         "distillation); default: random-weight teacher")
    ap.add_argument("--teacher-config", type=Path,
                    help="Voice config sidecar for --teacher "
                         "(default: <teacher>.json)")
    ap.add_argument("--variant", default="vits", choices=["vits", "vits2"])
    ap.add_argument("--vocoder", default="hifigan",
                    choices=["hifigan", "mb_istft"])
    ap.add_argument("--ckpt-name", default="ckpt",
                    help="Checkpoint subdir under --out (lets several "
                         "family runs share one dataset)")
    ap.add_argument("--speakers", type=int, default=1,
                    help="N differently-seeded teachers -> multi-speaker "
                         "dataset; the student trains with speaker "
                         "embeddings and is evaluated with a sid-swap "
                         "control")
    ap.add_argument("--validate-steps", type=int, default=0,
                    help="Validation cadence (0 = twice per run)")
    args = ap.parse_args(argv)

    import os

    import jax

    from piper_tpu.runtime.cache import cache_dir

    base = os.environ.get("PIPER_TPU_CACHE") or str(
        Path(__file__).resolve().parent.parent / ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir(base))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if not args.skip_build:
        build_dataset(args.out, args.quality, args.seed,
                      max_utterances=args.max_utterances,
                      teacher_path=args.teacher,
                      teacher_config=args.teacher_config,
                      speakers=args.speakers)

    from piper_tpu.train.__main__ import main as train_main

    ckpt = args.out / args.ckpt_name
    validate_steps = args.validate_steps or max(args.steps // 2, 1)
    t0 = time.perf_counter()
    train_main([
        "--dataset-dir", str(args.out),
        "--checkpoint-dir", str(ckpt),
        "--quality", args.quality,
        "--variant", args.variant,
        "--vocoder", args.vocoder,
        "--batch-size", str(args.batch_size),
        "--max-steps", str(args.steps),
        "--checkpoint-steps", str(max(args.steps // 2, 1)),
        "--validate-steps", str(validate_steps),
        "--log-steps", str(min(25, max(args.steps // 4, 1))),
        "--single-bucket",  # exactly one train-step compilation
        "--seed", str(args.seed + 1),  # student != teacher init
    ])
    train_s = time.perf_counter() - t0

    # Summarize the loss trajectory for the docs.
    metrics = [
        json.loads(l)
        for l in (ckpt / "metrics.jsonl").read_text().splitlines()
    ]
    steps = [m for m in metrics if "loss_mel" in m]
    vals = [m for m in metrics if "val_mel_l1" in m]
    first, last = steps[0], steps[-1]
    summary = {
        "train_wall_s": round(train_s, 1),
        "steps": last["step"],
        "loss_mel_first": first["loss_mel"],
        "loss_mel_last": last["loss_mel"],
        "loss_gen_first": first["loss_gen_all"],
        "loss_gen_last": last["loss_gen_all"],
        "val_mel_l1": [
            {"step": v["step"], "val_mel_l1": v["val_mel_l1"],
             **({"val_dur_ratio": v["val_dur_ratio"]}
                if "val_dur_ratio" in v else {})}
            for v in vals
        ],
    }
    summary.update(eval_exported_voice(
        args.out, args.quality, args.seed, ckpt_name=args.ckpt_name,
        variant=args.variant, vocoder=args.vocoder,
    ))
    print(json.dumps(summary, indent=2))


def eval_exported_voice(
    out: Path, quality: str, seed: int, ckpt_name: str = "ckpt",
    variant: str = "vits", vocoder: str = "hifigan",
) -> dict:
    """Serve the trained exported .npz through TpuVoice and score mel
    L1 against the teacher's audio — end to end through the runtime,
    with an untrained student as the control (the convergence signal
    the round-1 review asked to demonstrate)."""
    import numpy as np

    from piper_tpu.config import SynthesisConfig
    from piper_tpu.runtime.voice import TpuVoice
    from piper_tpu.ops.stft import mel_spectrogram

    ckpt = out / ckpt_name
    exports = sorted(
        ckpt.glob("voice_*.npz"),
        key=lambda p: int(p.stem.split("_")[1]),
    )
    if not exports:
        return {}
    voice_path = exports[-1]
    # config sidecar: the dataset's config.json is the voice config
    records = [
        json.loads(l)
        for l in (out / "dataset.jsonl").read_text().splitlines()
    ][:16]

    def make_mel(a):
        def mel(x):
            return np.asarray(mel_spectrogram(
                x[None, :], sample_rate=a.sample_rate,
                n_fft=a.filter_length, hop_length=a.hop_length,
                win_length=a.win_length, n_mels=a.mel_channels,
                fmin=a.mel_fmin, fmax=a.mel_fmax,
            ))[0]

        return mel

    def score(voice, recs, sid=None) -> float:
        syn = SynthesisConfig(seed=seed, speaker_id=sid)
        audios = voice.synthesize_ids_batch(
            [r["phoneme_ids"] for r in recs], syn=syn
        )
        a = voice.model_cfg.audio
        mel = make_mel(a)
        tot, n = 0.0, 0
        for r, audio in zip(recs, audios):
            teacher = np.load(r["audio_norm_path"])
            m = min(len(audio), len(teacher))
            if m < a.filter_length:
                continue
            mel_s = mel(audio[:m].astype(np.float32))
            mel_t = mel(teacher[:m].astype(np.float32))
            tot += float(np.mean(np.abs(mel_s - mel_t)))
            n += 1
        return tot / max(n, 1)

    def mel_l1(voice) -> float:
        ns = voice.config.num_speakers
        if ns <= 1:
            return score(voice, records)
        # multi-speaker: score each speaker's utterances at its own sid
        per = [
            score(voice, [r for r in records
                          if r.get("speaker_id", 0) == s], sid=s)
            for s in range(ns)
        ]
        return float(np.mean(per))

    trained = TpuVoice.load(voice_path, out / "config.json")
    vcfg = trained.config
    untrained = TpuVoice.random(
        quality, num_symbols=vcfg.num_symbols,
        num_speakers=vcfg.num_speakers, seed=seed + 99,
        variant=variant, vocoder=vocoder,
    )
    untrained.config = vcfg
    l1_trained = mel_l1(trained)
    l1_untrained = mel_l1(untrained)
    result = {
        "exported_voice": str(voice_path),
        "serve_mel_l1_trained": round(l1_trained, 4),
        "serve_mel_l1_untrained_control": round(l1_untrained, 4),
        "improvement": round(l1_untrained / max(l1_trained, 1e-9), 2),
    }
    if vcfg.num_speakers > 1:
        # Speaker-conditioning evidence: score each speaker's
        # utterances with the CORRECT sid vs a SWAPPED sid. A student
        # whose speaker embedding actually routes conditioning
        # reproduces its own teacher far better than the other
        # teacher's (correct << swapped).
        sep = {}
        for s in range(vcfg.num_speakers):
            recs = [r for r in records if r.get("speaker_id", 0) == s]
            if not recs:
                continue
            correct = round(score(trained, recs, sid=s), 4)
            swapped = round(
                score(trained, recs, sid=(s + 1) % vcfg.num_speakers), 4
            )
            sep[f"speaker_{s}"] = {
                "correct": correct, "swapped": swapped,
                "separation": round(swapped / max(correct, 1e-9), 2),
            }
        result["speaker_separation"] = sep
    return result


if __name__ == "__main__":
    main()

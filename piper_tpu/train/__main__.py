"""Training CLI.

Counterpart of `python -m piper_train` (reference
src/python/piper_train/__main__.py:15-147): reads a preprocessed
directory (config.json + dataset.jsonl), builds the model per quality
preset, and runs the GAN training loop — here as a jit/pjit-compiled
JAX step over a ('data','model') device mesh with orbax checkpointing.

Also implements the single->multi-speaker checkpoint surgery
(reference __main__.py:92-140): speaker-conditioning parameters that
don't exist in the source checkpoint keep their fresh initialization.

Usage:
  python -m piper_tpu.train --dataset-dir out --quality medium \
      --batch-size 32 --max-steps 100000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, VoiceConfig
from ..parallel.mesh import make_mesh
from ..parallel.sharding import make_sharded_train_step, shard_batch
from .dataset import BucketedLoader, load_dataset
from .step import init_train_state, make_optimizer

_LOGGER = logging.getLogger(__name__)


def merge_params(dst: Any, src: Any) -> Any:
    """Copy matching leaves of src into dst (same path + shape); keep
    dst's fresh init elsewhere — the multi-speaker surgery."""
    if isinstance(dst, dict) and isinstance(src, dict):
        return {
            k: merge_params(dst[k], src[k]) if k in src else dst[k] for k in dst
        }
    if isinstance(dst, list) and isinstance(src, list):
        return [
            merge_params(d, s) for d, s in zip(dst, src)
        ] + list(dst[len(src):])
    if hasattr(dst, "shape") and hasattr(src, "shape") and dst.shape == src.shape:
        return src
    return dst


def save_checkpoint(ckpt_dir: Path, state, step: int) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = ckpt_dir.absolute()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state._asdict()))


def restore_checkpoint(ckpt_dir: Path, state):
    import orbax.checkpoint as ocp

    from .step import TrainState

    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step()
        if step is None:
            return state, 0
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(state._asdict())
        )
        return TrainState(**restored), step


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-dir", required=True,
                   help="Directory with config.json and dataset.jsonl")
    p.add_argument("--checkpoint-dir",
                   help="Checkpoint directory (default: dataset-dir/ckpt)")
    p.add_argument("--quality", default="medium",
                   choices=("x-low", "low", "medium", "high"))
    p.add_argument("--variant", default="vits", choices=("vits", "vits2"),
                   help="vits = reference architecture; vits2 adds the "
                        "2307.16430 upgrades (transformer flow, "
                        "adversarial durations, noised MAS)")
    p.add_argument("--vocoder", default="hifigan",
                   choices=("hifigan", "mb_istft"),
                   help="hifigan = reference vocoder; mb_istft = "
                        "multi-band iSTFT head (~7x less vocoder "
                        "compute, native-format voices only)")
    p.add_argument("--config-overrides",
                   help="JSON dict of ModelConfig field overrides "
                        '(e.g. \'{"hidden_channels": 64}\'); "audio" '
                        "sub-dict overrides AudioConfig fields")
    p.add_argument("--batch-size", type=int, required=True)
    p.add_argument("--max-steps", type=int, default=2_000_000)
    p.add_argument("--max-epochs", type=int, default=10_000)
    p.add_argument("--checkpoint-steps", type=int, default=2000)
    p.add_argument("--log-steps", type=int, default=50)
    p.add_argument("--max-phoneme-ids", type=int)
    p.add_argument("--max-spec-frames", type=int, default=2048,
                   help="Skip utterances longer than this many spectrogram "
                        "frames")
    p.add_argument("--single-bucket", action="store_true",
                   help="Pad every batch to one (phoneme, frame) shape: "
                        "one train-step compilation instead of one per "
                        "bucket pair (use on cold caches / slow compiles)")
    p.add_argument("--learning-rate", type=float, default=2e-4)
    p.add_argument("--grad-clip", type=float)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--num-test-examples", type=int, default=5)
    p.add_argument("--validation-split", type=float, default=0.1)
    p.add_argument("--resume", action="store_true",
                   help="Resume from latest checkpoint in checkpoint-dir")
    p.add_argument("--resume-from-single-speaker-checkpoint",
                   help="Native .npz voice to initialize a multi-speaker run from")
    p.add_argument("--data-parallel", type=int,
                   help="Devices on the data axis (default: all)")
    p.add_argument("--precision", choices=("fast", "parity"), default="fast")
    p.add_argument(
        "--scan-steps", type=int, default=1,
        help="Run K train steps per device dispatch (lax.scan over K "
        "stacked same-bucket batches). The GAN step's device time is "
        "~1.5 ms, so per-step dispatch round trips dominate on remote "
        "or tunneled hosts — K=8 measured ~10x utterance throughput "
        "(docs/BENCH_NOTES.md). Math is identical to K sequential "
        "steps; logging/checkpoint cadences fire on counter crossings.",
    )
    p.add_argument("--export-every", type=int, default=0,
                   help="Export a .npz voice every N steps (0 = only at end)")
    p.add_argument("--validate-steps", type=int, default=2000,
                   help="Validation cadence (0 disables)")
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    # The GAN train step is a minutes-long, ~100 MB compile; persist it
    # (same cache the serving runtime uses) so resume/restart is cheap.
    from ..runtime.voice import _enable_compilation_cache

    _enable_compilation_cache()

    dataset_dir = Path(args.dataset_dir)
    ckpt_dir = Path(args.checkpoint_dir or dataset_dir / "ckpt")
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    vcfg = VoiceConfig.from_file(dataset_dir / "config.json")
    if args.vocoder == "mb_istft":
        if args.variant == "vits2":
            p.error("--vocoder mb_istft with --variant vits2 is not a "
                    "supported combination yet")
        make_cfg = ModelConfig.mb_istft
    elif args.variant == "vits2":
        make_cfg = ModelConfig.vits2
    else:
        make_cfg = ModelConfig.for_quality
    cfg = make_cfg(
        args.quality,
        num_symbols=vcfg.num_symbols,
        num_speakers=vcfg.num_speakers,
    )
    cfg = dataclasses.replace(
        cfg,
        audio=dataclasses.replace(cfg.audio, sample_rate=vcfg.sample_rate),
    )
    if args.config_overrides:
        overrides = json.loads(args.config_overrides)
        audio_over = overrides.pop("audio", None)
        for k in ("resblock_kernel_sizes", "upsample_rates",
                  "upsample_kernel_sizes"):
            if k in overrides:
                overrides[k] = tuple(overrides[k])
        if "resblock_dilation_sizes" in overrides:
            overrides["resblock_dilation_sizes"] = tuple(
                tuple(d) for d in overrides["resblock_dilation_sizes"]
            )
        cfg = dataclasses.replace(cfg, **overrides)
        if audio_over:
            cfg = dataclasses.replace(
                cfg, audio=dataclasses.replace(cfg.audio, **audio_over)
            )
    _LOGGER.info("Model: %s", cfg)

    utterances = load_dataset(
        [dataset_dir / "dataset.jsonl"], max_phoneme_ids=args.max_phoneme_ids
    )
    n_val = int(len(utterances) * args.validation_split)
    rng_py = np.random.default_rng(args.seed)
    order = rng_py.permutation(len(utterances))
    val_utts = [utterances[i] for i in order[:n_val]]
    train_utts = [utterances[i] for i in order[n_val:]]
    _LOGGER.info("Train %s / val %s utterances", len(train_utts), len(val_utts))

    loader = BucketedLoader(
        train_utts,
        batch_size=args.batch_size,
        hop_length=cfg.audio.hop_length,
        segment_size=cfg.segment_size,
        multispeaker=cfg.num_speakers > 1,
        seed=args.seed,
        max_spec_frames=args.max_spec_frames,
        single_shape=args.single_bucket,
    )

    steps_per_epoch = max(len(train_utts) // args.batch_size, 1)
    tx = make_optimizer(
        learning_rate=args.learning_rate,
        steps_per_epoch=steps_per_epoch,
        grad_clip=args.grad_clip,
    )
    state, _ = init_train_state(
        jax.random.PRNGKey(args.seed), cfg, optimizer=tx,
        steps_per_epoch=steps_per_epoch,
    )
    start_step = 0
    if args.resume:
        state, start_step = restore_checkpoint(ckpt_dir, state)
        _LOGGER.info("Resumed from step %s", start_step)
    elif args.resume_from_single_speaker_checkpoint:
        from ..weights.native import load_native

        src_params, _src_cfg = load_native(
            args.resume_from_single_speaker_checkpoint
        )
        state = state._replace(
            params_g=merge_params(state.params_g, src_params)
        )
        _LOGGER.info("Initialized generator from single-speaker checkpoint")

    data_parallel = args.data_parallel
    if data_parallel is None:
        # largest data-axis size that divides the batch
        import math

        data_parallel = math.gcd(args.batch_size, jax.device_count()) or 1
    mesh = make_mesh(
        data=data_parallel,
        model=1,
        devices=jax.devices()[:data_parallel],
    )
    step_dtype = jnp.bfloat16 if args.precision == "fast" else jnp.float32
    step_fn = make_sharded_train_step(cfg, tx, mesh, dtype=step_dtype)
    scan_k = max(1, args.scan_steps)
    scan_fn = None
    if scan_k > 1:
        from ..parallel.sharding import make_sharded_scan_step, stack_batches

        scan_fn = make_sharded_scan_step(
            cfg, tx, mesh, scan_k, dtype=step_dtype
        )

    metrics_path = ckpt_dir / "metrics.jsonl"
    key = jax.random.PRNGKey(args.seed + 1)
    step = start_step
    t_start = time.perf_counter()
    # Carry the epoch count through --resume so the metrics stream's
    # epoch column is consistent with the step counter across restarts.
    start_epoch = start_step // steps_per_epoch
    # --scan-steps>1: buffer same-shape batches until K are available,
    # then run all K inside one scanned executable. Buckets keyed by
    # the batch's array shapes (the collator pads per bucket, so the
    # key space is the bucket ladder).
    pending: dict = {}
    with mesh, open(metrics_path, "a", encoding="utf-8") as metrics_file:
        for epoch in range(start_epoch, args.max_epochs):
            for batch in loader:
                if batch["ids"].shape[0] % mesh.devices.size != 0:
                    continue  # partial batch not divisible over mesh
                prev_step = step
                if scan_fn is not None:
                    shape_key = tuple(
                        (k, tuple(v.shape)) for k, v in sorted(batch.items())
                    )
                    buf = pending.setdefault(shape_key, [])
                    buf.append(batch)
                    if len(buf) < scan_k:
                        continue
                    pending[shape_key] = []
                    key, sub = jax.random.split(key)
                    state, m_stack = scan_fn(
                        state, stack_batches(buf, mesh),
                        jax.random.split(sub, scan_k),
                    )
                    metrics = {k: v[-1] for k, v in m_stack.items()}
                    step += scan_k
                else:
                    key, sub = jax.random.split(key)
                    batch = shard_batch(
                        {k: jnp.asarray(v) for k, v in batch.items()}, mesh
                    )
                    state, metrics = step_fn(state, batch, sub)
                    step += 1

                def crossed(n):
                    # cadence fired between prev_step and step (equals
                    # `step % n == 0` when stepping by 1)
                    return n and step // n != prev_step // n

                if crossed(args.log_steps):
                    vals = {
                        k: round(float(v), 5) for k, v in metrics.items()
                    }
                    vals.update(
                        step=step, epoch=epoch,
                        wall_s=round(time.perf_counter() - t_start, 1),
                    )
                    metrics_file.write(json.dumps(vals) + "\n")
                    metrics_file.flush()
                    _LOGGER.info(
                        "step %s gen %.3f disc %.3f mel %.3f",
                        step, vals["loss_gen_all"], vals["loss_disc_all"],
                        vals["loss_mel"],
                    )
                if crossed(args.checkpoint_steps):
                    save_checkpoint(ckpt_dir, jax.device_get(state), step)
                if args.export_every and crossed(args.export_every):
                    _export(ckpt_dir, state, cfg, step)
                if args.validate_steps and crossed(args.validate_steps):
                    _validate(
                        ckpt_dir, state, cfg, step, val_utts, metrics_file
                    )
                if step >= args.max_steps:
                    break
            if step >= args.max_steps:
                break

    save_checkpoint(ckpt_dir, jax.device_get(state), step)
    _export(ckpt_dir, state, cfg, step)
    _LOGGER.info("Done at step %s", step)


def _export(ckpt_dir: Path, state, cfg: ModelConfig, step: int) -> None:
    from ..weights.native import save_native

    path = ckpt_dir / f"voice_{step}.npz"
    save_native(str(path), jax.device_get(state.params_g), cfg)
    _LOGGER.info("Exported %s", path)


def _validate(
    ckpt_dir: Path, state, cfg: ModelConfig, step: int, val_utts,
    metrics_file,
) -> None:
    """Validation: mel L1 on held-out utterances + test audio WAVs
    (counterpart of reference lightning.py:282-306, which logs
    val_loss and TensorBoard audio samples)."""
    import jax.numpy as jnp

    from ..models.vits.model import infer
    from ..ops.stft import mel_spectrogram
    from ..runtime.wav import audio_float_to_int16, write_wav

    if not val_utts:
        return
    a = cfg.audio
    sample_dir = ckpt_dir / "samples" / str(step)
    sample_dir.mkdir(parents=True, exist_ok=True)
    mel_l1 = []
    dur_ratio = []
    val_utts = val_utts[:5]
    # One phoneme bucket and one frame budget for the whole val set:
    # exactly one compiled infer shape per validation pass, reused for
    # the rest of the run (per-utterance shapes caused a compile per
    # utterance and, through a tunneled device, minute-scale stalls).
    t_pad = max(-(-len(u.phoneme_ids) // 64) * 64 for u in val_utts)
    refs = [np.load(u.audio_norm_path).astype(np.float32) for u in val_utts]
    # 2x headroom over the longest reference: early-training duration
    # predictions routinely overshoot, and a tight budget would clamp
    # y_lengths and silently score truncated audio.
    want = max(max(len(r) // a.hop_length for r in refs) * 2, 128)
    max_frames = -(-want // 512) * 512
    for i, (utt, ref_audio) in enumerate(zip(val_utts, refs)):
        n_ids = len(utt.phoneme_ids)
        ids_np = np.zeros((1, t_pad), np.int32)
        ids_np[0, :n_ids] = utt.phoneme_ids
        ids = jnp.asarray(ids_np)
        lengths = jnp.asarray([n_ids], jnp.int32)
        sid = (
            jnp.asarray([utt.speaker_id], jnp.int32)
            if utt.speaker_id is not None and cfg.num_speakers > 1
            else None
        )
        audio, y_lengths = infer(
            state.params_g, ids, lengths, cfg=cfg, max_frames=max_frames,
            noise_scale=jnp.float32(0.667), length_scale=jnp.float32(1.0),
            noise_w_scale=jnp.float32(0.8), sid=sid,
            rng=jax.random.PRNGKey(step + i),
        )
        frames = int(y_lengths[0])
        if frames >= max_frames:
            _LOGGER.warning(
                "validation step %s utt %s: predicted %s frames hit the "
                "max_frames=%s clamp; scoring truncated audio",
                step, i, frames, max_frames,
            )
        n = frames * cfg.upsample_factor
        gen = np.asarray(audio[0, :n], np.float32)
        # Duration accuracy: predicted total frames vs the reference
        # audio's frame count (1.0 = perfect; tracks whether rising
        # late-run duration NLL actually degrades generated durations).
        dur_ratio.append(frames / max(len(ref_audio) // a.hop_length, 1))
        write_wav(
            sample_dir / f"val_{i}.wav", audio_float_to_int16(gen),
            a.sample_rate,
        )
        # mel distance over the shared prefix
        m = min(len(gen), len(ref_audio))
        if m > a.filter_length:
            mel_g = mel_spectrogram(
                jnp.asarray(gen[None, :m]), sample_rate=a.sample_rate,
                n_fft=a.filter_length, hop_length=a.hop_length,
                win_length=a.win_length, n_mels=a.mel_channels,
            )
            mel_r = mel_spectrogram(
                jnp.asarray(ref_audio[None, :m]), sample_rate=a.sample_rate,
                n_fft=a.filter_length, hop_length=a.hop_length,
                win_length=a.win_length, n_mels=a.mel_channels,
            )
            mel_l1.append(float(jnp.mean(jnp.abs(mel_g - mel_r))))
    if mel_l1:
        rec = {
            "step": step,
            "val_mel_l1": round(float(np.mean(mel_l1)), 4),
            "val_dur_ratio": round(float(np.mean(dur_ratio)), 4),
        }
        metrics_file.write(json.dumps(rec) + "\n")
        metrics_file.flush()
        _LOGGER.info(
            "validation step %s mel L1 %.4f dur ratio %.3f",
            step, rec["val_mel_l1"], rec["val_dur_ratio"],
        )


if __name__ == "__main__":
    main()

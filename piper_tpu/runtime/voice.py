"""TpuVoice — the serving API.

Counterpart of the reference PiperVoice
(src/python_run/piper/voice.py:19-185) and the C++ textToAudio
orchestration (src/cpp/piper.cpp:446-616): phonemize -> ids ->
synthesize -> int16, with phrase splitting on configured silence
phonemes and per-sentence silence.

Structural departure from the reference (which is strictly batch=1,
voice.py:158): synthesis here is *batched and bucketed*. Sentences are
grouped into phoneme-length buckets, encoded as one device batch per
bucket, regrouped by predicted frame count, and decoded batched. Each
(bucket) shape compiles once; steady-state serving never recompiles.

Numerics modes:
  precision="parity": float32 compute, highest matmul precision —
      waveform-allclose with the reference (tests).
  precision="fast":   bfloat16 compute for MXU throughput; duration /
      spline math stays f32 (see models/vits/duration.py).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import math
import os
import threading
import time
import zlib
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import InferenceDefaults, ModelConfig, SynthesisConfig, VoiceConfig
from ..models.vits import model as M
from ..text.phonemes import phonemes_to_ids
from ..text.phonemize import phonemize
from . import batching
from .. import native
from .wav import audio_float_to_int16

_LOGGER = logging.getLogger(__name__)


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: bucketed serving compiles a
    fixed set of shapes; caching them makes CLI/server cold starts
    cheap. Machine-keyed (runtime/cache.py) so entries compiled on one
    host are never offered to an incompatible one; respects an explicit
    user setting on jax.config."""
    from .cache import enable_persistent_cache

    enable_persistent_cache()


@dataclasses.dataclass
class SynthesisStats:
    """RTF accounting (reference: piper.cpp:385-408)."""

    infer_seconds: float = 0.0
    audio_seconds: float = 0.0

    @property
    def real_time_factor(self) -> float:
        return self.infer_seconds / self.audio_seconds if self.audio_seconds else 0.0


def _split_phonemes(
    phones: List[str],
    max_ids: int,
    id_cost=None,
) -> List[List[str]]:
    """Split a phoneme list so each chunk's *id* sequence fits in
    max_ids, preferring to break at spaces (word boundaries).

    `id_cost(phoneme) -> int` gives the id count a phoneme contributes
    (phoneme_map expansion and multi-id map entries make this > 2);
    default cost is 2 (id + interspersed PAD). A fixed 3 covers
    BOS/PAD/EOS framing.
    """
    if id_cost is None:
        id_cost = lambda p: 2  # noqa: E731
    budget = max_ids - 3
    costs = [id_cost(p) for p in phones]
    if sum(costs) <= budget:
        return [phones]
    chunks: List[List[str]] = []
    start = 0
    while start < len(phones):
        acc = 0
        end = start
        while end < len(phones) and acc + costs[end] <= budget:
            acc += costs[end]
            end += 1
        end = max(end, start + 1)  # always consume at least one
        if end < len(phones):
            for j in range(end - 1, start, -1):
                if phones[j] == " ":
                    end = j + 1
                    break
        chunks.append(phones[start:end])
        start = end
    return chunks


class TpuVoice:
    # Packed-transfer size granularity (samples): output sizes are
    # rounded up to this so compile count stays bounded while padding
    # waste is <=128 KB per batch.
    _PACK_QUANTUM = 1 << 16

    def __init__(
        self,
        params: Any,
        model_cfg: ModelConfig,
        config: VoiceConfig,
        *,
        precision: str = "parity",
        phoneme_buckets: Optional[Sequence[int]] = None,
        frame_buckets: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        phonemizer: Optional[object] = None,
        mesh=None,
        decode_grouping: str = "bucketed",
        wire_format: str = "int16",
        estimator_cache: bool = False,
        dispatch_fusion: Optional[bool] = None,
        pack_total: str = "quantum",
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis —
        batches are sharded across it (rows padded up to a multiple of
        the axis size), params replicated; multi-chip serving.

        `wire_format`: dtype of the packed device->host transfer.
          "int16" (default): lossless PCM, 2 bytes/sample.
          "mulaw": G.711 mu-law encoded ON DEVICE, 1 byte/sample —
              halves the link bytes per audio-second. For deployments
              where the device->host link (or the network behind it)
              is the throughput floor and the consumer is
              telephony-grade anyway (the CLI/server's raw mu-law
              output modes). Lossy (G.711, ~38 dB SNR); collect()
              still returns float32 (decoded host-side via the LUT).
              Requires precision="fast" (the int16 device path).

        `decode_grouping`:
          "bucketed" (default): split each batch's rows into
              frame-bucket groups — minimal decode FLOPs; best when
              compute is the bottleneck (locally-attached chips).
          "uniform": decode the whole batch at one frame bucket (the
              max). Extra FLOPs on short rows, but the jit shape space
              collapses to one per frame bucket and each batch costs
              ~4 dispatches instead of ~2 per group — best when the
              host link round-trips dominate (tunneled/remote chips)
              and for minimal cold start.
          "packed": DP partition of the (length-sorted) rows into
              power-of-two-row groups, each at its own frame bucket,
              minimizing padded row-frames + a per-group dispatch
              charge (batching.plan_packed_groups). Subsumes both
              modes above (either is a candidate partition): removes
              uniform's short-rows-at-max-bucket waste while pricing
              in bucketed's extra dispatches and row rounding. All
              shapes stay inside the (pow2 rows x ladder) warm set.

        `estimator_cache`: persist the calibrated serving estimators
        (frames-per-id ratio, packed-transfer margin) in the
        compilation-cache directory, keyed by voice weights + serving
        shape knobs. A fresh process then starts at the converged
        values — first batch goes straight down the speculative path
        at pack shapes whose executables the persistent compile cache
        already holds, skipping the exact-path sync and the
        mid-serving margin-snap reshape. Opt-in (the CLI, server,
        bench, and warm tools enable it); mispredictions from a
        changed workload self-correct through the usual hysteresis.

        `dispatch_fusion` (default: on when single-process): collapse
        a steady-state batch's decode-group dispatches + the packed
        transfer into one executable per recurring batch plan,
        compiled in the background (see _fused_get). Pays off in
        proportion to the host's per-dispatch overhead — ~3.3 ms each
        over a tunneled link, ~10x less on a local PCIe host."""
        _enable_compilation_cache()
        self.config = config
        self.model_cfg = model_cfg
        self.precision = precision
        self.dtype = jnp.float32 if precision == "parity" else jnp.bfloat16
        self._matmul_precision = "highest" if precision == "parity" else "default"
        self.params = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(a), params)
        )
        # Time-major Pallas vocoder path: TPU-only (Mosaic kernels),
        # fast precision (parity mode keeps the reference-shaped XLA
        # graph). 2x decode throughput on v5e (see generator.py). Under
        # a mesh the decode wraps it in shard_map (rows are
        # independent; pallas_call is not GSPMD-partitionable).
        try:
            platform = jax.devices()[0].platform.lower()
        except Exception:  # pragma: no cover
            platform = "cpu"
        if (
            precision != "parity"
            and model_cfg.vocoder != "mb_istft"
            and platform in ("tpu", "axon")
        ):
            from ..models.vits import generator as _G

            self.params = dict(self.params)
            self.params["dec_tm"] = jax.device_put(
                _G.prepare_tm(self.params["dec"], model_cfg, self.dtype)
            )
        self.phoneme_buckets = list(
            phoneme_buckets or batching.DEFAULT_PHONEME_BUCKETS
        )
        self.frame_buckets = list(frame_buckets or batching.DEFAULT_FRAME_BUCKETS)
        self._key = jax.random.PRNGKey(
            seed if seed is not None else (time.time_ns() & 0x7FFFFFFF)
        )
        self._key_lock = threading.Lock()
        self.phonemizer = phonemizer
        self._multispeaker = model_cfg.num_speakers > 1
        if decode_grouping not in ("bucketed", "uniform", "packed"):
            raise ValueError(f"decode_grouping: {decode_grouping!r}")
        self.decode_grouping = decode_grouping
        if wire_format not in ("int16", "mulaw"):
            raise ValueError(f"wire_format: {wire_format!r}")
        if wire_format == "mulaw" and precision == "parity":
            raise ValueError(
                "wire_format='mulaw' needs the int16 device path "
                "(precision='fast'); parity mode transfers float32"
            )
        self.wire_format = wire_format
        if pack_total not in ("quantum", "pow2"):
            raise ValueError(f"pack_total: {pack_total!r}")
        # Narrowest host->device wire dtype for phoneme ids (the
        # per-batch id upload is on the serving hot path; see
        # encode_fn). Embedding indices are non-negative, so unsigned
        # at 8 bits is safe; int16 covers every realistic symbol table.
        ns = model_cfg.num_symbols
        self._ids_wire_dtype = (
            np.uint8 if ns <= 256 else np.int16 if ns < 32768 else np.int32
        )
        # Packed-transfer sizing policy. "quantum": round the
        # estimated body to _PACK_QUANTUM — minimal padding bytes, the
        # right mode when one batch shape recurs (throughput serving /
        # bench). "pow2": round to the next power of two — the pack
        # executable's static `total` then takes one of ~log2 values,
        # so CONCURRENT serving (coalescing batcher: every batch is a
        # different composition) stops compiling a new pack for nearly
        # every batch. Costs <=2x padding on the wire of small
        # batches; buys steady-state latency with zero mid-run jits.
        self.pack_total = pack_total

        cfg = model_cfg
        dtype = self.dtype

        mm_prec = self._matmul_precision

        # Noise is drawn per-utterance from per-row keys, so a given
        # utterance+seed yields identical audio regardless of batch
        # composition (batch-invariant serving determinism).
        def encode_fn(params, ids, lengths, noise_w, length_scale, keys, sid):
            with jax.default_matmul_precision(mm_prec):
                # ids arrive in the narrowest dtype that holds
                # num_symbols (uint8/int16): the per-batch host->device
                # id upload rides the serving hot path, and on a
                # tunneled chip the 4x byte cut is ~2 ms/batch. The
                # widening cast is free (fused into the embed gather).
                ids = ids.astype(jnp.int32)
                t = ids.shape[1]
                dur_noise = jax.vmap(
                    lambda k: jax.random.normal(
                        jax.random.fold_in(k, 0), (t, 2), jnp.float32
                    )
                )(keys)
                enc = M.synthesizer_encode(
                    params, ids, lengths, cfg=cfg, noise_w_scale=noise_w,
                    length_scale=length_scale, sid=sid, dur_noise=dur_noise,
                    dtype=dtype,
                )
                # Frame counts computed in-graph: the host fetches this
                # (B,) alone to plan frame buckets — no eager reduce op.
                return enc, jnp.sum(enc.durations, axis=-1)

        fast_io = precision != "parity"

        # The serving decode is two jits, not one: `latents` (row
        # select + counter-mode noise + prior expansion) specializes on
        # (phoneme bucket x frame bucket x rows) but compiles in ~a
        # second; `vocode` (flow reverse + vocoder — where nearly all
        # the compile time lives) specializes on (frame bucket x rows)
        # only. This shrinks the heavy compile space from
        # |pb|*|fb|*|rows| to |fb|*|rows| — the cold-start fix — at the
        # cost of one extra dispatch per decode group.
        def latents_fn(params, enc, rows_idx, noise_scale, keys, sid,
                       num_frames):
            """rows_idx selects the frame-bucket's rows out of the full
            encode batch *inside* the jit — the per-array host gathers
            this replaces cost a dispatch each (~1 ms over a tunneled
            link) times arrays times groups."""
            with jax.default_matmul_precision(mm_prec):
                enc = jax.tree.map(lambda a: a[rows_idx], enc)
                keys = keys[rows_idx]
                sid = sid[rows_idx] if sid is not None else None

                # Counter-mode noise (one key per frame index): the
                # noise prefix is independent of num_frames, so a row
                # decoded at any frame bucket yields identical audio —
                # required for speculative bucket planning (and harmless
                # determinism hardening otherwise).
                def row_noise(k):
                    kf = jax.random.fold_in(k, 1)
                    return jax.vmap(
                        lambda i: jax.random.normal(
                            jax.random.fold_in(kf, i),
                            (cfg.inter_channels,), jnp.float32,
                        )
                    )(jnp.arange(num_frames))

                frame_noise = jax.vmap(row_noise)(keys).astype(dtype)
                z_p, y_mask = M.synthesizer_latents(
                    params, enc, num_frames, cfg=cfg,
                    noise_scale=noise_scale, frame_noise=frame_noise,
                    dtype=dtype,
                )
                g = M.speaker_embedding(params, cfg, sid)
                y_lengths = jnp.sum(enc.durations, axis=-1)
                return z_p, y_mask, g, y_lengths

        def latents_off_fn(params, enc, rows_idx, noise_scale, keys, sid,
                           offset, num_frames):
            """latents_fn for one absolute frame window
            [offset, offset + num_frames) — the long-form path for rows
            whose frame count exceeds the bucket ladder. Counter-mode
            noise is keyed by ABSOLUTE frame index, so window audio is
            identical to what an unbounded monolithic decode would
            produce at those frames. `offset` is traced (one compile
            per (pb, fb, rows) shape serves every window)."""
            with jax.default_matmul_precision(mm_prec):
                enc = jax.tree.map(lambda a: a[rows_idx], enc)
                keys = keys[rows_idx]
                sid = sid[rows_idx] if sid is not None else None

                def row_noise(k):
                    kf = jax.random.fold_in(k, 1)
                    return jax.vmap(
                        lambda i: jax.random.normal(
                            jax.random.fold_in(kf, i),
                            (cfg.inter_channels,), jnp.float32,
                        )
                    )(offset + jnp.arange(num_frames))

                frame_noise = jax.vmap(row_noise)(keys).astype(dtype)
                z_p, y_mask = M.synthesizer_latents(
                    params, enc, num_frames, cfg=cfg,
                    noise_scale=noise_scale, frame_noise=frame_noise,
                    frame_offset=offset, dtype=dtype,
                )
                g = M.speaker_embedding(params, cfg, sid)
                return z_p, y_mask, g

        def vocode_fn(params, z_p, y_mask, g):
            with jax.default_matmul_precision(mm_prec):
                if mesh is None:
                    audio = M.synthesizer_vocode(
                        params, z_p, y_mask, cfg=cfg, g=g
                    )
                else:
                    # Row-parallel via shard_map so the Pallas
                    # time-major fast path partitions too.
                    from ..parallel.sharding import vocode_data_parallel

                    audio = vocode_data_parallel(
                        params, z_p, y_mask, g, cfg=cfg, mesh=mesh
                    )
                if fast_io:
                    # Device-side int16: halves the device->host bytes
                    # (tanh output is bounded in [-1, 1]).
                    audio = jnp.round(
                        jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
                        * 32767.0
                    ).astype(jnp.int16)
                else:
                    audio = audio.astype(jnp.float32)
                return audio

        def _rows_to_buffer(audio_list, out_starts, length, offset=0):
            """Write each group's rows into a flat buffer at
            out_starts - offset via one lax.scan of contiguous
            dynamic_update_slice copies per group. Rows arrive in
            increasing out_start order, so each row's padded tail is
            overwritten by the next row's copy; rows clamped at
            `length` land in the trailing pad region (junk the host
            never reads). Sequential DMA at HBM bandwidth — replaces a
            per-sample searchsorted gather that cost ~10 ms/batch at
            bench sizes."""
            pad = max(a.shape[1] for a in audio_list)
            dtype = audio_list[0].dtype
            buf = jnp.zeros((length + pad,), dtype)
            idx = 0
            for a in audio_list:
                rows_g = a.shape[0]
                st = jnp.clip(out_starts[idx : idx + rows_g] - offset,
                              0, length)

                def body(carry, xs):
                    row, s = xs
                    return (
                        jax.lax.dynamic_update_slice(carry, row, (s,)),
                        None,
                    )

                buf, _ = jax.lax.scan(body, buf, (a.astype(dtype), st))
                idx += rows_g
            return buf[:length]

        def pack_fn(audio_list, out_starts, total):
            """Compact every decode group's valid samples into one flat
            buffer (device-side) so the batch pays a single device->host
            transfer with no padding bytes. out_starts: (R,) int32 —
            row r of the concatenated groups lands at out[r].. in the
            output (source rows are implied by group/row order)."""
            return _rows_to_buffer(audio_list, out_starts, total)

        u_factor = model_cfg.upsample_factor

        def _pack2_body(audio_list, ylen_list, a0, total):
            """Shared core of the speculative pack: compacts the decode
            groups' valid samples by their *device-known* true lengths.
            Returns (ylens, int16 body of total-a0 samples laid out at
            offsets a0 + cumsum(valid))."""
            ylens = jnp.concatenate(ylen_list).astype(jnp.int32)  # (R,)
            caps = jnp.concatenate([
                jnp.full((a.shape[0],), a.shape[1], jnp.int32)
                for a in audio_list
            ])
            valid = jnp.minimum(ylens * u_factor, caps)
            out_starts = a0 + jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(valid)[:-1]]
            )
            body = _rows_to_buffer(audio_list, out_starts, total - a0, a0)
            return ylens, body

        def pack2_fn(audio_list, ylen_list, a0, total):
            """Speculative self-describing pack: the host needs no
            frame sync before this single transfer.

            Layout (int16): [lo15(frames_r), hi(frames_r)] * R padded to
            a0, then rows' valid samples back to back. Rows whose audio
            did not fit (bucket or total overflow) are detected by the
            host from the header and re-fetched exactly (rare; the
            estimator calibrates on every batch).
            """
            ylens, body = _pack2_body(audio_list, ylen_list, a0, total)
            hdr = jnp.stack(
                [(ylens & 0x7FFF).astype(jnp.int16),
                 (ylens >> 15).astype(jnp.int16)], axis=1
            ).reshape(-1)
            hdr = jnp.pad(hdr, (0, a0 - hdr.shape[0])).astype(jnp.int16)
            return jnp.concatenate([hdr, body.astype(jnp.int16)])

        def pack2_mulaw_fn(audio_list, ylen_list, a0, total):
            """Speculative pack on a mu-law wire (uint8, 1 byte/sample;
            see wire_format). a0/total are BYTE counts; the header
            spends 4 bytes/row (frames little-endian in bytes 0-2,
            byte 3 reserved) and sample offsets equal byte offsets."""
            from .codec import mulaw_encode_jnp

            ylens, body = _pack2_body(audio_list, ylen_list, a0, total)
            hdr = jnp.stack(
                [ylens & 0xFF, (ylens >> 8) & 0xFF, (ylens >> 16) & 0xFF,
                 jnp.zeros_like(ylens)],
                axis=1,
            ).reshape(-1)
            hdr = jnp.pad(hdr, (0, a0 - hdr.shape[0])).astype(jnp.uint8)
            return jnp.concatenate([hdr, mulaw_encode_jnp(body)])

        def pack_mulaw_fn(audio_list, starts, total):
            """pack_fn on a mu-law wire: byte k of the output is sample
            k of the int16 pack (offsets are 1:1)."""
            from .codec import mulaw_encode_jnp

            return mulaw_encode_jnp(pack_fn(audio_list, starts, total))

        # fold_in per utterance, batched into one dispatch (seeded mode).
        self._fold_keys = jax.jit(
            jax.vmap(jax.random.fold_in, in_axes=(None, 0))
        )
        # per-row (seed, content-hash) keys in one dispatch: the
        # cross-request batcher coalesces requests with DIFFERENT seeds
        # into one device batch; row r's key must equal exactly what a
        # solo submit with syn.seed=seed_r would derive
        # (fold_in(PRNGKey(seed_r), hash_r)) so coalescing stays
        # semantically invisible.
        self._fold_keys_rows = jax.jit(
            jax.vmap(
                lambda s, h: jax.random.fold_in(jax.random.PRNGKey(s), h)
            )
        )
        # frames-per-id estimator for speculative decode buckets:
        # (mean, upper). None until the first exact batch calibrates.
        self._ratio: Optional[Tuple[float, float]] = None
        self._ratio_lock = threading.Lock()
        # Headroom multiplier on the speculative packed-transfer body
        # (transfer bytes = est_total * margin, quantized). Every
        # point of margin is link bytes on every batch; every
        # shortfall is a per-row re-fetch round trip. Starts
        # conservative and adapts with hysteresis (piecewise constant,
        # like _ratio, so the quantized total — a jit static arg —
        # stays shape-stable): jumps past the realized need on any
        # shortfall, tightens only after a full window of realized
        # totals sits well below it.
        self._spec_margin = 1.12
        self._spec_calibrated = False
        self._spec_need_hist: List[float] = []
        self._estimator_cache_path: Optional[Path] = None
        if estimator_cache:
            self._estimator_cache_path = self._estimator_cache_file()
            self._load_estimators()

        # Optional cross-request admission queue (server): when set,
        # text-level synthesis routes its phrase batch through it so
        # concurrent requests coalesce into shared device batches
        # (see server/batcher.CoalescingBatcher).
        self.batcher = None

        # StreamingDecoder cache, keyed by (chunk_frames, pad_frames):
        # each decoder holds its own jit closure, so constructing one
        # per /stream request would re-trace the chunk vocoder every
        # request; cached here, the trace happens once per chunk shape.
        self._stream_decoders: dict = {}

        self.mesh = mesh
        # Packed single-transfer collection works whenever this process
        # can address the gathered buffer (single chip, or a
        # single-host mesh); multi-host serving reads per-group shards.
        self._use_pack = mesh is None or jax.process_count() == 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._data_size = int(mesh.shape["data"])
            self._data_sharding = data
            self._encode = jax.jit(
                encode_fn,
                in_shardings=(rep, data, data, None, None, data, data),
            )
            self._latents = jax.jit(
                latents_fn, static_argnums=(6,),
                in_shardings=(rep, data, None, None, data, data),
                out_shardings=data,
            )
            self._latents_off = jax.jit(
                latents_off_fn, static_argnums=(7,),
                in_shardings=(rep, data, None, None, data, data, None),
                out_shardings=data,
            )
            self._vocode = self._vocode_nog = jax.jit(
                vocode_fn, in_shardings=(rep, data, data, data),
            )
            # The packed buffer is gathered to every device (GSPMD
            # all-gather over ICI) so the host pays ONE device->host
            # transfer, same as single-chip serving.
            self._pack = jax.jit(
                pack_fn, static_argnums=(2,), out_shardings=rep
            )
            self._pack2 = jax.jit(
                pack2_fn, static_argnums=(2, 3), out_shardings=rep
            )
            self._pack_mulaw = jax.jit(
                pack_mulaw_fn, static_argnums=(2,), out_shardings=rep
            )
            self._pack2_mulaw = jax.jit(
                pack2_mulaw_fn, static_argnums=(2, 3), out_shardings=rep
            )
        else:
            self._data_size = 1
            self._encode = jax.jit(encode_fn)
            self._latents = jax.jit(latents_fn, static_argnums=(6,))
            self._latents_off = jax.jit(latents_off_fn, static_argnums=(7,))
            self._vocode = self._vocode_nog = jax.jit(vocode_fn)
            self._pack = jax.jit(pack_fn, static_argnums=(2,))
            self._pack2 = jax.jit(pack2_fn, static_argnums=(2, 3))
            self._pack_mulaw = jax.jit(pack_mulaw_fn, static_argnums=(2,))
            self._pack2_mulaw = jax.jit(
                pack2_mulaw_fn, static_argnums=(2, 3)
            )
            # Raw (unjitted) stage bodies for the fused-dispatch path:
            # one executable per recurring batch plan covering every
            # decode group + the packed transfer (see _fused_get).
            self._latents_raw = latents_fn
            self._vocode_raw = vocode_fn
            self._pack2_raw = pack2_fn
            self._pack2_mulaw_raw = pack2_mulaw_fn

        # Dispatch fusion (single-process only): on a host whose
        # per-dispatch overhead is large (tunneled/remote chips:
        # ~3.3 ms measured here), a steady-state batch's 2-or-more
        # decode dispatches + pack are collapsed into ONE executable,
        # compiled in the BACKGROUND once a (plan, pack-shape) key has
        # recurred (so varied workloads never stall on a fused
        # compile; quantized estimators make steady plans recur).
        self._fusion = (
            dispatch_fusion
            if dispatch_fusion is not None
            else mesh is None
        ) and mesh is None
        self._fused_cache: dict = {}   # key -> ("ready", Compiled)|("pending"|"failed", None)
        self._fused_counts: dict = {}
        self._fused_lock = threading.Lock()

    def _plan_decode_groups(self, frame_counts) -> List[Tuple[int, List[int]]]:
        """[(frame_bucket, row_positions)] for one encode group's rows
        (see decode_grouping)."""
        if self.decode_grouping == "uniform":
            fb = batching.pick_bucket(
                max(int(f) for f in frame_counts), self.frame_buckets
            )
            return [(fb, list(range(len(frame_counts))))]
        if self.decode_grouping == "packed":
            return batching.plan_packed_groups(
                [int(f) for f in frame_counts], self.frame_buckets,
                round_rows=self._round_rows,
            )
        return batching.group_by_bucket(
            [int(f) for f in frame_counts], self.frame_buckets
        )

    def _round_rows(self, n: int) -> int:
        """Round a decode group's row count up to a power of two (and a
        multiple of the data-axis size): bounds the jit shape space to
        ~log2(B) row counts, so steady-state serving stops compiling
        once warm and warmup() can enumerate every shape."""
        p = 1
        while p < n:
            p <<= 1
        return -(-p // self._data_size) * self._data_size

    # -- fused dispatch (speculative path, single-process) -------------

    def _make_fused(self, plan, a0: int, total: int, mulaw: bool):
        """Build the python body of one fused batch executable.

        `plan`: static tuple of (enc_group_no, frame_bucket, n_real)
        per decode group, in pack order. The body chains every
        group's latents + vocode, slices off row padding, and ends in
        the self-describing pack — one device dispatch for everything
        after encode (and XLA gets to overlap/fuse across group
        boundaries, which separate dispatches forbid)."""
        lat, voc = self._latents_raw, self._vocode_raw
        pack = self._pack2_mulaw_raw if mulaw else self._pack2_raw

        def fused(params, encs, keys_l, sid_l, rows_idx_l, noise_scale):
            audios, ylens = [], []
            for (eg_no, fb, n_real), rows_idx in zip(plan, rows_idx_l):
                z_p, y_mask, g, yl = lat(
                    params, encs[eg_no], rows_idx, noise_scale,
                    keys_l[eg_no], sid_l[eg_no], fb,
                )
                audio = voc(params, z_p, y_mask, g)
                audios.append(audio[:n_real])
                ylens.append(yl[:n_real])
            packed = pack(tuple(audios), tuple(ylens), a0, total)
            return packed, tuple(audios), tuple(ylens)

        return fused

    def _fused_get(self, plan, a0: int, total: int, mulaw: bool, args):
        """Return the compiled fused executable for this batch plan, or
        None (caller falls back to per-group dispatches).

        A plan is compiled only after it RECURS (>=3 sightings) and in
        a background thread (XLA compile releases the GIL), so varied
        workloads never stall serving on a fused compile; quantized
        estimators make steady-state plans recur. The persistent
        compilation cache makes the compile a one-time cost across
        processes."""
        key = (tuple(plan), a0, total, mulaw)
        with self._fused_lock:
            ent = self._fused_cache.get(key)
            if ent is not None:
                return ent[1] if ent[0] == "ready" else None
            n = self._fused_counts.get(key, 0) + 1
            self._fused_counts[key] = n
            if n < 3:
                return None
            self._fused_cache[key] = ("pending", None)
        shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args
        )
        threading.Thread(
            target=self._fused_compile,
            args=(key, plan, a0, total, mulaw, shapes),
            daemon=True,
        ).start()
        return None

    def _fused_compile(self, key, plan, a0, total, mulaw, shapes):
        try:
            fn = jax.jit(self._make_fused(plan, a0, total, mulaw))
            compiled = fn.lower(*shapes).compile()
            with self._fused_lock:
                self._fused_cache[key] = ("ready", compiled)
            _LOGGER.debug("fused dispatch ready: %s", key[0])
        except Exception:
            with self._fused_lock:
                self._fused_cache[key] = ("failed", None)
            _LOGGER.debug(
                "fused dispatch compile failed (plan %s); "
                "keeping per-group dispatches", key[0], exc_info=True,
            )

    def wait_dispatch_fusion(self, timeout: float = 120.0) -> bool:
        """Block until every pending fused-dispatch compile has landed
        (True) or `timeout` elapses (False). No-op (True) when fusion
        is disabled or nothing is pending. For benchmarks/servers that
        want steady-state single-dispatch serving before they start
        measuring or accepting load."""
        if not self._fusion:
            return True
        deadline = time.monotonic() + timeout
        while True:
            with self._fused_lock:
                pending = any(
                    v[0] == "pending" for v in self._fused_cache.values()
                )
            if not pending:
                return True
            if time.monotonic() >= deadline:
                return False
            time.sleep(0.25)

    def _decode(self, params, enc, rows_idx, noise_scale, keys, sid,
                num_frames):
        """latents (cheap jit, pb x fb shapes) then vocode (heavy jit,
        fb-only shapes); see the latents_fn/vocode_fn comment."""
        z_p, y_mask, g, y_lengths = self._latents(
            params, enc, rows_idx, noise_scale, keys, sid, num_frames
        )
        vocode = self._vocode if g is not None else self._vocode_nog
        return vocode(params, z_p, y_mask, g), y_lengths

    # -- long-form decode (frames beyond the bucket ladder) ------------

    # Receptive-field halo for window stitching: flow 4xWN(4 convs,
    # k=5) = 32 frames + generator conv halos ~13 (see
    # parallel/vocoder_shard.py's budget); 64 gives margin for every
    # quality preset.
    _LONGFORM_HALO = 64

    def _longform_halo(self, fb: int) -> int:
        """Halo bounded so each window keeps >= min(fb, 16) frames of
        progress (fb - 2*halo >= 16 whenever fb >= 16; halo 0 for
        degenerate tiny ladders — seam quality degrades there but the
        loop always advances)."""
        return max(0, min(self._LONGFORM_HALO, (fb - 16) // 2))

    def _decode_longform_parts(
        self, enc, enc_row, frames, noise_scale, keys, sid,
        transfer: bool = True,
    ):
        """Decode one row of `frames` total frames (frames > the
        largest bucket) as overlapping windows of the max frame bucket,
        dispatched async. Returns [(audio_dev, lo_frames, keep_frames)]
        — window k's samples [lo*u, (lo+keep)*u) are the stitched
        output. With halo >= the decoder's receptive field the stitched
        waveform equals an unbounded monolithic decode (the policy
        VERDICT r3 required: never raise mid-serving, never truncate;
        reference handles unbounded lengths natively, voice.py:158)."""
        fb = max(self.frame_buckets)
        halo = self._longform_halo(fb)
        rows_idx = jnp.asarray([enc_row] * max(self._data_size, 1))
        parts = []
        emitted = 0
        while emitted < frames:
            off = 0 if emitted == 0 else emitted - halo
            lo = emitted - off
            if frames - off <= fb:
                keep = frames - emitted
            else:
                keep = fb - lo - halo
            z_p, y_mask, g = self._latents_off(
                self.params, enc, rows_idx, noise_scale, keys, sid,
                jnp.int32(off), int(fb),
            )
            vocode = self._vocode if g is not None else self._vocode_nog
            audio = vocode(self.params, z_p, y_mask, g)
            if transfer:
                try:
                    audio.copy_to_host_async()
                except AttributeError:
                    pass
            parts.append((audio, lo, keep))
            emitted += keep
        return parts

    def _assemble_longform(self, parts, u: int) -> np.ndarray:
        """Stitch long-form window parts into one float32 waveform."""
        segs = []
        for audio, lo, keep in parts:
            a = np.asarray(audio)[0]
            segs.append(a[lo * u : (lo + keep) * u])
        seg = np.concatenate(segs)
        if seg.dtype == np.int16:
            return self._int16_through_wire(seg)
        return seg.astype(np.float32)

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    @classmethod
    def load(
        cls,
        model_path: Union[str, Path],
        config_path: Optional[Union[str, Path]] = None,
        **kw,
    ) -> "TpuVoice":
        """Load a voice from a .ckpt (piper_train Lightning), .onnx
        (exported piper voice), or .npz (piper_tpu native) with its
        JSON config sidecar (reference: voice.py:24-55)."""
        model_path = Path(model_path)
        if config_path is None:
            config_path = (
                model_path.with_suffix(model_path.suffix + ".json")
                if model_path.suffix != ".json"
                else model_path
            )
            if not Path(config_path).exists():
                config_path = model_path.with_suffix(".json")
        config = VoiceConfig.from_file(config_path)
        model_cfg = config.model_config()

        suffix = model_path.suffix.lower()
        if suffix == ".ckpt":
            from ..weights.torch_loader import load_torch_checkpoint

            params, model_cfg = load_torch_checkpoint(str(model_path))
        elif suffix == ".onnx":
            from ..weights.onnx_loader import load_onnx_voice

            params, model_cfg = load_onnx_voice(str(model_path), model_cfg)
        elif suffix == ".npz":
            from ..weights.native import load_native

            params, model_cfg = load_native(str(model_path))
        else:
            raise ValueError(f"unsupported voice format: {model_path}")
        return cls(params, model_cfg, config, **kw)

    @classmethod
    def random(
        cls,
        quality: str = "medium",
        *,
        num_symbols: int = 256,
        num_speakers: int = 1,
        seed: int = 0,
        vocoder: str = "hifigan",
        variant: str = "vits",
        **kw,
    ) -> "TpuVoice":
        """Random-weight voice (benchmarks, smoke tests)."""
        if vocoder == "mb_istft":
            if variant != "vits":
                raise ValueError(
                    "vocoder='mb_istft' with variant='vits2' is not a "
                    "supported combination yet; pick one"
                )
            model_cfg = ModelConfig.mb_istft(
                quality, num_symbols=num_symbols, num_speakers=num_speakers
            )
        elif variant == "vits2":
            model_cfg = ModelConfig.vits2(
                quality, num_symbols=num_symbols, num_speakers=num_speakers
            )
        else:
            model_cfg = ModelConfig.for_quality(
                quality, num_symbols=num_symbols, num_speakers=num_speakers
            )
        params = M.init_synthesizer_params(jax.random.PRNGKey(seed), model_cfg)
        id_map = {chr(32 + i): [i] for i in range(num_symbols)}
        id_map.update({"_": [0], "^": [1], "$": [2]})
        config = VoiceConfig(
            num_symbols=num_symbols,
            num_speakers=num_speakers,
            sample_rate=model_cfg.audio.sample_rate,
            espeak_voice="en-us",
            inference=InferenceDefaults(),
            phoneme_id_map=id_map,
        )
        return cls(params, model_cfg, config, seed=seed, **kw)

    # ------------------------------------------------------------------
    # Text front end
    # ------------------------------------------------------------------

    def phonemize(self, text: str) -> List[List[str]]:
        return phonemize(text, self.config, backend=self.phonemizer)

    def phonemes_to_ids(self, phonemes: Sequence[str]) -> List[int]:
        return phonemes_to_ids(
            phonemes, self.config.phoneme_id_map,
            phoneme_map=self.config.phoneme_map or None,
        )

    # ------------------------------------------------------------------
    # Synthesis
    # ------------------------------------------------------------------

    def _next_key(self, seed: Optional[int] = None):
        if seed is not None:
            return jax.random.PRNGKey(seed & 0xFFFFFFFF)
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    @staticmethod
    def _content_hashes(ids_list) -> np.ndarray:
        """Per-utterance content hash for seeded noise keys."""
        hashes = np.fromiter(
            (
                zlib.crc32(np.asarray(ids, np.int32).tobytes()) & 0x7FFFFFFF
                for ids in ids_list
            ),
            np.uint32,
            count=len(ids_list),
        )
        return hashes if len(hashes) else np.zeros((1,), np.uint32)

    def _utt_keys(self, ids_list, seed: int):
        """The per-utterance (seed, content-hash) noise keys — ONE
        derivation shared by batch submit and streaming so the same
        utterance+seed yields the same audio on either path. Seeds are
        taken mod 2^32 everywhere (batcher row seeds, solo submits,
        streaming), so coalescing stays composition-invariant for any
        Python int seed."""
        return self._fold_keys(
            jax.random.PRNGKey(seed & 0xFFFFFFFF),
            jnp.asarray(self._content_hashes(ids_list)),
        )

    def synthesize_ids_batch(
        self,
        ids_list: Sequence[Sequence[int]],
        *,
        syn: Optional[SynthesisConfig] = None,
        stats: Optional[SynthesisStats] = None,
    ) -> List[np.ndarray]:
        """Synthesize many id sequences; returns float32 waveforms.

        The device pipeline (per phoneme bucket): encode once, regroup
        by frame bucket, decode batched; see module docstring.
        """
        return self.collect(self.submit(ids_list, syn=syn), stats=stats)

    def set_wire_format(self, wire_format: str) -> None:
        """Switch the packed-transfer wire format on a live voice (both
        pack kernel families are always built; see wire_format in
        __init__). Used by the benchmark's mu-law companion run."""
        if wire_format not in ("int16", "mulaw"):
            raise ValueError(f"wire_format: {wire_format!r}")
        if wire_format == "mulaw" and self.precision == "parity":
            raise ValueError(
                "wire_format='mulaw' needs the int16 device path "
                "(precision='fast'); parity mode transfers float32"
            )
        self.wire_format = wire_format

    def submit(
        self,
        ids_list: Sequence[Sequence[int]],
        *,
        syn: Optional[SynthesisConfig] = None,
        transfer: bool = True,
        row_seeds: Optional[Sequence[Optional[int]]] = None,
    ) -> dict:
        """Dispatch a batch; returns a handle for collect().

        Device work and device->host copies run asynchronously, so a
        caller can pipeline: submit(batch N+1) before collect(batch N)
        overlaps N+1's compute with N's host transfer.

        `transfer=False` skips the eager device->host copy start — the
        benchmark's device-only timing mode (block on the packed
        buffer's computation without occupying the host link). collect()
        still works (it fetches synchronously).

        `row_seeds` gives each utterance its own seed (None entries
        draw fresh noise), overriding syn.seed — the cross-request
        batcher uses this to coalesce requests with different seeds
        into one device batch; row r's audio is identical to a solo
        seeded submit.
        """
        syn = syn or SynthesisConfig()
        inf = self.config.inference
        noise_scale = jnp.float32(
            syn.noise_scale if syn.noise_scale is not None else inf.noise_scale
        )
        length_scale = jnp.float32(
            syn.length_scale if syn.length_scale is not None else inf.length_scale
        )
        noise_w = jnp.float32(
            syn.noise_w if syn.noise_w is not None else inf.noise_w
        )
        t0 = time.perf_counter()

        lengths = [len(ids) for ids in ids_list]
        results: List[Optional[np.ndarray]] = [None] * len(ids_list)
        u = self.model_cfg.upsample_factor

        # Per-utterance keys, derived in ONE device dispatch: under
        # syn.seed, keyed by (seed, content hash) so the same utterance
        # yields identical audio in any batch composition
        # (batch-invariant serving determinism); fresh stream keys
        # otherwise.
        n_utt = max(len(ids_list), 1)
        if row_seeds is not None:
            # None entries mean fresh noise: substitute a random seed
            # (semantically equivalent to an unseeded draw). Seeds are
            # taken mod 2^32 everywhere (see _utt_keys), so a row's
            # key equals a solo seeded submit's.
            hashes = self._content_hashes(ids_list)
            seeds = np.fromiter(
                (
                    (s & 0xFFFFFFFF) if s is not None
                    else int.from_bytes(os.urandom(4), "little")
                    for s in row_seeds
                ),
                np.uint32,
                count=len(row_seeds),
            )
            seeds = np.resize(seeds, hashes.shape)
            keys_all = self._fold_keys_rows(
                jnp.asarray(seeds), jnp.asarray(hashes)
            )
        elif syn.seed is not None:
            keys_all = self._utt_keys(ids_list, syn.seed)
        else:
            keys_all = jax.random.split(self._next_key(), n_utt)

        # Phase A: dispatch every encode (async — no host sync yet).
        # With a mesh, row counts are padded to a multiple of the data
        # axis (padding rows repeat row 0 and are discarded).
        ds = self._data_size
        encode_groups = []
        for bucket, indices in batching.group_by_bucket(
            lengths, self.phoneme_buckets
        ):
            b = len(indices)
            b_pad = self._round_rows(b)
            ids_arr = np.zeros((b_pad, bucket), self._ids_wire_dtype)
            len_arr = np.ones((b_pad,), np.int32)
            for row, idx in enumerate(indices):
                seq = np.asarray(ids_list[idx], self._ids_wire_dtype)
                ids_arr[row, : len(seq)] = seq
                len_arr[row] = len(seq)
            key_idx = np.asarray(indices + indices[:1] * (b_pad - b), np.int32)
            keys = keys_all[key_idx]
            sid = None
            if self._multispeaker:
                spk = syn.speaker_id if syn.speaker_id is not None else 0
                sid = jnp.full((b_pad,), spk, jnp.int32)
            enc, frames_dev = self._encode(
                self.params, jnp.asarray(ids_arr), jnp.asarray(len_arr),
                noise_w, length_scale, keys, sid,
            )
            encode_groups.append((indices, enc, frames_dev, keys, sid))

        # Speculative path (steady-state serving, single-chip or mesh):
        # frame buckets are chosen from the calibrated frames-per-id
        # estimator, so submit() never waits on the device — the true
        # frame counts ride back in the packed transfer's header and
        # mispredictions are re-fetched exactly in collect().
        if (
            self._use_pack
            and self.precision != "parity"
            and self._ratio is not None
            and encode_groups
        ):
            return self._dispatch_speculative(
                encode_groups, lengths, results, noise_scale, t0, u,
                transfer=transfer,
            )

        # Phase B: sync frame counts — one concatenated transfer for all
        # encode groups (each host sync pays full link latency).
        if len(encode_groups) > 1:
            all_frames = np.asarray(
                jnp.concatenate([g[2] for g in encode_groups])
            )
            frame_splits = np.split(
                all_frames,
                np.cumsum([int(g[2].shape[0]) for g in encode_groups])[:-1],
            )
        else:
            frame_splits = [np.asarray(encode_groups[0][2])] if encode_groups else []

        # Calibrate the frames-per-id estimator from the exact counts.
        obs = [
            (float(f), float(lengths[idx]))
            for (indices, *_), frames in zip(encode_groups, frame_splits)
            for idx, f in zip(indices, frames[: len(indices)])
            if lengths[idx] > 0
        ]
        if obs:
            self._update_ratio(
                [f / l for f, l in obs]
            )

        # Dispatch every decode (row selection fused into the decode
        # jit). Single-process (one chip or a single-host mesh): all
        # groups' valid samples are then compacted device-side into ONE
        # flat buffer — one d->h transfer per batch, zero padding bytes
        # (the host link is the serving bottleneck; see pack_fn).
        # Multi-host: per-group transfers (each host reads its
        # addressable shards).
        decode_groups = []
        pack_audio: List[Any] = []
        # (result_index, out_start, n_samples) per packed row
        pack_rows: List[Tuple[int, int, int]] = []
        out_pos = 0
        max_fb = max(self.frame_buckets)
        # (result_index, [(audio_dev, lo, keep)]) long-form rows
        long_rows: List[Tuple[int, list]] = []
        for (indices, enc, frames_dev, keys, sid), frames in zip(
            encode_groups, frame_splits
        ):
            real_frames = frames[: len(indices)]
            normal_rows = []
            for row in range(len(indices)):
                f = int(real_frames[row])
                if f > max_fb:
                    # Frame-bucket overflow: windowed decode + stitch
                    # (never a mid-serving ValueError).
                    long_rows.append((
                        indices[row],
                        self._decode_longform_parts(
                            enc, row, f, noise_scale, keys, sid,
                            transfer=transfer,
                        ),
                    ))
                else:
                    normal_rows.append(row)
            if not normal_rows:
                continue
            for fbucket, rows_local in self._plan_decode_groups(
                [int(real_frames[r]) for r in normal_rows]
            ):
                rows = [normal_rows[j] for j in rows_local]
                pad_n = self._round_rows(len(rows)) - len(rows)
                rows_idx = jnp.asarray(rows + rows[:1] * pad_n)
                audio, _y_lengths = self._decode(
                    self.params, enc, rows_idx, noise_scale,
                    keys, sid, int(fbucket),
                )
                if self._use_pack:
                    for row in rows:
                        n = int(real_frames[row]) * u
                        pack_rows.append((indices[row], out_pos, n))
                        out_pos += n
                    # real rows only: pack's scan pairs each row with
                    # its out_start (mesh padding rows are dropped,
                    # same as the speculative path)
                    pack_audio.append(audio[: len(rows)])
                else:
                    if transfer:
                        try:
                            audio.copy_to_host_async()
                        except AttributeError:  # non-jax array in tests
                            pass
                    decode_groups.append((indices, rows, frames, audio))

        packed = None
        if pack_audio:
            total = -(-out_pos // self._PACK_QUANTUM) * self._PACK_QUANTUM
            if self.pack_total == "pow2":
                p = self._PACK_QUANTUM
                while p < total:
                    p <<= 1
                total = p
            out_starts = jnp.asarray(
                np.asarray([r[1] for r in pack_rows], np.int32)
            )
            packed = (
                self._pack_mulaw
                if self.wire_format == "mulaw"
                else self._pack
            )(tuple(pack_audio), out_starts, total)
            # Start the device->host copy as early as possible (right
            # after pack computes). The host link is FIFO, so the next
            # batch's tiny frame-count sync queues behind this copy —
            # but the link is the bottleneck resource either way, and
            # starting the big copy late just adds idle link time
            # (measured: lazy fetch-in-collect is ~15% slower end to
            # end).
            if transfer:
                try:
                    packed.copy_to_host_async()
                except AttributeError:
                    pass

        return {
            "decode_groups": decode_groups,
            "packed": packed,
            "pack_rows": pack_rows,
            "long_rows": long_rows,
            "results": results,
            "t0": t0,
            "u": u,
        }

    def _update_ratio(self, ratios: List[float]) -> None:
        """Track (mean, upper) frames-per-id: mean sizes the packed
        transfer, upper picks decode buckets. Upper is piecewise
        CONSTANT with hysteresis — it jumps up immediately on a near
        miss (a miss costs a re-decode) and snaps down only when 2x
        oversized. A continuously-drifting upper would change bucket
        groupings (hence jit shapes) every batch; holding it steady is
        what keeps steady-state serving compile-free."""
        obs_mean = float(np.mean(ratios))
        obs_max = float(np.max(ratios))
        with self._ratio_lock:
            prev = self._ratio
            if self._ratio is None:
                self._ratio = (obs_mean * 1.05, obs_max * 1.25)
            else:
                rm, ru = self._ratio
                # rm sizes the packed transfer (a jit static arg via
                # the quantized total): hold it too, stepping only when
                # >12.5% off — a drifting rm means a new pack shape
                # every few batches, and even a compilation-cache HIT
                # costs ~1-2 s of executable loading on remote links.
                if not (0.875 * rm <= obs_mean * 1.05 <= 1.125 * rm):
                    rm = obs_mean * 1.05
                if obs_max * 1.1 > ru or obs_max * 2.0 < ru:
                    ru = obs_max * 1.25
                self._ratio = (rm, ru)
            if self._ratio != prev:
                self._save_estimators_locked()

    # -- estimator persistence (opt-in; see `estimator_cache`) ---------

    def _estimator_cache_file(self) -> Optional[Path]:
        """Key the estimator snapshot by voice weights + every knob
        that shapes the speculative pipeline."""
        try:
            cache = jax.config.jax_compilation_cache_dir
            if not cache:
                return None
            import hashlib

            h = hashlib.md5()
            try:
                # Cheap but broad weights digest: every leaf's shape
                # plus a strided sample of the embedding — two voices
                # with the same config must not share a snapshot.
                for kp, leaf in sorted(
                    jax.tree_util.tree_flatten_with_path(self.params)[0],
                    key=lambda kv: str(kv[0]),
                ):
                    h.update(str(kp).encode())
                    h.update(str(getattr(leaf, "shape", ())).encode())
                emb = np.asarray(
                    self.params["enc_p"]["emb"]["weight"]
                ).astype(np.float32)
                h.update(emb[:: max(1, emb.shape[0] // 8)].tobytes())
            except Exception:
                _LOGGER.debug(
                    "estimator key: params digest failed; keying on "
                    "config only", exc_info=True,
                )
            h.update(repr(self.model_cfg).encode())
            h.update(repr((
                tuple(self.phoneme_buckets), tuple(self.frame_buckets),
                self.decode_grouping, self.wire_format, self.precision,
            )).encode())
            return (
                Path(cache) / "estimators" / (h.hexdigest() + ".json")
            )
        except Exception:  # pragma: no cover - best-effort
            return None

    def _load_estimators(self) -> None:
        path = self._estimator_cache_path
        if path is None or not path.exists():
            return
        try:
            with open(path) as f:
                snap = json.load(f)
            rm, ru = float(snap["ratio"][0]), float(snap["ratio"][1])
            margin = float(snap["margin"])
            # A corrupt/hand-edited snapshot (NaN margin, non-positive
            # ratios) would brick every speculative dispatch at
            # int(est_total * margin); validate and ignore bad values.
            if not all(math.isfinite(v) for v in (rm, ru, margin)):
                raise ValueError("non-finite estimator value")
            if not (rm > 0 and ru > 0 and 0.25 <= margin <= 1.5):
                raise ValueError("estimator value out of range")
            with self._ratio_lock:
                self._ratio = (rm, ru)
                self._spec_margin = margin
                self._spec_calibrated = True
            _LOGGER.debug("loaded serving estimators from %s", path)
        except Exception:  # pragma: no cover - best-effort
            _LOGGER.debug(
                "ignoring unreadable/invalid estimator snapshot: %s", path
            )
            try:
                path.unlink()
            except OSError:
                pass

    def _save_estimators_locked(self) -> None:
        """Write the snapshot (caller holds _ratio_lock). Values are
        piecewise constant, so this runs on the rare change, not per
        batch."""
        path = self._estimator_cache_path
        if path is None or self._ratio is None:
            return
        try:
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(".tmp%d" % os.getpid())
            with open(tmp, "w") as f:
                json.dump(
                    {"ratio": list(self._ratio),
                     "margin": self._spec_margin}, f
                )
            os.replace(tmp, path)
        except Exception:  # pragma: no cover - best-effort
            _LOGGER.debug("estimator snapshot write failed", exc_info=True)

    def _dispatch_speculative(
        self, encode_groups, lengths, results, noise_scale, t0, u,
        transfer: bool = True,
    ) -> dict:
        """Decode at estimated frame buckets and emit one
        self-describing packed transfer (see pack2_fn). No host sync."""
        with self._ratio_lock:
            rm, ru = self._ratio
        # Quantize the estimator at USE: the EMA drifts a little every
        # batch, and un-quantized it changes est frame counts — hence
        # bucket groupings, hence jit shapes — on every batch, causing
        # steady-state recompiles. 1/8-step quantization keeps
        # groupings stable while the EMA converges underneath.
        rm = math.ceil(rm * 8.0) / 8.0
        ru = math.ceil(ru * 8.0) / 8.0
        ds = self._data_size
        max_fb = max(self.frame_buckets)
        spec_audio: List[Any] = []
        spec_ylens: List[Any] = []
        # per packed row: (result_idx, cap_samples, group_no, row_in_group,
        #                  enc_group_no, row_in_enc, id_len)
        spec_rows: List[Tuple[int, int, int, int, int, int, int]] = []
        est_total = 0
        # Plan every decode group FIRST (host-only): the plan + pack
        # shape form the fused-dispatch key, and the pack header sizes
        # need the total row count up front either way.
        plan: List[Tuple[int, int, int]] = []  # (eg_no, fbucket, n_real)
        rows_idx_l: List[Any] = []
        for eg_no, (indices, enc, frames_dev, keys, sid) in enumerate(
            encode_groups
        ):
            est = [
                min(max(int(lengths[idx] * ru) + 4, 1), max_fb)
                for idx in indices
            ]
            for fbucket, rows in self._plan_decode_groups(est):
                pad_n = self._round_rows(len(rows)) - len(rows)
                rows_idx_l.append(
                    jnp.asarray(
                        np.asarray(rows + rows[:1] * pad_n, np.int32)
                    )
                )
                g_no = len(plan)
                plan.append((eg_no, int(fbucket), len(rows)))
                cap = int(fbucket) * u
                for row_i, row in enumerate(rows):
                    spec_rows.append(
                        (indices[row], cap, g_no, row_i, eg_no, row,
                         lengths[indices[row]])
                    )
                    est_total += min(
                        int(lengths[indices[row]] * rm * u) + 4 * u, cap
                    )
        r = len(spec_rows)
        mulaw = self.wire_format == "mulaw"
        # header: 2 int16 slots/row (int16 wire) or 4 bytes/row (mu-law
        # wire, where a0/total count BYTES and 1 sample = 1 byte)
        a0 = -(-(4 if mulaw else 2) * r // 128) * 128
        q = self._PACK_QUANTUM
        with self._ratio_lock:
            margin = self._spec_margin
        body = max(q, -(-int(est_total * margin) // q) * q)
        if self.pack_total == "pow2":
            p = q
            while p < body:
                p <<= 1
            body = p
        total = a0 + body

        fused = None
        if self._fusion and ds == 1:
            fused_args = (
                self.params,
                tuple(g[1] for g in encode_groups),   # encs
                tuple(g[3] for g in encode_groups),   # keys
                tuple(g[4] for g in encode_groups),   # sids
                tuple(rows_idx_l),
                noise_scale,
            )
            fused = self._fused_get(plan, a0, total, mulaw, fused_args)
        if fused is not None:
            packed, spec_audio_t, spec_ylens_t = fused(*fused_args)
            spec_audio = list(spec_audio_t)
            spec_ylens = list(spec_ylens_t)
        else:
            for (eg_no, fbucket, n_real), rows_idx in zip(plan, rows_idx_l):
                _, enc, _, keys, sid = encode_groups[eg_no]
                audio, ylen = self._decode(
                    self.params, enc, rows_idx, noise_scale,
                    keys, sid, fbucket,
                )
                # Drop mesh/row padding before packing: pack2's header
                # and offsets must describe exactly the real rows.
                spec_audio.append(audio[:n_real])
                spec_ylens.append(ylen[:n_real])
            packed = (self._pack2_mulaw if mulaw else self._pack2)(
                tuple(spec_audio), tuple(spec_ylens), a0, total
            )
        if transfer:
            try:
                packed.copy_to_host_async()
            except AttributeError:
                pass
        return {
            "spec": {
                "packed": packed,
                "a0": a0,
                "total": total,
                "est_body": est_total,
                "rows": spec_rows,
                "audio": spec_audio,
                "encode_groups": encode_groups,
                "noise_scale": noise_scale,
            },
            "decode_groups": [],
            "packed": None,
            "pack_rows": [],
            "results": results,
            "t0": t0,
            "u": u,
        }

    def _seg_to_float(self, seg: np.ndarray) -> np.ndarray:
        """One wire segment -> float32 (decodes the wire codec)."""
        if seg.dtype == np.uint8:
            from . import codec

            seg = codec.mulaw_decode(seg)
        return native.int16_to_float(seg)

    def _int16_through_wire(self, seg: np.ndarray) -> np.ndarray:
        """int16 row fetched OUTSIDE the packed transfer (speculative
        re-fetch/re-decode) -> float32, routed through the wire codec
        so a row's audio is bit-identical whether it came packed or
        not."""
        if self.wire_format == "mulaw":
            from . import codec

            seg = codec.mulaw_decode(codec.mulaw_encode(seg))
        return native.int16_to_float(seg)

    def _collect_speculative(self, spec: dict, results, u) -> None:
        flat = np.asarray(spec["packed"])
        rows = spec["rows"]
        r = len(rows)
        if flat.dtype == np.uint8:
            # mu-law wire: 4-byte little-endian frame counts
            hdr = flat[: 4 * r].astype(np.int32).reshape(r, 4)
            true_frames = hdr[:, 0] | (hdr[:, 1] << 8) | (hdr[:, 2] << 16)
        else:
            hdr = flat[: 2 * r].astype(np.int32)
            true_frames = (hdr[1::2] << 15) | (hdr[0::2] & 0x7FFF)
        total = spec["total"]
        out = spec["a0"]
        # rows needing exact re-fetch: (list_pos, true_n)
        refetch: List[Tuple[int, int]] = []
        redecode: List[Tuple[int, int]] = []
        for i, (res_idx, cap, g_no, row_i, eg_no, enc_row, id_len) in enumerate(
            rows
        ):
            n_true = int(true_frames[i]) * u
            valid = min(n_true, cap)
            if n_true <= cap and out + valid <= total:
                seg = flat[out : out + valid]
                results[res_idx] = self._seg_to_float(seg)
            elif n_true <= cap:
                refetch.append((i, n_true))
            else:
                redecode.append((i, int(true_frames[i])))
            out += valid
        for i, n_true in refetch:
            res_idx, cap, g_no, row_i, *_ = rows[i]
            seg = np.asarray(spec["audio"][g_no][row_i, :n_true])
            results[res_idx] = self._int16_through_wire(seg)
        if redecode:
            _LOGGER.debug(
                "speculative bucket overflow: re-decoding %d rows",
                len(redecode),
            )
        max_fb = max(self.frame_buckets)
        # Batch the in-ladder overflow rows by (encode group, target
        # bucket): under concurrent serving a batch can miss several
        # rows at once (per-row duration variance), and decoding them
        # one dispatch PER ROW serialized multi-second tails onto
        # otherwise-fast batches. One decode dispatch per group; the
        # per-row device->host slice fetches stay row-sized.
        longform: List[Tuple[int, int]] = []
        by_group: dict = {}
        for i, frames in redecode:
            if frames > max_fb:
                longform.append((i, frames))
                continue
            eg_no = rows[i][4]
            fbucket = batching.pick_bucket(frames, self.frame_buckets)
            by_group.setdefault((eg_no, int(fbucket)), []).append((i, frames))
        for (eg_no, fbucket), items in by_group.items():
            indices, enc, frames_dev, keys, sid = spec["encode_groups"][eg_no]
            enc_rows = [rows[i][5] for i, _f in items]
            pad_n = self._round_rows(len(enc_rows)) - len(enc_rows)
            audio, _yl = self._decode(
                self.params, enc,
                jnp.asarray(enc_rows + enc_rows[:1] * pad_n),
                spec["noise_scale"], keys, sid, fbucket,
            )
            for j, (i, frames) in enumerate(items):
                res_idx = rows[i][0]
                seg = np.asarray(audio[j, : frames * u])
                results[res_idx] = self._int16_through_wire(seg)
        for i, frames in longform:
            res_idx, cap, g_no, row_i, eg_no, enc_row, id_len = rows[i]
            indices, enc, frames_dev, keys, sid = spec["encode_groups"][eg_no]
            # Beyond the bucket ladder entirely: long-form windowed
            # decode + stitch — full-length audio, same policy as
            # the exact path (no silent truncation).
            parts = self._decode_longform_parts(
                enc, enc_row, frames, spec["noise_scale"], keys, sid
            )
            results[res_idx] = self._assemble_longform(parts, u)
        # calibrate the transfer-size margin from the realized body
        # size (`out` ends at a0 + sum(valid) = what a perfectly sized
        # transfer would have carried). `refetch` rows mean the margin
        # fell short (re-decodes are the bucket estimator's miss, not
        # the margin's); an empty refetch list feeds the tightening
        # window.
        est_body = spec.get("est_body") or 0
        if est_body > 0:
            need = (out - spec["a0"]) / est_body
            with self._ratio_lock:
                m = self._spec_margin
                m_before = m
                if refetch:
                    if need * 1.05 > 1.5:
                        # Margin cap binding: persistent per-row
                        # re-fetches with no other symptom — make the
                        # latency regression diagnosable.
                        _LOGGER.info(
                            "speculative transfer margin cap (1.5) "
                            "binding: realized need %.2fx estimate; "
                            "%d rows re-fetched", need, len(refetch),
                        )
                    self._spec_margin = min(
                        max(need * 1.05, m * 1.05), 1.5
                    )
                    self._spec_calibrated = True
                    self._spec_need_hist.clear()
                elif not self._spec_calibrated:
                    # Fast first calibration (like _ratio's): a short
                    # window, then snap to the realized need. The
                    # estimator's own per-row overshoot means need is
                    # typically < 1, so the margin routinely lands
                    # under 1.0 — the floor is only a sanity bound.
                    self._spec_need_hist.append(need)
                    if len(self._spec_need_hist) >= 4:
                        self._spec_margin = min(
                            max(max(self._spec_need_hist) * 1.05, 0.25),
                            m,
                        )
                        self._spec_calibrated = True
                        del self._spec_need_hist[:]
                else:
                    self._spec_need_hist.append(need)
                    if len(self._spec_need_hist) >= 16:
                        tight = max(self._spec_need_hist) * 1.04
                        if tight < m - 0.02:
                            self._spec_margin = max(tight, 0.25)
                        del self._spec_need_hist[:-8]
                if self._spec_margin != m_before:
                    self._save_estimators_locked()
        # calibrate from the true counts
        ratios = [
            float(true_frames[i]) / rows[i][6]
            for i in range(r)
            if rows[i][6] > 0
        ]
        if ratios:
            self._update_ratio(ratios)

    def collect(
        self, handle: dict, *, stats: Optional[SynthesisStats] = None
    ) -> List[np.ndarray]:
        """Wait for a submit()ted batch and return float32 waveforms."""
        results = handle["results"]
        u = handle["u"]
        if handle.get("spec") is not None:
            self._collect_speculative(handle["spec"], results, u)
        for res_idx, parts in handle.get("long_rows") or []:
            results[res_idx] = self._assemble_longform(parts, u)
        if handle.get("packed") is not None:
            flat = np.asarray(handle["packed"])
            if flat.dtype in (np.int16, np.uint8):
                flat = self._seg_to_float(flat)
            else:
                flat = flat.astype(np.float32)
            for res_idx, out_start, n in handle["pack_rows"]:
                results[res_idx] = flat[out_start : out_start + n]
        for indices, rows, frames, audio in handle["decode_groups"]:
            audio_np = np.asarray(audio)
            if audio_np.dtype == np.int16:
                # route through the wire codec (identity for int16) so
                # multi-host rows match packed-path audio bit-exactly
                audio_np = self._int16_through_wire(audio_np)
            else:
                audio_np = audio_np.astype(np.float32)
            for row_i, row in enumerate(rows):
                n = int(frames[row]) * u
                results[indices[row]] = audio_np[row_i, :n]

        dt = time.perf_counter() - handle["t0"]
        if stats is not None:
            stats.infer_seconds += dt
            stats.audio_seconds += sum(
                len(r) for r in results if r is not None
            ) / self.config.sample_rate
        return [r if r is not None else np.zeros(0, np.float32) for r in results]

    def synthesize_stream_raw(
        self,
        text: str,
        *,
        syn: Optional[SynthesisConfig] = None,
        stats: Optional[SynthesisStats] = None,
    ):
        """Per-sentence int16 chunks (reference: voice.py:114-138),
        with phrase splitting on silence phonemes
        (reference: piper.cpp:508-537)."""
        syn = syn or SynthesisConfig()
        sentence_phonemes = self.phonemize(text)

        phoneme_silence = (
            syn.phoneme_silence_seconds
            if syn.phoneme_silence_seconds is not None
            else self.config.phoneme_silence_seconds
        )
        sr = self.config.sample_rate
        sentence_silence = int(syn.sentence_silence_seconds * sr)

        # Split each sentence into phrases at silence phonemes.
        phrase_ids: List[List[int]] = []
        # (sentence_idx, silence_samples) per phrase
        phrase_meta: List[Tuple[int, int]] = []
        for s_idx, phonemes in enumerate(sentence_phonemes):
            if phoneme_silence:
                current: List[str] = []
                phrases: List[Tuple[List[str], int]] = []
                for ph in phonemes:
                    current.append(ph)
                    if ph in phoneme_silence:
                        phrases.append(
                            (current, int(phoneme_silence[ph] * sr))
                        )
                        current = []
                if current:
                    phrases.append((current, 0))
            else:
                phrases = [(list(phonemes), 0)]
            # Guard against phrases longer than the largest bucket:
            # split into fitting chunks (preferring space boundaries) —
            # the reference never hits this because it has no static
            # shapes; we must bound the id length. The cost accounts
            # for phoneme_map expansion and multi-id map entries.
            max_ids = max(self.phoneme_buckets)
            id_map = self.config.phoneme_id_map
            ph_map = self.config.phoneme_map or {}

            pad_len = len(id_map.get("_", [0]))

            def id_cost(p: str) -> int:
                expanded = ph_map.get(p, [p])
                return sum(
                    len(id_map[q]) + pad_len
                    for q in expanded
                    if q in id_map
                )

            for phones, sil in phrases:
                if not phones:
                    continue
                chunks = _split_phonemes(phones, max_ids, id_cost)
                for i, chunk in enumerate(chunks):
                    last = i == len(chunks) - 1
                    phrase_ids.append(self.phonemes_to_ids(chunk))
                    phrase_meta.append((s_idx, sil if last else 0))

        batch_fn = (
            self.batcher.synthesize_ids_batch
            if self.batcher is not None
            else self.synthesize_ids_batch
        )
        audios = batch_fn(phrase_ids, syn=syn, stats=stats)

        # Reassemble per sentence, appending phrase/sentence silence.
        n_sentences = len(sentence_phonemes)
        for s_idx in range(n_sentences):
            parts = []
            for (meta_s, sil), audio in zip(phrase_meta, audios):
                if meta_s != s_idx:
                    continue
                parts.append(audio)
                if sil:
                    parts.append(np.zeros(sil, np.float32))
            if not parts:
                continue
            joined = np.concatenate(parts)
            pcm = audio_float_to_int16(joined * syn.volume)
            if sentence_silence:
                pcm = np.concatenate(
                    [pcm, np.zeros(sentence_silence, np.int16)]
                )
            yield pcm.tobytes()

    def synthesize(
        self,
        text: str,
        *,
        syn: Optional[SynthesisConfig] = None,
        stats: Optional[SynthesisStats] = None,
    ) -> np.ndarray:
        """Text -> int16 waveform."""
        chunks = list(self.synthesize_stream_raw(text, syn=syn, stats=stats))
        if not chunks:
            return np.zeros(0, np.int16)
        return np.frombuffer(b"".join(chunks), dtype=np.int16)

    def synthesize_wav(
        self, text: str, wav_file, *, syn: Optional[SynthesisConfig] = None,
        stats: Optional[SynthesisStats] = None,
    ) -> None:
        """Write synthesized audio into an open wave.Wave_write
        (reference: voice.py:89-112)."""
        wav_file.setframerate(self.config.sample_rate)
        wav_file.setsampwidth(2)
        wav_file.setnchannels(1)
        for chunk in self.synthesize_stream_raw(text, syn=syn, stats=stats):
            wav_file.writeframes(chunk)

    # ------------------------------------------------------------------
    # Warmup
    # ------------------------------------------------------------------

    def warmup(
        self,
        batch_sizes=(1,),
        max_phoneme_bucket: Optional[int] = None,
        *,
        full: bool = False,
        max_frame_bucket: Optional[int] = None,
        ratio_prior: Optional[Tuple[float, float]] = (2.6, 5.0),
        threads: int = 8,
    ):
        """Pre-compile the serving shapes.

        Default: encode per phoneme bucket (cheap, back-compatible).
        full=True warms everything a steady-state server hits: the
        heavy vocode jit per (frame bucket x power-of-two row count),
        the latents jit, the packed-transfer kernels, and — via
        `ratio_prior` — seeds the speculative frames-per-id estimator
        so even the FIRST real batch takes the zero-sync path.
        Compilations run on `threads` concurrent threads (XLA compile
        releases the GIL); results land in the persistent compilation
        cache (PIPER_TPU_CACHE), so later processes warm in seconds.
        """
        from concurrent.futures import ThreadPoolExecutor

        pbs = [
            pb for pb in self.phoneme_buckets
            if not (max_phoneme_bucket and pb > max_phoneme_bucket)
        ]
        fbs = [
            fb for fb in self.frame_buckets
            if not (max_frame_bucket and fb > max_frame_bucket)
        ]
        key0 = jax.random.PRNGKey(0)

        def enc_task(b, pb):
            b = self._round_rows(b)
            # same wire dtype as serving, or the warmed executable's
            # signature would not match the hot path's
            ids = jnp.zeros((b, pb), self._ids_wire_dtype)
            lengths = jnp.full((b,), pb, jnp.int32)
            sid = jnp.zeros((b,), jnp.int32) if self._multispeaker else None
            keys = jax.random.split(key0, b)
            enc, frames = self._encode(
                self.params, ids, lengths, jnp.float32(0.8),
                jnp.float32(1.0), keys, sid,
            )
            jax.block_until_ready(frames)
            return enc, keys, sid

        def dec_task(enc_pack, rows, fb):
            enc, keys, sid = enc_pack
            rows_idx = jnp.zeros((rows,), jnp.int32)
            audio, yl = self._decode(
                self.params, enc, rows_idx, jnp.float32(0.667),
                keys, sid, int(fb),
            )
            jax.block_until_ready(audio)
            return audio, yl

        with ThreadPoolExecutor(max_workers=threads) as ex:
            enc_futs = {
                (b, pb): ex.submit(enc_task, b, pb)
                for b in batch_sizes for pb in pbs
            }
            if not full:
                for f in enc_futs.values():
                    f.result()
                return
            # Decode shapes depend on the enc's phoneme bucket only in
            # the cheap latents jit; the heavy vocode jit sees
            # (rows x fb). Warm every power-of-two row count up to the
            # largest batch (the speculative planner splits batches
            # into such groups) at the largest pb.
            pb_max = max(pbs)
            dec_futs = []
            b_max = max(batch_sizes)
            enc_pack = enc_futs[(b_max, pb_max)].result()
            # Every power-of-two row count up to the largest batch —
            # for ALL groupings. Uniform grouping once warmed only the
            # exact batch sizes passed, but the coalescing batcher
            # serves whatever composition a window produced (e.g. 3
            # requests -> rows 4), and an unwarmed vocode shape is a
            # multi-second compile serialized onto request latency.
            rows_ladder = []
            r = self._round_rows(1)
            while r < self._round_rows(b_max):
                rows_ladder.append(r)
                r *= 2
            rows_ladder.append(self._round_rows(b_max))
            for rows in rows_ladder:
                for fb in fbs:
                    dec_futs.append(
                        ex.submit(dec_task, enc_pack, rows, fb)
                    )
            for f in enc_futs.values():
                f.result()
            audio0, yl0 = dec_futs[0].result()
            for f in dec_futs[1:]:
                f.result()
            # Packed-transfer kernels (one representative shape each;
            # further (args-shape, total) combos compile in ~0.5 s).
            r = audio0.shape[0]
            total = self._PACK_QUANTUM
            starts = jnp.zeros((r,), jnp.int32)
            mulaw = self.wire_format == "mulaw"
            jax.block_until_ready(
                (self._pack_mulaw if mulaw else self._pack)(
                    (audio0,), starts, total
                )
            )
            if self.precision != "parity":
                # pack2 (speculative self-describing transfer) only
                # exists for the fast-precision path that uses it.
                a0 = -(-(4 if mulaw else 2) * r // 128) * 128
                jax.block_until_ready(
                    (self._pack2_mulaw if mulaw else self._pack2)(
                        (audio0,), (yl0,), a0, a0 + total
                    )
                )
            if ratio_prior is not None:
                with self._ratio_lock:
                    if self._ratio is None:
                        self._ratio = ratio_prior

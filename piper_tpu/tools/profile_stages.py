"""Per-stage device-time breakdown of the serving pipeline.

Times each jitted stage (encode / latents / vocode / pack) in
isolation at the benchmark shapes, blocking on device completion —
the decomposition behind bench.py's `device_only` number, used to
target kernel work (docs/ROADMAP.md #6).

    python -m piper_tpu.tools.profile_stages [--batch 32] [--fb 768]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pb", type=int, default=512)
    ap.add_argument("--fb", type=int, default=768)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..runtime.voice import TpuVoice

    voice = TpuVoice.random(
        args.quality, num_symbols=256, seed=0, precision="fast",
        phoneme_buckets=[args.pb], frame_buckets=[args.fb],
        decode_grouping="uniform",
    )
    b = args.batch
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(3, 250, (b, args.pb)), voice._ids_wire_dtype
    )
    lengths = jnp.full((b,), args.pb, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    sid = None
    nw, ls, ns = jnp.float32(0.8), jnp.float32(1.0), jnp.float32(0.667)
    rows_idx = jnp.arange(b, dtype=jnp.int32)

    def timed(name, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        return name, dt, out

    results = {}
    _, dt, enc_out = timed(
        "encode", lambda: voice._encode(
            voice.params, ids, lengths, nw, ls, keys, sid
        )
    )
    results["encode_ms"] = round(dt * 1e3, 2)
    enc = enc_out[0]

    _, dt, lat_out = timed(
        "latents", lambda: voice._latents(
            voice.params, enc, rows_idx, ns, keys, sid, args.fb
        )
    )
    results["latents_ms"] = round(dt * 1e3, 2)
    z_p, y_mask, g, ylen = lat_out

    _, dt, audio = timed(
        "vocode", lambda: voice._vocode_nog(voice.params, z_p, y_mask, g)
    )
    results["vocode_ms"] = round(dt * 1e3, 2)

    a0 = -(-2 * b // 128) * 128
    total = a0 + (1 << 20)
    _, dt, _p = timed(
        "pack2", lambda: voice._pack2(
            (audio,), (ylen,), a0, total
        )
    )
    results["pack2_ms"] = round(dt * 1e3, 2)

    # decomposed vocode: flow reverse vs generator
    from ..models.vits import flow as F

    flow_fn = jax.jit(lambda p, z, m: F.flow_apply(
        p["flow"], z, m, cfg=voice.model_cfg, g=None, reverse=True
    ))
    _, dt, z = timed("flow", lambda: flow_fn(voice.params, z_p, y_mask))
    results["flow_reverse_ms"] = round(dt * 1e3, 2)
    results["generator_ms"] = round(
        results["vocode_ms"] - results["flow_reverse_ms"], 2
    )
    results.update(batch=b, pb=args.pb, fb=args.fb, quality=args.quality)
    results["sum_ms"] = round(
        results["encode_ms"] + results["latents_ms"]
        + results["vocode_ms"] + results["pack2_ms"], 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()

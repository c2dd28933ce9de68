"""Sharding rules: data-parallel batches, replicated (or sharded) params.

GSPMD does the partitioning: we annotate batch inputs with
P('data', ...) and parameters replicated; XLA inserts the gradient
all-reduce (psum over 'data') in the backward pass automatically —
the TPU-native replacement for the reference's Lightning/NCCL DDP
(SURVEY.md §2d).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place a host batch onto the mesh, leading axis over 'data'."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def make_sharded_train_step(cfg: ModelConfig, tx, mesh: Mesh, **step_kw):
    """jit-compiled train step with explicit input/output shardings.

    State (params + opt state) is replicated; batch is data-parallel.
    Gradients are averaged across 'data' by GSPMD's inserted psum.
    """
    from ..train.step import train_step

    rep = replicate(mesh)
    data = batch_sharding(mesh)

    def step(state, batch, rng):
        return train_step(state, batch, rng, cfg=cfg, tx=tx, **step_kw)

    return jax.jit(
        step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_sharded_scan_step(
    cfg: ModelConfig, tx, mesh: Mesh, n_steps: int, **step_kw
):
    """n_steps train steps in ONE executable (lax.scan) — one dispatch
    per n_steps instead of per step.

    Motivation (docs/BENCH_NOTES.md "Training throughput"): the GAN
    step's device time is ~1.5 ms while a single-step dispatch costs
    per-call host/link round trips; scanning K steps amortizes them
    (measured 1,070 -> 10,257 utt/s/chip on a tunneled v5e). Batches
    arrive STACKED on a leading K axis — K same-bucket-shape batches —
    with the data-parallel axis second (sharded over 'data'); keys are
    (K, 2). Returns (state, metrics) where each metric is stacked per
    inner step. The math is identical to K sequential train_step calls
    with the same batches and keys (same ops, same order).
    """
    from ..train.step import train_step

    rep = replicate(mesh)
    scan_data = NamedSharding(mesh, P(None, "data"))

    def step(state, batches, rngs):
        def body(carry, xs):
            batch, rng = xs
            carry, metrics = train_step(
                carry, batch, rng, cfg=cfg, tx=tx, **step_kw
            )
            return carry, metrics

        return jax.lax.scan(body, state, (batches, rngs))

    return jax.jit(
        step,
        in_shardings=(rep, scan_data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def stack_batches(batches, mesh: Mesh):
    """Stack K same-shape host batches on a new leading axis and place
    them for make_sharded_scan_step (K replicated, rows over 'data')."""
    s = NamedSharding(mesh, P(None, "data"))
    keys = batches[0].keys()
    return {
        k: jax.device_put(jnp.stack([jnp.asarray(b[k]) for b in batches]), s)
        for k in keys
    }


def vocode_data_parallel(
    params,
    z_p: jnp.ndarray,
    y_mask: jnp.ndarray,
    g,
    *,
    cfg: ModelConfig,
    mesh: Mesh,
    tm_interpret: bool = False,
) -> jnp.ndarray:
    """Row-parallel flow-reverse + vocoder via shard_map over 'data'.

    The serving decode uses this under a mesh so the time-major Pallas
    vocoder (generator.generator_tm_apply) runs too: pallas_call is not
    GSPMD-partitionable, but the batch rows are independent, so each
    device vocodes its own rows. For the plain XLA vocoder this is
    equivalent to the GSPMD partition (row-independent compute, no
    cross-row collectives).
    """
    from jax import shard_map

    from ..models.vits.model import synthesizer_vocode

    def local(p, zp, ym, g_loc):
        return synthesizer_vocode(
            p, zp, ym, cfg=cfg, g=g_loc, tm_interpret=tm_interpret
        )

    g_spec = P("data") if g is not None else None
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), g_spec),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(params, z_p, y_mask, g)


def make_sharded_infer(cfg: ModelConfig, mesh: Mesh, *, max_frames: int, dtype=jnp.float32):
    """Data-parallel fused inference over the mesh (batch axis sharded)."""
    from ..models.vits.model import infer

    rep = replicate(mesh)
    data = batch_sharding(mesh)

    def run(params, ids, lengths, noise_scale, length_scale, noise_w, rng):
        return infer(
            params, ids, lengths, cfg=cfg, max_frames=max_frames,
            noise_scale=noise_scale, length_scale=length_scale,
            noise_w_scale=noise_w, rng=rng, dtype=dtype,
        )

    return jax.jit(
        run,
        in_shardings=(rep, data, data, None, None, None, None),
        out_shardings=(data, data),
    )

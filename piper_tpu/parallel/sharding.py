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

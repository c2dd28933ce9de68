"""Time-axis sharded vocoding with halo exchange.

The decoder (flow reverse + HiFiGAN) is convolutional with a bounded
receptive field, so long utterances can be split across the 'model'
mesh axis along time: each chip vocodes its frame range extended by
`halo_frames` of neighbor context, exchanged over ICI with
lax.ppermute, and keeps only its own samples. With halo >= the total
receptive field the result equals the monolithic decode (up to float
reassociation). This is the TPU-native replacement for both the
reference's host-side streaming chunker
(infer_onnx_streaming.py:76-108) and the "activations exceed one
chip's HBM" case called out in SURVEY.md §2d.

Receptive field budget (frames at the flow's resolution):
  flow: 4 coupling layers x WN(4 convs, k=5, d=1) -> 4*8 = 32
  generator: conv_pre k7 (3) + per-stage transposed-conv + MRF halos
  (~10 in input frames for the reference configs)
= 45; default halo 64 gives margin for all quality presets.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig
from ..models.vits import flow as F
from ..models.vits import generator as G
from ..models.vits.model import speaker_embedding

DEFAULT_HALO_FRAMES = 64


def sharded_vocode(
    params: Dict[str, Any],
    z_p: jnp.ndarray,  # (B, T, C), T divisible by mesh axis size
    y_mask: jnp.ndarray,  # (B, T, 1)
    *,
    cfg: ModelConfig,
    mesh: Mesh,
    sid: Optional[jnp.ndarray] = None,
    halo_frames: int = DEFAULT_HALO_FRAMES,
    axis: str = "model",
) -> jnp.ndarray:
    """z_p -> waveform (B, T * upsample), T sharded over `axis`."""
    m = mesh.shape[axis]
    u = cfg.upsample_factor
    halo = halo_frames
    g = speaker_embedding(params, cfg, sid)

    def local_fn(params, z_local, mask_local, g_local):
        # z_local: (B, T/m, C) this shard's frames
        idx = lax.axis_index(axis)

        fwd = [(i, (i + 1) % m) for i in range(m)]  # send right
        bwd = [(i, (i - 1) % m) for i in range(m)]  # send left

        def fetch_left(x):
            """halo tail of the LEFT neighbor (zeros for shard 0)."""
            recv = lax.ppermute(x[:, -halo:], axis, fwd)
            return jnp.where(idx == 0, 0.0, recv)

        def fetch_right(x):
            recv = lax.ppermute(x[:, :halo], axis, bwd)
            return jnp.where(idx == m - 1, 0.0, recv)

        z_ext = jnp.concatenate(
            [fetch_left(z_local), z_local, fetch_right(z_local)], axis=1
        )
        mask_ext = jnp.concatenate(
            [fetch_left(mask_local), mask_local, fetch_right(mask_local)],
            axis=1,
        )
        z = F.flow_apply(params["flow"], z_ext, mask_ext, cfg=cfg, g=g_local,
                         reverse=True)
        from ..models.vits.model import apply_decoder

        audio = apply_decoder(params, z * mask_ext, mask_ext, cfg=cfg, g=g_local)
        return audio[:, halo * u : halo * u + z_local.shape[1] * u]

    g_spec = P() if g is not None else None
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None), g_spec),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(params, z_p, y_mask, g)

"""Pallas fused-MRF kernel vs the XLA resblock path (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits import generator as G
from piper_tpu.models.vits.generator import resblock_apply
from piper_tpu.ops.pallas.vocoder import mrf_fused, pack_stage_weights


def make_stage(cfg, c, seed):
    rng = jax.random.PRNGKey(seed)
    return [
        G.init_resblock(
            jax.random.fold_in(rng, j), c, cfg.resblock_kernel_sizes[j],
            cfg.resblock_dilation_sizes[j], cfg.resblock,
        )
        for j in range(len(cfg.resblock_kernel_sizes))
    ]


def xla_mrf(blocks, x, x_mask, cfg):
    xs = None
    for j, p in enumerate(blocks):
        r = resblock_apply(
            p, x, x_mask,
            kernel_size=cfg.resblock_kernel_sizes[j],
            dilations=cfg.resblock_dilation_sizes[j],
            resblock_type=cfg.resblock,
        )
        xs = r if xs is None else xs + r
    return xs / len(blocks)


@pytest.mark.parametrize("quality,c", [("medium", 32), ("medium", 64), ("high", 32)])
def test_mrf_fused_matches_xla(quality, c):
    cfg = ModelConfig.for_quality(quality, num_symbols=64)
    blocks = make_stage(cfg, c, seed=0)
    packed_w, packed_b = pack_stage_weights(
        blocks, cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes,
        cfg.resblock,
    )

    rng = np.random.default_rng(0)
    b, t = 2, 700  # not a multiple of the tile => exercises padding
    lengths = np.array([700, 450], np.int32)
    x = rng.standard_normal((b, t, c)).astype(np.float32) * 0.5
    mask = (np.arange(t)[None, :, None] < lengths[:, None, None]).astype(
        np.float32
    )
    x = x * mask

    ref = np.asarray(xla_mrf(blocks, jnp.asarray(x), jnp.asarray(mask), cfg))

    x_tm = jnp.asarray(x.transpose(0, 2, 1))
    out_tm = mrf_fused(
        x_tm, jnp.asarray(lengths), packed_w, packed_b,
        kernel_sizes=cfg.resblock_kernel_sizes,
        dilation_sizes=cfg.resblock_dilation_sizes,
        resblock_type=cfg.resblock,
        t_tile=256,
        interpret=True,
    )
    out = np.asarray(out_tm).transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_mrf_fused_tile_invariance():
    """Same result for different tile sizes (halo correctness)."""
    cfg = ModelConfig.for_quality("medium", num_symbols=64)
    c = 32
    blocks = make_stage(cfg, c, seed=1)
    packed_w, packed_b = pack_stage_weights(
        blocks, cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes,
        cfg.resblock,
    )
    rng = np.random.default_rng(1)
    b, t = 1, 1024
    x_tm = jnp.asarray(rng.standard_normal((b, c, t)).astype(np.float32))
    lengths = jnp.asarray([t], jnp.int32)
    outs = []
    for tile in (128, 512, 1024):
        outs.append(
            np.asarray(
                mrf_fused(
                    x_tm, lengths, packed_w, packed_b,
                    kernel_sizes=cfg.resblock_kernel_sizes,
                    dilation_sizes=cfg.resblock_dilation_sizes,
                    resblock_type=cfg.resblock,
                    t_tile=tile, interpret=True,
                )
            )
        )
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)

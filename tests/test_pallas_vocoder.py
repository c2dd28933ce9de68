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


@pytest.mark.parametrize("quality", ["medium", "high"])
def test_generator_tm_matches_xla(quality):
    """Full time-major generator (polyphase upsample + fused MRF,
    interpret mode) equals the reference-shaped XLA generator,
    including masked padded rows (generator.py fast path)."""
    from piper_tpu.models.vits import model as M
    from piper_tpu.ops import nn as tnn

    cfg = ModelConfig.for_quality(quality, num_symbols=64)
    params = M.init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    b, tf = 2, 24
    lens = jnp.asarray([24, 17], jnp.int32)
    mask = (jnp.arange(tf)[None, :] < lens[:, None]).astype(jnp.float32)[..., None]
    z = (
        jax.random.normal(jax.random.PRNGKey(1), (b, tf, cfg.inter_channels))
        * mask
    )

    ref = G.generator_apply(params["dec"], z, mask, cfg=cfg)
    tm = G.prepare_tm(params["dec"], cfg, dtype=jnp.float32)
    got = G.generator_tm_apply(
        params["dec"], tm, z, lens, cfg=cfg, interpret=True
    )
    u = cfg.upsample_factor
    # compare valid samples per row (reference zeroes padded tail via
    # masks; the tm path leaves conv_post tail bleed there)
    for i in range(b):
        n = int(lens[i]) * u
        np.testing.assert_allclose(
            np.asarray(got[i, :n]), np.asarray(ref[i, :n]),
            atol=2e-5, rtol=1e-4,
        )


def test_tconv_tm_matches_conv1d_transpose():
    from piper_tpu.ops import nn as tnn

    rng = np.random.default_rng(3)
    for (k, u, ci, co) in [(16, 8, 12, 8), (8, 4, 6, 4), (16, 8, 4, 4), (4, 2, 5, 3)]:
        kern = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((2, 20, ci)).astype(np.float32))
        ref = tnn.conv1d_transpose(x, kern, bias, stride=u, padding=(k - u) // 2)
        q0, used, idx = G._tm_phase_plan(k, u)
        w = np.zeros(used.shape + (ci, co), np.float32)
        for p in range(used.shape[0]):
            for qi in range(used.shape[1]):
                if used[p, qi]:
                    w[p, qi] = np.asarray(kern)[idx[p, qi]]
        got = G._tconv_tm(
            jnp.transpose(x, (0, 2, 1)), jnp.asarray(w), q0, used, bias
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (0, 2, 1))), np.asarray(ref),
            atol=1e-5, rtol=1e-5,
        )


@pytest.mark.parametrize(
    "u,k,c_in,c_out,rb,post,lengths",
    [
        (4, 8, 64, 32, "2", True, None),
        (4, 8, 64, 32, "2", False, None),
        (8, 16, 64, 32, "2", False, None),
        (8, 16, 32, 16, "2", True, [256 * 8, 1024, 520]),
        (2, 4, 32, 16, "1", True, None),
        (4, 8, 48, 24, "2", True, [992, 256 * 4, 4]),
        # 3*48 > 128: exercises the per-conv (non-block-stacked) path
        (4, 8, 96, 48, "2", True, [992, 256 * 4, 4]),
    ],
)
def test_fused_upsample_mrf_matches_xla(u, k, c_in, c_out, rb, post, lengths):
    """Fused stage kernel (lrelu -> polyphase tconv -> MRF [-> conv_post])
    vs the composed XLA ops, interpret mode, ragged lengths included."""
    from piper_tpu.ops import nn as tnn
    from piper_tpu.ops.pallas.vocoder import fused_upsample_mrf

    if rb == "1":
        ks = (3, 7, 11)
        ds = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    else:
        ks = (3, 5, 7)
        ds = ((1, 2), (2, 6), (3, 12))

    rng = jax.random.PRNGKey(0)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    B, V = 3, 256
    x = jax.random.normal(r1, (B, c_in, V), jnp.float32)
    lens_out = jnp.asarray(lengths if lengths else [V * u] * B, jnp.int32)
    wt_full = 0.1 * jax.random.normal(r2, (k, c_in, c_out), jnp.float32)
    bt = 0.1 * jax.random.normal(r3, (c_out,), jnp.float32)
    blocks = [
        G.init_resblock(jax.random.fold_in(r4, j), c_out, ks[j], ds[j], rb)
        for j in range(len(ks))
    ]
    wpost = 0.3 * jax.random.normal(
        jax.random.fold_in(r4, 99), (7, c_out, 1), jnp.float32
    )

    lens_in = lens_out // u
    mask_in = (
        jnp.arange(V)[None, :, None] < lens_in[:, None, None]
    ).astype(jnp.float32)

    # reference: composed XLA NWC ops
    y = jnp.transpose(x, (0, 2, 1)) * mask_in
    y = tnn.leaky_relu(y, 0.1) * mask_in
    y = tnn.conv1d_transpose(y, wt_full, bt, stride=u, padding=(k - u) // 2)
    mask = (
        jnp.arange(V * u)[None, :, None] < lens_out[:, None, None]
    ).astype(jnp.float32)
    y = y * mask
    xs = None
    for j in range(len(ks)):
        r = resblock_apply(
            blocks[j], y, mask, kernel_size=ks[j], dilations=ds[j],
            resblock_type=rb,
        )
        xs = r if xs is None else xs + r
    y = xs / len(ks)
    if post:
        y = tnn.leaky_relu(y, 0.01) * mask
        acc = jnp.zeros((B, V * u), jnp.float32)
        yp = jnp.pad(y, ((0, 0), (3, 3), (0, 0)))
        for tau in range(7):
            acc = acc + jnp.einsum(
                "btc,c->bt", yp[:, tau : tau + V * u], wpost[tau, :, 0]
            )
        ref = jnp.tanh(acc) * mask[..., 0]
    else:
        ref = jnp.transpose(y, (0, 2, 1))

    # fused kernel
    q0, used, idx = G._tm_phase_plan(k, u)
    nq = used.shape[1]
    kern = np.asarray(wt_full)
    wt = np.zeros((u, nq, c_in, c_out), np.float32)
    for p in range(u):
        for qi in range(nq):
            if used[p, qi]:
                wt[p, qi] = kern[idx[p, qi]]
    wm, bm = pack_stage_weights(blocks, ks, ds, rb, dtype=jnp.float32)
    out = fused_upsample_mrf(
        (x * jnp.transpose(mask_in, (0, 2, 1))).astype(jnp.float32),
        lens_out, jnp.asarray(wt), bt, wm, bm, wpost if post else None,
        u=u, q0=q0, kernel_sizes=ks, dilation_sizes=ds, resblock_type=rb,
        post=post, t_tile=128, interpret=True,
    )
    if post:
        vpad = out.shape[2]
        got = jnp.transpose(out, (0, 2, 1)).reshape(B, vpad * u)[:, : V * u]
    else:
        # sublane planes (B, u*C, Vpad): plane p rows hold samples u*v+p
        vpad = out.shape[2]
        o = out.reshape(B, u, c_out, vpad)
        got = jnp.transpose(o, (0, 2, 3, 1)).reshape(B, c_out, vpad * u)[
            :, :, : V * u
        ]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("rb", ["1", "2"])
def test_fused_stage_chain_matches_xla(rb):
    """Two chained fused stages (planes handoff, u_in>1 compound planes,
    conv_post in the second) vs the composed XLA two-stage path."""
    from piper_tpu.ops import nn as tnn
    from piper_tpu.ops.pallas.vocoder import fused_upsample_mrf

    if rb == "1":
        ks = (3, 7)
        ds = ((1, 3), (1, 3))
    else:
        ks = (3, 5, 7)
        ds = ((1, 2), (2, 6), (3, 12))
    stages = [
        # (u, k, c_in, c_out)
        (8, 16, 48, 32),
        (4, 8, 32, 16),
    ]
    rng = jax.random.PRNGKey(7)
    B, V = 2, 96
    lens_frames = jnp.asarray([96, 41], jnp.int32)
    x0 = jax.random.normal(rng, (B, stages[0][2], V), jnp.float32)
    mask0 = (
        jnp.arange(V)[None, None, :] < lens_frames[:, None, None]
    ).astype(jnp.float32)
    x0 = x0 * mask0

    ws = []
    for si, (u, k, c_in, c_out) in enumerate(stages):
        r = jax.random.fold_in(rng, si)
        ws.append(
            dict(
                wt=0.1 * jax.random.normal(r, (k, c_in, c_out), jnp.float32),
                bt=0.1 * jax.random.normal(
                    jax.random.fold_in(r, 1), (c_out,), jnp.float32
                ),
                blocks=[
                    G.init_resblock(
                        jax.random.fold_in(r, 10 + j), c_out, ks[j], ds[j], rb
                    )
                    for j in range(len(ks))
                ],
            )
        )
    wpost = 0.3 * jax.random.normal(
        jax.random.fold_in(rng, 99), (7, stages[1][3], 1), jnp.float32
    )

    # --- reference: composed XLA path ---
    y = jnp.transpose(x0, (0, 2, 1))
    lens = lens_frames
    for si, (u, k, c_in, c_out) in enumerate(stages):
        mask = (
            jnp.arange(y.shape[1])[None, :, None] < lens[:, None, None]
        ).astype(jnp.float32)
        y = tnn.leaky_relu(y, 0.1) * mask
        y = tnn.conv1d_transpose(
            y, ws[si]["wt"], ws[si]["bt"], stride=u, padding=(k - u) // 2
        )
        lens = lens * u
        mask = (
            jnp.arange(y.shape[1])[None, :, None] < lens[:, None, None]
        ).astype(jnp.float32)
        y = y * mask
        xs = None
        for j in range(len(ks)):
            r = resblock_apply(
                ws[si]["blocks"][j], y, mask, kernel_size=ks[j],
                dilations=ds[j], resblock_type=rb,
            )
            xs = r if xs is None else xs + r
        y = xs / len(ks)
    y = tnn.leaky_relu(y, 0.01) * mask
    T = y.shape[1]
    acc = jnp.zeros((B, T), jnp.float32)
    yp = jnp.pad(y, ((0, 0), (3, 3), (0, 0)))
    for tau in range(7):
        acc = acc + jnp.einsum(
            "btc,c->bt", yp[:, tau : tau + T], wpost[tau, :, 0]
        )
    ref = jnp.tanh(acc) * mask[..., 0]

    # --- chained fused kernels ---
    x = x0
    u_in = 1
    for si, (u, k, c_in, c_out) in enumerate(stages):
        q0, used, idx = G._tm_phase_plan(k, u)
        nq = used.shape[1]
        kern = np.asarray(ws[si]["wt"])
        wt = np.zeros((u, nq, c_in, c_out), np.float32)
        for p in range(u):
            for qi in range(nq):
                if used[p, qi]:
                    wt[p, qi] = kern[idx[p, qi]]
        wm, bm = pack_stage_weights(ws[si]["blocks"], ks, ds, rb,
                                    dtype=jnp.float32)
        post = si == len(stages) - 1
        x = fused_upsample_mrf(
            x, lens_frames * (stages[0][0] if si == 0 else
                              stages[0][0] * stages[1][0]),
            jnp.asarray(wt), ws[si]["bt"], wm, bm, wpost if post else None,
            u=u, u_in=u_in, q0=q0, kernel_sizes=ks, dilation_sizes=ds,
            resblock_type=rb, post=post, t_tile=128, interpret=True,
        )
        u_in *= u
    vpad = x.shape[2]
    got = jnp.transpose(x, (0, 2, 1)).reshape(B, vpad * u_in)[:, : V * u_in]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

"""Training step tests: losses finite, params update, parity of loss
math against the reference formulas."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from piper_tpu.config import AudioConfig, ModelConfig
from piper_tpu.train.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from piper_tpu.train.step import init_train_state, train_step


def tiny_cfg(**kw):
    return ModelConfig(
        num_symbols=40,
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=2,
        kernel_size=3,
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(4, 4),
        upsample_initial_channel=64,
        upsample_kernel_sizes=(8, 8),
        spec_channels=33,
        segment_size=256,  # 16 frames * hop 16
        audio=AudioConfig(
            sample_rate=16000, filter_length=64, hop_length=16, win_length=64,
            mel_channels=20,
        ),
        **kw,
    )


def make_batch(cfg, b=2, t_x=12, t_y=40, seed=0):
    rng = np.random.default_rng(seed)
    hop = cfg.audio.hop_length
    ids = rng.integers(0, cfg.num_symbols, (b, t_x)).astype(np.int32)
    id_lengths = np.array([t_x, t_x - 3], np.int32)
    spec = np.abs(rng.standard_normal((b, t_y, cfg.spec_channels))).astype(np.float32)
    spec_lengths = np.array([t_y, t_y - 8], np.int32)
    audio = (rng.standard_normal((b, t_y * hop)) * 0.2).astype(np.float32)
    return {
        "ids": jnp.asarray(ids),
        "id_lengths": jnp.asarray(id_lengths),
        "spec": jnp.asarray(spec),
        "spec_lengths": jnp.asarray(spec_lengths),
        "audio": jnp.asarray(audio),
    }


def test_train_step_runs_and_updates():
    cfg = tiny_cfg()
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg)

    step = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg=cfg, tx=tx),
    )
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss_gen_all", "loss_mel", "loss_dur", "loss_kl", "loss_fm",
              "loss_disc_all"):
        v = float(metrics[k])
        assert np.isfinite(v), k
    # generator params must change
    before = jax.tree.leaves(state.params_g)[0]
    after = jax.tree.leaves(state2.params_g)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert int(state2.step) == 1

    # a second step keeps losses finite
    state3, metrics3 = step(state2, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics3["loss_gen_all"]))


def test_train_step_multispeaker():
    cfg = tiny_cfg(num_speakers=3, gin_channels=16)
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg)
    batch["sid"] = jnp.asarray([0, 2], jnp.int32)
    state2, metrics = train_step(
        state, batch, jax.random.PRNGKey(1), cfg=cfg, tx=tx
    )
    assert np.isfinite(float(metrics["loss_gen_all"]))


def test_loss_parity_with_reference():
    import sys

    sys.path.insert(0, "/root/reference/src/python")
    from piper_train.vits import losses as ref_losses

    rng = np.random.default_rng(0)
    dr = [rng.standard_normal((2, 7)).astype(np.float32) for _ in range(3)]
    dg = [rng.standard_normal((2, 7)).astype(np.float32) for _ in range(3)]
    fr = [[rng.standard_normal((2, 4, 5)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]
    fg = [[rng.standard_normal((2, 4, 5)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]

    ld_ref, _, _ = ref_losses.discriminator_loss(
        [torch.from_numpy(x) for x in dr], [torch.from_numpy(x) for x in dg]
    )
    ld, _, _ = discriminator_loss([jnp.asarray(x) for x in dr], [jnp.asarray(x) for x in dg])
    np.testing.assert_allclose(float(ld), float(ld_ref), rtol=1e-6)

    lg_ref, _ = ref_losses.generator_loss([torch.from_numpy(x) for x in dg])
    lg, _ = generator_loss([jnp.asarray(x) for x in dg])
    np.testing.assert_allclose(float(lg), float(lg_ref), rtol=1e-6)

    lf_ref = ref_losses.feature_loss(
        [[torch.from_numpy(x) for x in f] for f in fr],
        [[torch.from_numpy(x) for x in f] for f in fg],
    )
    lf = feature_loss(
        [[jnp.asarray(x) for x in f] for f in fr],
        [[jnp.asarray(x) for x in f] for f in fg],
    )
    np.testing.assert_allclose(float(lf), float(lf_ref), rtol=1e-6)

    z_p = rng.standard_normal((2, 6, 11)).astype(np.float32)
    logs_q = rng.standard_normal((2, 6, 11)).astype(np.float32)
    m_p = rng.standard_normal((2, 6, 11)).astype(np.float32)
    logs_p = rng.standard_normal((2, 6, 11)).astype(np.float32)
    mask = np.ones((2, 6, 1), np.float32)
    mask[1, 4:] = 0
    lk_ref = ref_losses.kl_loss(
        torch.from_numpy(z_p.transpose(0, 2, 1)),
        torch.from_numpy(logs_q.transpose(0, 2, 1)),
        torch.from_numpy(m_p.transpose(0, 2, 1)),
        torch.from_numpy(logs_p.transpose(0, 2, 1)),
        torch.from_numpy(mask.transpose(0, 2, 1)),
    )
    lk = kl_loss(*[jnp.asarray(x) for x in (z_p, logs_q, m_p, logs_p, mask)])
    np.testing.assert_allclose(float(lk), float(lk_ref), rtol=1e-5)


def test_sdp_forward_nll_parity():
    """SDP training NLL vs reference with identical posterior noise."""
    from reference_oracle import load_reference_vits
    from piper_tpu.models.vits import duration as D
    from piper_tpu.weights.torch_loader import _SD, _convert_sdp, _fold_weight_norm

    ref = load_reference_vits()
    cfg = ModelConfig(num_symbols=130)
    torch.manual_seed(30)
    sdp = ref.models.StochasticDurationPredictor(
        cfg.hidden_channels, 192, cfg.kernel_size, 0.5, 4
    ).eval()
    sd = {k: v.detach().numpy() for k, v in sdp.state_dict().items()}
    p = _convert_sdp(_SD(_fold_weight_norm(sd)), False)

    rng = np.random.default_rng(30)
    b, t = 2, 9
    x = rng.standard_normal((b, t, cfg.hidden_channels)).astype(np.float32)
    mask = np.ones((b, t, 1), np.float32)
    mask[1, 6:] = 0
    w = (rng.integers(1, 6, (b, t, 1)) * mask).astype(np.float32)
    e_q = (rng.standard_normal((b, 2, t)) * mask.transpose(0, 2, 1)).astype(np.float32)

    orig = torch.randn
    torch.randn = lambda *s, **k: torch.from_numpy(e_q.copy())
    try:
        with torch.no_grad():
            nll_ref = sdp(
                torch.from_numpy((x * mask).transpose(0, 2, 1)),
                torch.from_numpy(mask.transpose(0, 2, 1)),
                w=torch.from_numpy(w.transpose(0, 2, 1)),
            ).numpy()
    finally:
        torch.randn = orig

    # our impl draws e_q from rng; reproduce by patching jax noise via
    # monkey: pass rng whose normal we match by injecting directly
    import piper_tpu.models.vits.duration as DD

    orig_normal = jax.random.normal
    jax.random.normal = lambda key, shape, dtype=None: jnp.asarray(
        e_q.transpose(0, 2, 1)
    )
    try:
        nll = DD.sdp_forward_nll(
            p, jnp.asarray(x * mask), jnp.asarray(mask), jnp.asarray(w),
            cfg=cfg, g=None, rng=jax.random.PRNGKey(0),
        )
    finally:
        jax.random.normal = orig_normal
    np.testing.assert_allclose(np.asarray(nll), nll_ref, atol=1e-2, rtol=1e-4)

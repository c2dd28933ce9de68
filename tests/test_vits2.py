"""VITS2 variant (arXiv:2307.16430 — beyond the reference, which is
VITS1): transformer block in the flow conditioner, adversarial duration
predictor, annealed-noise MAS, speaker-conditioned text encoder."""

import numpy as np

import jax
import jax.numpy as jnp

from piper_tpu.config import AudioConfig, ModelConfig
from piper_tpu.models.vits import flow as F
from piper_tpu.models.vits import model as M
from piper_tpu.train.step import init_train_state, train_step


def tiny_cfg(**kw) -> ModelConfig:
    base = dict(
        num_symbols=64,
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=2,
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(4, 4),
        upsample_initial_channel=64,
        upsample_kernel_sizes=(8, 8),
        spec_channels=33,
        segment_size=256,
        audio=AudioConfig(
            sample_rate=16000, filter_length=64, hop_length=16,
            win_length=64, mel_channels=20,
        ),
    )
    base.update(kw)
    return ModelConfig(**base)


def test_vits2_preset_flags():
    cfg = ModelConfig.vits2("medium", num_symbols=256, num_speakers=4)
    assert cfg.flow_transformer and cfg.use_dur_disc and cfg.mas_noise
    assert cfg.speaker_cond_encoder and cfg.gin_channels > 0
    single = ModelConfig.vits2("medium", num_symbols=256)
    assert not single.speaker_cond_encoder


def test_flow_transformer_invertible():
    """Coupling layers stay exactly invertible with the attention block
    in the conditioner (it only shapes m(x0))."""
    cfg = tiny_cfg(flow_transformer=True)
    p = F.init_flow(jax.random.PRNGKey(0), cfg)
    # zero-init post makes the flow identity at init; perturb post so the
    # inverse test is non-trivial
    p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape),
        p,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 17, cfg.inter_channels))
    mask = jnp.ones((2, 17, 1))
    y = F.flow_apply(p, x, mask, cfg=cfg, reverse=False)
    back = F.flow_apply(p, y, mask, cfg=cfg, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_vits2_infer_runs():
    cfg = tiny_cfg(
        flow_transformer=True, speaker_cond_encoder=True,
        num_speakers=3, gin_channels=16,
    )
    params = M.init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    assert "cond" in params["enc_p"]
    assert "attn" in params["flow"]["layers"][0]
    b, t = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, cfg.num_symbols)
    lengths = jnp.asarray([t, t - 5], jnp.int32)
    audio, y_len = M.infer(
        params, ids, lengths, cfg=cfg, max_frames=64,
        noise_scale=jnp.float32(0.667), length_scale=jnp.float32(1.0),
        noise_w_scale=jnp.float32(0.8),
        sid=jnp.asarray([0, 2], jnp.int32), rng=jax.random.PRNGKey(2),
    )
    assert audio.shape == (b, 64 * cfg.upsample_factor)
    assert np.all(np.isfinite(np.asarray(audio)))
    # speaker conditioning in the encoder changes the output
    audio2, _ = M.infer(
        params, ids, lengths, cfg=cfg, max_frames=64,
        noise_scale=jnp.float32(0.667), length_scale=jnp.float32(1.0),
        noise_w_scale=jnp.float32(0.8),
        sid=jnp.asarray([1, 1], jnp.int32), rng=jax.random.PRNGKey(2),
    )
    assert not np.allclose(np.asarray(audio), np.asarray(audio2))


def test_vits2_train_step():
    cfg = tiny_cfg(
        flow_transformer=True, use_dur_disc=True, mas_noise=True,
        use_sdp=True,
    )
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    assert "dur_disc" in state.params_d
    rng = np.random.default_rng(0)
    b, t_x, t_y = 2, 10, 32
    batch = {
        "ids": jnp.asarray(rng.integers(0, cfg.num_symbols, (b, t_x)), jnp.int32),
        "id_lengths": jnp.asarray([t_x, t_x - 3], jnp.int32),
        "spec": jnp.asarray(
            np.abs(rng.standard_normal((b, t_y, cfg.spec_channels))), jnp.float32
        ),
        "spec_lengths": jnp.asarray([t_y, t_y - 8], jnp.int32),
        "audio": jnp.asarray(
            rng.standard_normal((b, t_y * cfg.audio.hop_length)) * 0.1,
            jnp.float32,
        ),
    }
    state2, metrics = train_step(
        state, batch, jax.random.PRNGKey(1), cfg=cfg, tx=tx
    )
    for k in ("loss_gen_all", "loss_disc_all", "loss_dur", "loss_dur_gen"):
        assert np.isfinite(float(metrics[k])), k
    # the duration discriminator actually received gradients
    before = state.params_d["dur_disc"]["conv1"]["w"]
    after = state2.params_d["dur_disc"]["conv1"]["w"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # ...and so did the SDP. At step 0 only the spline-proj and the
    # elementwise-affine params have nonzero gradients (each ConvFlow's
    # proj is zero-initialized like the reference, so gradients to the
    # rest of the SDP switch on once proj moves).
    assert not np.allclose(
        np.asarray(state.params_g["dp"]["flows"]["conv_flows"][0]["proj"]["w"]),
        np.asarray(state2.params_g["dp"]["flows"]["conv_flows"][0]["proj"]["w"]),
    )
    assert not np.allclose(
        np.asarray(state.params_g["dp"]["flows"]["affine"]["m"]),
        np.asarray(state2.params_g["dp"]["flows"]["affine"]["m"]),
    )


def test_vits2_deterministic_dp_train_step():
    cfg = tiny_cfg(use_dur_disc=True, use_sdp=False, mas_noise=True)
    state, tx = init_train_state(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(1)
    b, t_x, t_y = 2, 8, 32
    batch = {
        "ids": jnp.asarray(rng.integers(0, cfg.num_symbols, (b, t_x)), jnp.int32),
        "id_lengths": jnp.full((b,), t_x, jnp.int32),
        "spec": jnp.asarray(
            np.abs(rng.standard_normal((b, t_y, cfg.spec_channels))), jnp.float32
        ),
        "spec_lengths": jnp.full((b,), t_y, jnp.int32),
        "audio": jnp.asarray(
            rng.standard_normal((b, t_y * cfg.audio.hop_length)) * 0.1,
            jnp.float32,
        ),
    }
    _, metrics = train_step(state, batch, jax.random.PRNGKey(4), cfg=cfg, tx=tx)
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert np.isfinite(float(metrics["loss_disc_all"]))


def test_vits2_native_roundtrip(tmp_path):
    from piper_tpu.weights.native import load_native, save_native

    cfg = tiny_cfg(flow_transformer=True)
    params = M.init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "v.npz")
    save_native(path, params, cfg)
    params2, cfg2 = load_native(path)
    assert cfg2.flow_transformer
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_vits2_serves_through_runtime():
    """A VITS2 voice runs through the batched TpuVoice pipeline."""
    from piper_tpu.config import SynthesisConfig
    from piper_tpu.runtime.voice import TpuVoice

    voice = TpuVoice.random(
        "x-low", num_symbols=64, seed=0, variant="vits2",
        phoneme_buckets=[16], frame_buckets=[32, 64],
    )
    assert voice.model_cfg.flow_transformer
    ids = [[1, 5, 9, 13, 2], [1, 7, 11, 2]]
    out = voice.synthesize_ids_batch(ids, syn=SynthesisConfig(seed=0))
    assert len(out) == 2
    for a in out:
        assert a.size > 0 and np.all(np.isfinite(a))


def test_local_attention_matches_banded_dense():
    """local_attention_apply (O(T*w) band form) equals the dense
    attention_apply under an attention mask restricted to the same
    band, for shared parameters including the rel-pos tables."""
    from piper_tpu.models.vits import encoder as E

    rng = jax.random.PRNGKey(0)
    B, T, C, H = 2, 33, 32, 2
    p = E.init_attention(rng, C, H)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, C))
    lens = jnp.asarray([T, 21], jnp.int32)
    x_mask = (jnp.arange(T)[None, :, None] < lens[:, None, None]).astype(
        jnp.float32
    )
    x = x * x_mask

    w = E.WINDOW_SIZE
    io = jnp.arange(T)
    band = (jnp.abs(io[None, :] - io[:, None]) <= w).astype(jnp.float32)
    attn_mask = (
        x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0] * band[None, None]
    )
    ref = E.attention_apply(p, x, attn_mask, n_heads=H)
    got = E.local_attention_apply(p, x, x_mask, n_heads=H)
    # compare valid rows only (invalid rows are masked downstream)
    m = np.asarray(x_mask)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(ref) * m, atol=2e-5, rtol=1e-4
    )

"""Module-level numeric parity: piper_tpu vs the reference torch VITS.

Each test instantiates a reference torch module with random weights,
converts the state dict through the weight loader, and asserts the JAX
implementation matches in eval mode.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits import duration as D
from piper_tpu.models.vits import encoder as E
from piper_tpu.models.vits import flow as F
from piper_tpu.models.vits import generator as G
from piper_tpu.models.vits import layers as L
from piper_tpu.models.vits import posterior as Q
from piper_tpu.weights.torch_loader import (
    _SD,
    _convert_ddsconv,
    _convert_flow,
    _convert_generator,
    _convert_posterior,
    _convert_sdp,
    _convert_text_encoder,
    _convert_wn,
    _fold_weight_norm,
)

from reference_oracle import load_reference_vits

CFG = ModelConfig(num_symbols=130)


def sd_of(module, fold=True):
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return _SD(_fold_weight_norm(sd) if fold else sd)


def masks(b, t, lengths):
    m = (np.arange(t)[None, :] < np.asarray(lengths)[:, None]).astype(np.float32)
    return m[..., None]  # (B, T, 1)


@pytest.fixture(scope="module")
def ref():
    return load_reference_vits()


def test_wn_parity(ref):
    torch.manual_seed(0)
    wn = ref.modules.WN(32, 5, 1, 4).eval()
    p = _convert_wn(sd_of(wn), 4)

    rng = np.random.default_rng(0)
    b, t, c = 2, 23, 32
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    mask = masks(b, t, [23, 17])
    with torch.no_grad():
        ref_out = wn(
            torch.from_numpy((x * mask).transpose(0, 2, 1)),
            torch.from_numpy(mask.transpose(0, 2, 1)),
        ).numpy().transpose(0, 2, 1)
    out = L.wn_apply(
        p, jnp.asarray(x * mask), jnp.asarray(mask), kernel_size=5, dilation_rate=1
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=1e-4)


def test_wn_parity_speaker_conditioned(ref):
    torch.manual_seed(1)
    wn = ref.modules.WN(32, 5, 1, 4, gin_channels=16).eval()
    p = _convert_wn(sd_of(wn), 4)

    rng = np.random.default_rng(1)
    b, t, c = 2, 15, 32
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    g = rng.standard_normal((b, 16)).astype(np.float32)
    mask = masks(b, t, [15, 9])
    with torch.no_grad():
        ref_out = wn(
            torch.from_numpy((x * mask).transpose(0, 2, 1)),
            torch.from_numpy(mask.transpose(0, 2, 1)),
            g=torch.from_numpy(g[:, :, None]),
        ).numpy().transpose(0, 2, 1)
    out = L.wn_apply(
        p, jnp.asarray(x * mask), jnp.asarray(mask),
        kernel_size=5, dilation_rate=1, g=jnp.asarray(g),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=1e-4)


def test_ddsconv_parity(ref):
    torch.manual_seed(2)
    dds = ref.modules.DDSConv(48, 3, 3, p_dropout=0.0).eval()
    p = _convert_ddsconv(sd_of(dds), 3)

    rng = np.random.default_rng(2)
    b, t, c = 2, 19, 48
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    mask = masks(b, t, [19, 11])
    with torch.no_grad():
        ref_out = dds(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(mask.transpose(0, 2, 1)),
        ).numpy().transpose(0, 2, 1)
    out = L.ddsconv_apply(p, jnp.asarray(x), jnp.asarray(mask), kernel_size=3)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=1e-4)


def test_text_encoder_parity(ref):
    torch.manual_seed(3)
    enc = ref.models.TextEncoder(
        CFG.num_symbols, CFG.inter_channels, CFG.hidden_channels,
        CFG.filter_channels, CFG.n_heads, CFG.n_layers, CFG.kernel_size, 0.0,
    ).eval()
    p = _convert_text_encoder(sd_of(enc), CFG)

    rng = np.random.default_rng(3)
    b, t = 2, 41
    lengths = np.array([41, 27])
    ids = rng.integers(0, CFG.num_symbols, (b, t))
    ids[1, 27:] = 0
    with torch.no_grad():
        x_ref, m_ref, logs_ref, _ = enc(
            torch.from_numpy(ids), torch.from_numpy(lengths)
        )
    mask = masks(b, t, lengths)
    x, m, logs = E.text_encoder_apply(
        p, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask), cfg=CFG
    )
    np.testing.assert_allclose(
        np.asarray(x), x_ref.numpy().transpose(0, 2, 1), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(m), m_ref.numpy().transpose(0, 2, 1), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logs), logs_ref.numpy().transpose(0, 2, 1), atol=2e-4, rtol=1e-3
    )


def test_sdp_reverse_parity(ref):
    torch.manual_seed(4)
    sdp = ref.models.StochasticDurationPredictor(
        CFG.hidden_channels, 192, CFG.kernel_size, 0.5, 4
    ).eval()
    p = _convert_sdp(sd_of(sdp), False)

    rng = np.random.default_rng(4)
    b, t = 2, 17
    lengths = [17, 12]
    x = rng.standard_normal((b, t, CFG.hidden_channels)).astype(np.float32)
    mask = masks(b, t, lengths)
    noise = rng.standard_normal((b, t, 2)).astype(np.float32)
    noise_w = 0.8

    class _FixedNoise:
        def __enter__(self):
            self.orig = torch.randn
            torch.randn = lambda *s, **k: torch.from_numpy(
                noise.transpose(0, 2, 1).copy()
            )
            return self

        def __exit__(self, *a):
            torch.randn = self.orig

    with torch.no_grad(), _FixedNoise():
        logw_ref = sdp(
            torch.from_numpy((x * mask).transpose(0, 2, 1)),
            torch.from_numpy(mask.transpose(0, 2, 1)),
            reverse=True,
            noise_scale=noise_w,
        ).numpy().transpose(0, 2, 1)

    logw = D.sdp_reverse(
        p, jnp.asarray(x * mask), jnp.asarray(mask), cfg=CFG,
        noise_w=jnp.float32(noise_w), noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(np.asarray(logw), logw_ref, atol=5e-5, rtol=1e-3)


def test_flow_parity(ref):
    torch.manual_seed(5)
    flow = ref.models.ResidualCouplingBlock(
        CFG.inter_channels, CFG.hidden_channels, 5, 1, 4
    ).eval()
    p = _convert_flow(sd_of(flow), CFG)

    rng = np.random.default_rng(5)
    b, t = 2, 29
    lengths = [29, 20]
    x = rng.standard_normal((b, t, CFG.inter_channels)).astype(np.float32)
    mask = masks(b, t, lengths)
    for reverse in (True, False):
        with torch.no_grad():
            ref_out = flow(
                torch.from_numpy((x * mask).transpose(0, 2, 1)),
                torch.from_numpy(mask.transpose(0, 2, 1)),
                reverse=reverse,
            )
        ref_np = ref_out.numpy().transpose(0, 2, 1)
        out = F.flow_apply(
            p, jnp.asarray(x * mask), jnp.asarray(mask), cfg=CFG, reverse=reverse
        )
        np.testing.assert_allclose(np.asarray(out), ref_np, atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("quality", ["medium", "high"])
def test_generator_parity(ref, quality):
    cfg = ModelConfig.for_quality(quality, num_symbols=130)
    torch.manual_seed(6)
    gen = ref.models.Generator(
        cfg.inter_channels, cfg.resblock, cfg.resblock_kernel_sizes,
        cfg.resblock_dilation_sizes, cfg.upsample_rates,
        cfg.upsample_initial_channel, cfg.upsample_kernel_sizes,
    ).eval()
    p = _convert_generator(sd_of(gen), cfg)

    rng = np.random.default_rng(6)
    b, t = 1, 13
    z = rng.standard_normal((b, t, cfg.inter_channels)).astype(np.float32)
    with torch.no_grad():
        ref_out = gen(torch.from_numpy(z.transpose(0, 2, 1))).numpy()[:, 0, :]
    out = G.generator_apply(p, jnp.asarray(z), None, cfg=cfg)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5, rtol=1e-3)


def test_generator_masked_batch_equals_solo(ref):
    """Padded batched synthesis must equal per-utterance synthesis:
    the mask threading reproduces zero-padding exactly."""
    cfg = CFG
    torch.manual_seed(7)
    gen = ref.models.Generator(
        cfg.inter_channels, cfg.resblock, cfg.resblock_kernel_sizes,
        cfg.resblock_dilation_sizes, cfg.upsample_rates,
        cfg.upsample_initial_channel, cfg.upsample_kernel_sizes,
    ).eval()
    p = _convert_generator(sd_of(gen), cfg)

    rng = np.random.default_rng(7)
    t_short, t_full = 9, 14
    z = rng.standard_normal((2, t_full, cfg.inter_channels)).astype(np.float32)
    mask = masks(2, t_full, [t_full, t_short])
    z = z * mask

    batched = np.asarray(G.generator_apply(p, jnp.asarray(z), jnp.asarray(mask), cfg=cfg))
    solo = np.asarray(
        G.generator_apply(p, jnp.asarray(z[1:2, :t_short]), None, cfg=cfg)
    )
    u = cfg.upsample_factor
    np.testing.assert_allclose(batched[1, : t_short * u], solo[0], atol=1e-5)
    np.testing.assert_allclose(batched[1, t_short * u :], 0.0, atol=0)


def test_posterior_encoder_parity(ref):
    torch.manual_seed(8)
    enc_q = ref.models.PosteriorEncoder(
        CFG.spec_channels, CFG.inter_channels, CFG.hidden_channels, 5, 1, 16
    ).eval()
    p = _convert_posterior(sd_of(enc_q), CFG)

    rng = np.random.default_rng(8)
    b, t = 2, 21
    lengths = np.array([21, 15])
    spec = rng.standard_normal((b, t, CFG.spec_channels)).astype(np.float32)
    with torch.no_grad():
        z_ref, m_ref, logs_ref, _ = enc_q(
            torch.from_numpy(spec.transpose(0, 2, 1)), torch.from_numpy(lengths)
        )
    mask = masks(b, t, lengths)
    z, m, logs = Q.posterior_encode(
        p, jnp.asarray(spec), jnp.asarray(mask), cfg=CFG, noise=None
    )
    np.testing.assert_allclose(
        np.asarray(m), m_ref.numpy().transpose(0, 2, 1), atol=2e-5, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logs), logs_ref.numpy().transpose(0, 2, 1), atol=2e-5, rtol=1e-3
    )


@pytest.mark.parametrize("t", [8, 9, 17, 64])
def test_banded_relpos_equals_padded(t):
    """The banded rel-pos skew tricks must equal the reference-shaped
    padded path exactly (encoder.py fast path)."""
    rng = np.random.default_rng(7)
    b, h, w = 2, 2, E.WINDOW_SIZE
    k = 2 * w + 1
    r9 = jnp.asarray(rng.standard_normal((b, h, t, k)).astype(np.float32))

    # Forward: band -> absolute == padded table through the 2L-1 path.
    rel_full = jnp.pad(r9, ((0, 0), (0, 0), (0, 0), (t - 1 - w, t - 1 - w)))
    np.testing.assert_allclose(
        np.asarray(E._band_to_absolute(r9, w)),
        np.asarray(E._relative_to_absolute(rel_full)),
        atol=0, rtol=0,
    )

    # Reverse: absolute -> band == the 2L-1 extraction's center columns.
    p_attn = jnp.asarray(rng.standard_normal((b, h, t, t)).astype(np.float32))
    full = E._absolute_to_relative(p_attn)  # (b, h, t, 2t-1)
    np.testing.assert_allclose(
        np.asarray(E._absolute_to_band(p_attn, w)),
        np.asarray(full[..., t - 1 - w : t + w]),
        atol=0, rtol=0,
    )


@pytest.mark.parametrize("t", [3, 12, 64])
def test_attention_banded_matches_padded_reference(t):
    """attention_apply (banded fast path) equals a reference-shaped
    implementation that pads the rel tables to 2L-1 (attentions.py
    padded path), including t < window."""
    import math as _math

    import jax

    rng = np.random.default_rng(8)
    b, c, h = 2, 48, 2
    kc = c // h
    p = E.init_attention(jax.random.PRNGKey(0), c, h)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    mask = jnp.asarray(np.ones((b, 1, t, t), np.float32))
    out_banded = E.attention_apply(p, x, mask, n_heads=h)

    # Padded-path reference (the reference's shapes, our layers).
    scale = 1.0 / _math.sqrt(kc)
    from piper_tpu.models.vits import layers as L

    q = L.dense(p["q"], x).reshape(b, t, h, kc)
    k = L.dense(p["k"], x).reshape(b, t, h, kc)
    v = L.dense(p["v"], x).reshape(b, t, h, kc)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    rel_k = E._get_relative_embeddings(p["emb_rel_k"], t)
    rel_logits = jnp.einsum(
        "bqhd,md->bhqm", q * scale, rel_k[0], preferred_element_type=jnp.float32
    )
    scores = scores + E._relative_to_absolute(rel_logits)
    scores = jnp.where(mask == 0, jnp.float32(-1e4), scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v)
    rel_v = E._get_relative_embeddings(p["emb_rel_v"], t)
    rel_w = E._absolute_to_relative(p_attn)
    out = out + jnp.einsum("bhqm,md->bqhd", rel_w, rel_v[0])
    out_padded = L.dense(p["o"], out.reshape(b, t, c))

    np.testing.assert_allclose(
        np.asarray(out_banded), np.asarray(out_padded), atol=1e-5, rtol=1e-5
    )

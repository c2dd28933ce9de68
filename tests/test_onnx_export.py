"""ONNX exporter (onnx_io): piper-compatible voices from piper_tpu.

Validation strategy (this environment has no onnxruntime): the export
is executed with the numpy interpreter (onnx_io/interp.py, written
against the ONNX operator spec) and compared against the jitted JAX
graph in deterministic mode; the initializer table is round-tripped
through weights/onnx_loader.py (the same loader that reads released
Piper voices) and compared leaf-by-leaf.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits.model import infer, init_synthesizer_params
from piper_tpu.onnx_io import export_onnx_voice
from piper_tpu.onnx_io.interp import OnnxModel, run


def tiny_cfg(**kw):
    base = dict(
        num_symbols=40,
        inter_channels=8,
        hidden_channels=16,
        filter_channels=24,
        n_heads=2,
        n_layers=2,
        kernel_size=3,
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(4, 4),
        upsample_initial_channel=16,
        upsample_kernel_sizes=(8, 8),
        spec_channels=33,
    )
    base.update(kw)
    return ModelConfig(**base)


def _compare(cfg, params, ids, lengths, *, sid=None, atol=5e-5):
    data = export_onnx_voice(params, cfg)
    model = OnnxModel(data)
    feeds = {
        "input": ids.astype(np.int64),
        "input_lengths": np.asarray(lengths, np.int64),
        "scales": np.array([0.0, 1.0, 0.0], np.float32),
    }
    if sid is not None:
        feeds["sid"] = np.asarray(sid, np.int64)
    wav_onnx = run(model, feeds)[0]

    t = ids.shape[1]
    audio, y_len = infer(
        params,
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        cfg=cfg,
        max_frames=256,
        noise_scale=jnp.float32(0.0),
        length_scale=jnp.float32(1.0),
        noise_w_scale=jnp.float32(0.0),
        sid=None if sid is None else jnp.asarray(sid, jnp.int32),
        dur_noise=jnp.zeros((ids.shape[0], t, 2), jnp.float32),
        frame_noise=jnp.zeros((ids.shape[0], 256, cfg.inter_channels)),
    )
    assert ids.shape[0] == 1, "comparison helper is batch-1"
    n = int(y_len[0]) * cfg.upsample_factor
    assert wav_onnx.shape == (1, 1, n)
    np.testing.assert_allclose(
        wav_onnx[0, 0], np.asarray(audio[0, :n]), atol=atol, rtol=0
    )
    return data


def test_export_matches_jax_sdp():
    cfg = tiny_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 9, 2, 7, 1, 3, 8, 4]], np.int64)
    _compare(cfg, params, ids, [8])


def test_export_matches_jax_padded_input():
    """Padded ids beyond input_lengths must not change the output."""
    cfg = tiny_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(1), cfg)
    ids = np.array([[5, 9, 2, 7, 1, 3, 8, 4]], np.int64)
    data1 = export_onnx_voice(params, cfg)
    model = OnnxModel(data1)
    feeds = {
        "input": ids,
        "input_lengths": np.array([8], np.int64),
        "scales": np.array([0.0, 1.0, 0.0], np.float32),
    }
    ref = run(model, feeds)[0]
    padded = np.concatenate([ids, np.zeros((1, 5), np.int64)], axis=1)
    out = run(
        model,
        {**feeds, "input": padded},
    )[0]
    np.testing.assert_allclose(out[0, 0], ref[0, 0], atol=1e-6)


def test_export_matches_jax_deterministic_dp():
    cfg = tiny_cfg(use_sdp=False)
    params = init_synthesizer_params(jax.random.PRNGKey(2), cfg)
    ids = np.array([[1, 4, 6, 2, 9, 3]], np.int64)
    _compare(cfg, params, ids, [6])


def test_export_matches_jax_multispeaker():
    cfg = tiny_cfg(num_speakers=3, gin_channels=8)
    params = init_synthesizer_params(jax.random.PRNGKey(3), cfg)
    ids = np.array([[1, 4, 6, 2, 9, 3, 5]], np.int64)
    for s in (0, 2):
        _compare(cfg, params, ids, [7], sid=[s])


def test_export_resblock1():
    cfg = tiny_cfg(
        resblock="1",
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
    )
    params = init_synthesizer_params(jax.random.PRNGKey(4), cfg)
    ids = np.array([[3, 1, 8, 2]], np.int64)
    _compare(cfg, params, ids, [4])


def test_export_random_scales_run():
    """Stochastic path executes and respects the length contract."""
    cfg = tiny_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(5), cfg)
    data = export_onnx_voice(params, cfg)
    model = OnnxModel(data)
    out = run(
        model,
        {
            "input": np.array([[5, 9, 2, 7]], np.int64),
            "input_lengths": np.array([4], np.int64),
            "scales": np.array([0.667, 1.0, 0.8], np.float32),
        },
        rng=np.random.default_rng(7),
    )[0]
    assert out.shape[0] == 1 and out.shape[1] == 1
    assert out.shape[2] % cfg.upsample_factor == 0
    assert np.all(np.abs(out) <= 1.0)


def test_export_roundtrips_through_onnx_loader(tmp_path):
    """Our own ONNX loader (the one that reads released Piper voices)
    reads the export back into an equivalent pytree."""
    from piper_tpu.weights.onnx_loader import load_onnx_voice

    cfg = tiny_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(6), cfg)
    path = tmp_path / "voice.onnx"
    export_onnx_voice(params, cfg, str(path))
    params2, cfg2 = load_onnx_voice(str(path), cfg)

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2dict = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(params2)
    }
    n_checked = 0
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        # posterior SDP flows are pruned at export; conv_flows[0] is the
        # unused flow the reverse path drops (models.py:110) — it never
        # appears in the graph, so the loader zero-fills it (exactly as
        # it does for reference exports)
        if "post_" in ks or "['conv_flows'][0]" in ks:
            continue
        assert ks in flat2dict, ks
        np.testing.assert_allclose(
            np.asarray(v, np.float32), flat2dict[ks], atol=1e-6,
            err_msg=ks,
        )
        n_checked += 1
    assert n_checked > 50


def test_state_dict_roundtrip():
    """torch_export is the exact inverse of torch_loader."""
    from piper_tpu.weights.torch_export import state_dict_from_params
    from piper_tpu.weights.torch_loader import params_from_state_dict

    cfg = tiny_cfg(num_speakers=2, gin_channels=8)
    params = init_synthesizer_params(jax.random.PRNGKey(7), cfg)
    sd = state_dict_from_params(params, cfg, inference_only=True)
    params2 = params_from_state_dict(sd, cfg)

    flat1 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(params)
    }
    flat2 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(params2)
    }
    for ks, v in flat1.items():
        if "post_" in ks:
            continue
        np.testing.assert_allclose(
            np.asarray(v, np.float32), np.asarray(flat2[ks], np.float32),
            atol=0, rtol=0, err_msg=ks,
        )


def test_spectrogram_np_matches_jax():
    """Host-side cache STFT (train/norm_audio.spectrogram_np) equals the
    device spectrogram (ops/stft.spectrogram)."""
    from piper_tpu.ops.stft import spectrogram
    from piper_tpu.train.norm_audio import spectrogram_np

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(5000).astype(np.float32) * 0.3
    ref = np.asarray(
        spectrogram(
            jnp.asarray(audio[None]), n_fft=512, hop_length=128,
            win_length=512,
        )[0]
    )
    got = spectrogram_np(audio, n_fft=512, hop_length=128, win_length=512)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_export_rejects_native_only_families():
    cfg = tiny_cfg()
    import dataclasses

    params = init_synthesizer_params(jax.random.PRNGKey(8), cfg)
    with pytest.raises(ValueError):
        export_onnx_voice(
            params, dataclasses.replace(cfg, flow_transformer=True)
        )

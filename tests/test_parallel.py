"""Mesh parallelism tests on the 8-device CPU mesh: data-parallel
train step, sharded inference, and time-sharded vocoding with halo
exchange."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.config import AudioConfig, ModelConfig
from piper_tpu.models.vits.model import (
    init_synthesizer_params,
    synthesizer_vocode,
)
from piper_tpu.parallel.mesh import make_mesh
from piper_tpu.parallel.vocoder_shard import sharded_vocode


def small_cfg():
    return ModelConfig(
        num_symbols=40,
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=1,
        resblock="2",
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (2, 6)),
        upsample_rates=(4, 4),
        upsample_initial_channel=64,
        upsample_kernel_sizes=(8, 8),
        flow_n_layers=2,
        audio=AudioConfig(sample_rate=16000),
    )


def test_sharded_vocode_matches_monolithic():
    cfg = small_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=1, model=8)

    rng = np.random.default_rng(0)
    b, t = 2, 8 * 32  # divisible by the model axis
    z_p = jnp.asarray(rng.standard_normal((b, t, cfg.inter_channels)), jnp.float32)
    y_mask = jnp.ones((b, t, 1), jnp.float32)

    ref = synthesizer_vocode(params, z_p, y_mask, cfg=cfg)

    with mesh:
        out = sharded_vocode(
            params, z_p, y_mask, cfg=cfg, mesh=mesh, halo_frames=32
        )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sharded_vocode_masked():
    """Halo exchange + masking: padded region stays zero, valid region
    matches monolithic."""
    cfg = small_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(1), cfg)
    mesh = make_mesh(data=2, model=4)

    rng = np.random.default_rng(1)
    b, t = 1, 4 * 40
    valid = 100
    z_p = jnp.asarray(rng.standard_normal((b, t, cfg.inter_channels)), jnp.float32)
    mask = (np.arange(t)[None, :, None] < valid).astype(np.float32)
    z_p = z_p * mask

    ref = synthesizer_vocode(params, z_p, jnp.asarray(mask), cfg=cfg)
    with mesh:
        out = sharded_vocode(
            params, z_p, jnp.asarray(mask), cfg=cfg, mesh=mesh, halo_frames=40
        )
    u = cfg.upsample_factor
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert np.all(np.asarray(out)[:, valid * u:] == 0)


def test_sharded_vocode_multispeaker():
    cfg = small_cfg()
    import dataclasses

    cfg = dataclasses.replace(cfg, num_speakers=3, gin_channels=8)
    params = init_synthesizer_params(jax.random.PRNGKey(2), cfg)
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(2)
    b, t = 2, 2 * 24
    z_p = jnp.asarray(rng.standard_normal((b, t, cfg.inter_channels)), jnp.float32)
    y_mask = jnp.ones((b, t, 1), jnp.float32)
    sid = jnp.asarray([0, 2], jnp.int32)
    ref = synthesizer_vocode(params, z_p, y_mask, cfg=cfg, sid=sid)
    with mesh:
        out = sharded_vocode(
            params, z_p, y_mask, cfg=cfg, mesh=mesh, sid=sid, halo_frames=24
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_mesh_voice_serving_matches_single():
    """TpuVoice with a data-parallel mesh produces identical audio to
    the unsharded voice (content-keyed noise + padded-row discard)."""
    import json

    from piper_tpu.config import SynthesisConfig, VoiceConfig
    from piper_tpu.runtime.voice import TpuVoice

    config = VoiceConfig.from_file("/root/reference/etc/test_voice.onnx.json")
    model_cfg = config.model_config()
    params = init_synthesizer_params(jax.random.PRNGKey(0), model_cfg)
    mesh = make_mesh(data=8, model=1)

    kw = dict(
        phoneme_buckets=[512], frame_buckets=[512, 1024, 2048], seed=0
    )
    voice_single = TpuVoice(params, model_cfg, config, **kw)
    voice_mesh = TpuVoice(params, model_cfg, config, mesh=mesh, **kw)

    recs = [
        json.loads(l)
        for l in open("/root/reference/etc/test_sentences/test_en-us.jsonl")
    ][:5]
    ids_list = [r["phoneme_ids"] for r in recs]
    syn = SynthesisConfig(seed=9)
    ref = voice_single.synthesize_ids_batch(ids_list, syn=syn)
    with mesh:
        out = voice_mesh.synthesize_ids_batch(ids_list, syn=syn)
    assert len(out) == 5
    for a, b in zip(out, ref):
        assert len(a) == len(b)
        np.testing.assert_allclose(a, b, atol=2e-4)


def _tiny_voice_pair(precision, mesh, frame_buckets=(256, 512)):
    """(single, mesh) TpuVoice pair over small_cfg with a text map."""
    from piper_tpu.config import InferenceDefaults, VoiceConfig
    from piper_tpu.runtime.voice import TpuVoice

    cfg = small_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    id_map = {chr(32 + i): [i] for i in range(cfg.num_symbols)}
    id_map.update({"_": [0], "^": [1], "$": [2]})
    config = VoiceConfig(
        num_symbols=cfg.num_symbols, num_speakers=1,
        sample_rate=cfg.audio.sample_rate, espeak_voice="en-us",
        inference=InferenceDefaults(), phoneme_id_map=id_map,
    )
    kw = dict(
        phoneme_buckets=[64], frame_buckets=list(frame_buckets), seed=0,
        precision=precision,
    )
    return (
        TpuVoice(params, cfg, config, **kw),
        TpuVoice(params, cfg, config, mesh=mesh, **kw),
    )


def test_mesh_voice_bf16_identical():
    """fast-precision (bf16) serving: mesh output == single-chip output
    exactly (row-independent compute; per-utterance keyed noise)."""
    from piper_tpu.config import SynthesisConfig

    mesh = make_mesh(data=8, model=1)
    single, meshed = _tiny_voice_pair("fast", mesh)
    rng = np.random.default_rng(5)
    ids_list = [
        rng.integers(3, 40, rng.integers(8, 40)).tolist() for _ in range(6)
    ]
    syn = SynthesisConfig(seed=3)
    ref = single.synthesize_ids_batch(ids_list, syn=syn)
    with mesh:
        out = meshed.synthesize_ids_batch(ids_list, syn=syn)
    for a, b in zip(out, ref):
        assert len(a) == len(b)
        np.testing.assert_array_equal(a, b)


def test_mesh_speculative_matches_exact():
    """Second batch takes the speculative zero-sync path under the mesh
    (estimator calibrated by batch one) and must byte-match batch one."""
    from piper_tpu.config import SynthesisConfig

    mesh = make_mesh(data=8, model=1)
    _, meshed = _tiny_voice_pair("fast", mesh)
    rng = np.random.default_rng(6)
    ids_list = [
        rng.integers(3, 40, rng.integers(8, 40)).tolist() for _ in range(5)
    ]
    syn = SynthesisConfig(seed=4)
    with mesh:
        first = meshed.synthesize_ids_batch(ids_list, syn=syn)
        assert meshed._ratio is not None
        handle = meshed.submit(ids_list, syn=syn)
        assert handle.get("spec") is not None, "speculative path not taken"
        second = meshed.collect(handle)
    for a, b in zip(second, first):
        np.testing.assert_array_equal(a, b)


def test_vocode_data_parallel_tm_interpret():
    """The time-major Pallas vocoder partitions across the mesh via
    shard_map (interpret mode on CPU) and matches the monolithic tm
    output."""
    from piper_tpu.models.vits.generator import prepare_tm
    from piper_tpu.parallel.sharding import vocode_data_parallel

    cfg = small_cfg()
    params = dict(init_synthesizer_params(jax.random.PRNGKey(1), cfg))
    params["dec_tm"] = prepare_tm(params["dec"], cfg, jnp.float32)
    rng = np.random.default_rng(7)
    b, t = 8, 64
    z_p = jnp.asarray(
        rng.standard_normal((b, t, cfg.inter_channels)), jnp.float32
    )
    y_mask = jnp.ones((b, t, 1), jnp.float32)

    ref = synthesizer_vocode(
        params, z_p, y_mask, cfg=cfg, tm_interpret=True
    )
    mesh = make_mesh(data=8, model=1)
    with mesh:
        out = vocode_data_parallel(
            params, z_p, y_mask, None, cfg=cfg, mesh=mesh, tm_interpret=True
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_uniform_grouping_matches_bucketed():
    """decode_grouping='uniform' (one decode shape per batch) must be
    sample-identical to 'bucketed' — counter-mode noise makes a row's
    audio independent of its decode bucket."""
    from piper_tpu.config import InferenceDefaults, SynthesisConfig, VoiceConfig
    from piper_tpu.runtime.voice import TpuVoice

    cfg = small_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    id_map = {chr(32 + i): [i] for i in range(cfg.num_symbols)}
    id_map.update({"_": [0], "^": [1], "$": [2]})
    config = VoiceConfig(
        num_symbols=cfg.num_symbols, num_speakers=1,
        sample_rate=cfg.audio.sample_rate, espeak_voice="en-us",
        inference=InferenceDefaults(), phoneme_id_map=id_map,
    )
    kw = dict(phoneme_buckets=[64], frame_buckets=[128, 256, 512], seed=0,
              precision="fast")
    bucketed = TpuVoice(params, cfg, config, **kw)
    uniform = TpuVoice(params, cfg, config, decode_grouping="uniform", **kw)
    rng = np.random.default_rng(8)
    ids_list = [
        rng.integers(3, 40, rng.integers(6, 48)).tolist() for _ in range(7)
    ]
    syn = SynthesisConfig(seed=12)
    a = bucketed.synthesize_ids_batch(ids_list, syn=syn)
    b = uniform.synthesize_ids_batch(ids_list, syn=syn)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # speculative batch in uniform mode too
    h = uniform.submit(ids_list, syn=syn)
    assert h.get("spec") is not None
    c = uniform.collect(h)
    for x, y in zip(a, c):
        np.testing.assert_array_equal(x, y)


def test_mesh_wire_mulaw_identical():
    """mu-law packed wire under a data mesh == single-chip mu-law wire
    bit-exactly (the packed buffer is all-gathered, then LUT-decoded
    host-side identically)."""
    from piper_tpu.config import SynthesisConfig

    mesh = make_mesh(data=8, model=1)
    cfg = small_cfg()
    params = init_synthesizer_params(jax.random.PRNGKey(0), cfg)
    from piper_tpu.config import InferenceDefaults, VoiceConfig
    from piper_tpu.runtime.voice import TpuVoice

    id_map = {chr(32 + i): [i] for i in range(cfg.num_symbols)}
    id_map.update({"_": [0], "^": [1], "$": [2]})
    config = VoiceConfig(
        num_symbols=cfg.num_symbols, num_speakers=1,
        sample_rate=cfg.audio.sample_rate, espeak_voice="en-us",
        inference=InferenceDefaults(), phoneme_id_map=id_map,
    )
    kw = dict(
        phoneme_buckets=[64], frame_buckets=[256, 512], seed=0,
        precision="fast", wire_format="mulaw",
    )
    single = TpuVoice(params, cfg, config, **kw)
    meshed = TpuVoice(params, cfg, config, mesh=mesh, **kw)
    rng = np.random.default_rng(11)
    ids_list = [
        rng.integers(3, 40, rng.integers(8, 40)).tolist() for _ in range(6)
    ]
    syn = SynthesisConfig(seed=7)
    ref = single.synthesize_ids_batch(ids_list, syn=syn)
    ref2 = single.synthesize_ids_batch(ids_list, syn=syn)  # speculative
    with mesh:
        out = meshed.synthesize_ids_batch(ids_list, syn=syn)
        out2 = meshed.synthesize_ids_batch(ids_list, syn=syn)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(out2, ref2):
        np.testing.assert_array_equal(a, b)


def test_scanned_train_step_matches_sequential():
    """make_sharded_scan_step(K) must produce the same state and
    metrics as K sequential make_sharded_train_step calls with the
    same batches and keys (the scan is the SAME ops in the same order,
    just one dispatch; docs/BENCH_NOTES.md 'Training throughput')."""
    import dataclasses

    from piper_tpu.config import AudioConfig
    from piper_tpu.parallel.sharding import (
        make_sharded_scan_step,
        make_sharded_train_step,
        shard_batch,
        stack_batches,
    )
    from piper_tpu.train.step import init_train_state

    cfg = dataclasses.replace(
        small_cfg(),
        spec_channels=33,
        segment_size=256,
        audio=AudioConfig(
            sample_rate=16000, filter_length=64, hop_length=16,
            win_length=64, mel_channels=20,
        ),
    )
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    K, b, t_x, t_y = 3, 4, 12, 40
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(K):
        batches.append({
            "ids": rng.integers(0, 40, (b, t_x)).astype(np.int32),
            "id_lengths": np.full((b,), t_x, np.int32),
            "spec": np.abs(
                rng.standard_normal((b, t_y, 33))
            ).astype(np.float32),
            "spec_lengths": np.full((b,), t_y, np.int32),
            "audio": (
                rng.standard_normal((b, t_y * 16)) * 0.1
            ).astype(np.float32),
        })
    keys = jax.random.split(jax.random.PRNGKey(5), K)

    with mesh:
        state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
        step = make_sharded_train_step(cfg, tx, mesh)
        seq = state
        seq_metrics = []
        for i in range(K):
            seq, m = step(
                seq, shard_batch(
                    {k: jnp.asarray(v) for k, v in batches[i].items()}, mesh
                ), keys[i],
            )
            seq_metrics.append({k: float(v) for k, v in m.items()})

        state2, tx2 = init_train_state(jax.random.PRNGKey(0), cfg)
        # snapshot before the call: the scan donates its state argument
        init_params = jax.device_get(state2.params_g)
        scan = make_sharded_scan_step(cfg, tx2, mesh, K)
        scanned, m_stack = scan(state2, stack_batches(batches, mesh), keys)

    # Same training trajectory: every inner step's losses match the
    # sequential run. Parameters are NOT compared bitwise — the scan
    # body and the standalone step are different XLA executables whose
    # fusion choices round differently, and Adam's normalized updates
    # amplify ULP-level gradient drift; the per-step loss trajectory is
    # the compilation-robust statement that both run the same math on
    # the same data and keys.
    for i in range(K):
        for k, v in seq_metrics[i].items():
            np.testing.assert_allclose(
                v, float(m_stack[k][i]), rtol=5e-3, atol=1e-4,
                err_msg=f"metric {k} at inner step {i}",
            )
    # and the scanned state is a real, finite, advanced training state
    for bb in jax.tree_util.tree_leaves(scanned.params_g):
        assert np.all(np.isfinite(np.asarray(bb)))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(bb))
        for a, bb in zip(
            jax.tree_util.tree_leaves(init_params),
            jax.tree_util.tree_leaves(scanned.params_g),
        )
    )

"""TorchScript / pickled-generator export (export_torch.py) against
the in-image reference piper_train tree.

The artifacts target the original piper_train's
infer_torchscript.py/infer_generator.py; here the reference tree
stands in for a user's piper_train install. Serialization fidelity is
asserted by running the loaded artifacts against the eager bridged
module at deterministic scales (noise_scale = noise_scale_w = 0 turns
every stochastic term off); jax<->torch numeric parity of that eager
module is covered by test_torch_roundtrip.py."""

import sys

import numpy as np
import pytest
import torch

import jax

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits.model import init_synthesizer_params

from reference_oracle import REF_PY


@pytest.fixture(scope="module", autouse=True)
def _piper_train_on_path():
    if REF_PY not in sys.path:
        sys.path.insert(0, REF_PY)
    yield


def _inputs(cfg, t=37, seed=5):
    rng = np.random.default_rng(seed)
    ids = torch.from_numpy(
        rng.integers(0, cfg.num_symbols, (1, t)).astype(np.int64)
    )
    lengths = torch.LongTensor([t])
    sid = torch.LongTensor([0])
    # Deterministic: zero both noise scales.
    return (ids, lengths, sid, torch.FloatTensor([0.0]),
            torch.FloatTensor([1.0]), torch.FloatTensor([0.0]))


@pytest.fixture(scope="module")
def xlow_voice():
    cfg = ModelConfig.for_quality("x-low", num_symbols=130)
    params = init_synthesizer_params(jax.random.PRNGKey(7), cfg)
    return params, cfg


def test_torchscript_export_roundtrip(xlow_voice, tmp_path):
    from piper_tpu.export_torch import build_reference_generator, \
        export_torchscript

    params, cfg = xlow_voice
    out = tmp_path / "voice.ts"
    export_torchscript(params, cfg, str(out))

    loaded = torch.jit.load(str(out))
    args = _inputs(cfg)
    with torch.no_grad():
        got = loaded(*args)[0]

    eager = build_reference_generator(params, cfg)
    with torch.no_grad():
        want = eager.infer(
            args[0], args[1], sid=None, noise_scale=0.0,
            length_scale=1.0, noise_scale_w=0.0,
        )[0]

    assert got.shape == want.shape
    np.testing.assert_allclose(
        got.numpy(), want.numpy(), atol=1e-6, rtol=0
    )
    # Determinism at zero noise: a second run is bit-identical.
    with torch.no_grad():
        again = loaded(*args)[0]
    assert torch.equal(got, again)


def test_generator_export_roundtrip(xlow_voice, tmp_path):
    from piper_tpu.export_torch import build_reference_generator, \
        export_generator

    params, cfg = xlow_voice
    out = tmp_path / "generator.pt"
    export_generator(params, cfg, str(out))

    loaded = torch.load(str(out), weights_only=False)
    args = _inputs(cfg, t=23, seed=9)
    with torch.no_grad():
        got = loaded(args[0], args[1], None, 0.0, 1.0, 0.0)[0]
        want = build_reference_generator(params, cfg).infer(
            args[0], args[1], sid=None, noise_scale=0.0,
            length_scale=1.0, noise_scale_w=0.0,
        )[0]
    np.testing.assert_allclose(got.numpy(), want.numpy(), atol=1e-6, rtol=0)


def test_cli_format_torchscript(xlow_voice, tmp_path):
    from piper_tpu.export import main as export_main
    from piper_tpu.weights.native import save_native

    params, cfg = xlow_voice
    npz = tmp_path / "voice.npz"
    save_native(str(npz), params, cfg)

    out = tmp_path / "cli_voice.ts"
    export_main(["--input", str(npz), "--format", "torchscript",
                 "--output", str(out)])
    loaded = torch.jit.load(str(out))
    with torch.no_grad():
        audio = loaded(*_inputs(cfg, t=19, seed=1))[0]
    assert audio.numel() > 0


def test_unrepresentable_architectures_rejected(tmp_path):
    from piper_tpu.export_torch import check_exportable

    with pytest.raises(ValueError, match="mb_istft"):
        check_exportable(ModelConfig.mb_istft(num_symbols=64))
    with pytest.raises(ValueError, match="VITS2"):
        check_exportable(ModelConfig.vits2("x-low", num_symbols=64))

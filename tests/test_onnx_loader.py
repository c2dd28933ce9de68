"""ONNX voice loading: parse a real torch.onnx export (produced by the
reference's own export pathway) and verify the loaded params generate
identical audio to the checkpoint-loaded params."""

import warnings

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits.model import infer
from piper_tpu.weights.onnx_loader import load_onnx_voice, read_onnx_initializers
from piper_tpu.weights.torch_loader import params_from_state_dict

from reference_oracle import make_ref_synthesizer

CFG = ModelConfig(num_symbols=130)


@pytest.fixture(scope="module")
def onnx_export(tmp_path_factory):
    """Export the reference model to ONNX exactly like export_onnx.py
    (weight norm removed from dec, forward := infer, opset 15,
    constant folding)."""
    path = tmp_path_factory.mktemp("onnx") / "voice.onnx"
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    # serialization-only shim: _add_onnxscript_fn needs the `onnx`
    # package only to inject custom functions (we have none)
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        model = make_ref_synthesizer(CFG, seed=42)
        # Emulate a trained voice: perturb every parameter so no two
        # tensors are identical (torch.onnx deduplicates identical
        # initializers — fresh-init LayerNorm ones/zeros would collapse,
        # which never happens for trained weights). Also exercises the
        # folded exp(-logs) recovery with non-zero EA logs.
        torch.manual_seed(7)
        with torch.no_grad():
            for p_ in model.parameters():
                p_.add_(0.01 * torch.randn_like(p_))
        model.dec.remove_weight_norm()

        def fwd(text, text_lengths, scales, sid=None):
            return model.infer(
                text, text_lengths, noise_scale=scales[0],
                length_scale=scales[1], noise_scale_w=scales[2], sid=sid,
            )[0]

        sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
        model.forward = fwd
        dummy = (
            torch.randint(0, 130, (1, 50)),
            torch.LongTensor([50]),
            torch.FloatTensor([0.667, 1.0, 0.8]),
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            torch.onnx.export(
                model, dummy, str(path), opset_version=15,
                do_constant_folding=True,
                input_names=["input", "input_lengths", "scales"],
                output_names=["output"],
                dynamic_axes={
                    "input": {0: "batch", 1: "phonemes"},
                    "input_lengths": {0: "batch"},
                    "output": {0: "batch", 1: "time"},
                },
                dynamo=False,
            )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return path, sd


def test_onnx_initializers_parse(onnx_export):
    path, sd = onnx_export
    init = read_onnx_initializers(str(path))
    assert "enc_p.emb.weight" in init
    np.testing.assert_allclose(
        init["enc_p.emb.weight"], sd["enc_p.emb.weight"].numpy(), atol=0
    )


def test_onnx_voice_matches_checkpoint(onnx_export):
    path, sd = onnx_export
    params_onnx, cfg = load_onnx_voice(str(path))
    assert cfg.num_symbols == 130
    assert cfg.hidden_channels == CFG.hidden_channels
    assert cfg.upsample_rates == CFG.upsample_rates

    params_ckpt = params_from_state_dict(sd, CFG)

    # EA logs recovered from the folded exp(-logs) constant
    np.testing.assert_allclose(
        np.asarray(params_onnx["dp"]["flows"]["affine"]["logs"]),
        np.asarray(params_ckpt["dp"]["flows"]["affine"]["logs"]),
        atol=1e-6,
    )

    rng = np.random.default_rng(0)
    b, t = 1, 30
    ids = jnp.asarray(rng.integers(0, 130, (b, t)).astype(np.int32))
    lengths = jnp.asarray(np.array([t], np.int32))
    key = jax.random.PRNGKey(5)

    kw = dict(
        cfg=CFG, max_frames=192, noise_scale=jnp.float32(0.667),
        length_scale=jnp.float32(1.0), noise_w_scale=jnp.float32(0.8), rng=key,
    )
    audio_o, len_o = infer(params_onnx, ids, lengths, **kw)
    audio_c, len_c = infer(params_ckpt, ids, lengths, **kw)
    assert int(len_o[0]) == int(len_c[0])
    np.testing.assert_allclose(
        np.asarray(audio_o), np.asarray(audio_c), atol=1e-5
    )

"""Export the reference torch VITS to real ONNX with torch's own
exporter — an *independent graph producer* for onnx_io.interp.

This closes the circularity the round-1 review flagged (exports were
only checked against the repo's own writer): the reference's export
path (export_onnx.py:41-101 — eval, dec.remove_weight_norm, patched
forward=infer, opset 15, dynamic axes) is reproduced on the reference
torch modules, serialized by torch.onnx (the TorchScript exporter's
C++ proto serializer), and executed by our interpreter. The only
repo-owned component in that leg is the executor, which the same tests
also drive on our own exported graphs — one executor, two producers.

torch.onnx needs the `onnx` python package only for a post-step that
inlines custom onnxscript functions (none exist for standard models);
this environment has no `onnx`, so that step is patched to a
passthrough.
"""

import io

import numpy as np
import torch

from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

_orig_add_fn = onnx_proto_utils._add_onnxscript_fn


def _passthrough(model_bytes, custom_opsets):
    return model_bytes


def export_reference_onnx(model, num_symbols: int, *, multispeaker=False,
                          example_t: int = 20) -> bytes:
    """Reference export semantics (export_onnx.py:41-101) on a
    SynthesizerTrn instance; returns ONNX bytes. Mutates `model`
    (weight norm removed), so extract state_dicts first."""
    model.eval()
    model.dec.remove_weight_norm()

    def infer_forward(text, text_lengths, scales, sid=None):
        noise_scale = scales[0]
        length_scale = scales[1]
        noise_scale_w = scales[2]
        audio = model.infer(
            text, text_lengths,
            noise_scale=noise_scale,
            length_scale=length_scale,
            noise_scale_w=noise_scale_w,
            sid=sid,
        )[0]
        return audio

    model.forward = infer_forward

    rng = np.random.default_rng(0)
    ids = torch.from_numpy(
        rng.integers(0, num_symbols, (1, example_t)).astype(np.int64)
    )
    lengths = torch.full((1,), example_t, dtype=torch.int64)
    scales = torch.tensor([0.667, 1.0, 0.8], dtype=torch.float32)
    args = (ids, lengths, scales)
    input_names = ["input", "input_lengths", "scales"]
    dynamic_axes = {
        "input": {0: "batch_size", 1: "phonemes"},
        "input_lengths": {0: "batch_size"},
        "output": {0: "batch_size", 1: "time"},
    }
    if multispeaker:
        args = args + (torch.zeros(1, dtype=torch.int64),)
        input_names.append("sid")

    buf = io.BytesIO()
    onnx_proto_utils._add_onnxscript_fn = _passthrough
    try:
        with torch.no_grad():
            torch.onnx.export(
                model, args, buf,
                opset_version=15, dynamo=False,
                input_names=input_names, output_names=["output"],
                dynamic_axes=dynamic_axes,
            )
    finally:
        onnx_proto_utils._add_onnxscript_fn = _orig_add_fn
    return buf.getvalue()

"""TorchScript / pickled-generator export for TPU-trained voices.

Counterpart of the reference's export_torchscript.py and
export_generator.py (src/python/piper_train/export_torchscript.py:40-71,
export_generator.py:35-48): both reference tools materialize the torch
generator from a Lightning checkpoint, strip weight norm, rebind
forward=infer, and serialize — torch.jit.trace for TorchScript,
torch.save for the pickled module.

Here the voice *originates* in JAX, so the torch module is built the
other way around: instantiate the reference ``SynthesizerTrn``
architecture (from the user's installed ``piper_train`` — the same
package the artifact is destined for) and load our parameters through
the jax->torch state-dict bridge (weights/torch_export.py, weight-norm
(g, v) reconstruction). The result runs under the original
piper_train's infer_torchscript.py / infer_generator.py unchanged.

Gating: ``piper_train`` (and torch) must be importable. Consumers of
these artifacts are by definition piper_train users, so the dependency
is inherent to the format, not an implementation shortcut. The Cython
``monotonic_align`` extension is only needed for *training*; if the
installed piper_train lacks the compiled extension, a stub that raises
on use is installed so the inference-only export still works.

Only reference-representable architectures export: HiFiGAN vocoder,
no VITS2 extensions (the reference SynthesizerTrn has no flow
transformer / duration discriminator / MB-iSTFT head).
"""

from __future__ import annotations

import logging
import sys
import types
from typing import Any, Dict

import numpy as np

from .config import ModelConfig

_LOGGER = logging.getLogger("piper_tpu.export_torch")

Params = Dict[str, Any]


def _import_piper_train_vits():
    """Import the installed piper_train.vits, tolerating a missing
    compiled monotonic_align (training-only; never called on the
    inference path that these exports trace)."""
    try:
        import piper_train.vits  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "TorchScript/generator export needs the `piper_train` "
            "package (the destination runtime for these artifacts): "
            f"{e}"
        ) from e

    name = "piper_train.vits.monotonic_align"
    if name not in sys.modules:
        try:
            import importlib

            importlib.import_module(name)
        except ImportError:
            mod = types.ModuleType(name)

            def maximum_path(*a, **k):
                raise NotImplementedError(
                    "monotonic_align (Cython) is not built in this "
                    "piper_train install; it is only needed for "
                    "training, not for export/inference"
                )

            mod.maximum_path = maximum_path
            sys.modules[name] = mod

    from piper_train.vits import models

    return models


def check_exportable(cfg: ModelConfig) -> None:
    """Reject architectures the reference SynthesizerTrn cannot
    represent."""
    problems = []
    if cfg.vocoder != "hifigan":
        problems.append(f"vocoder={cfg.vocoder!r} (reference is HiFiGAN)")
    for flag in ("flow_transformer", "use_dur_disc", "speaker_cond_encoder"):
        if getattr(cfg, flag):
            problems.append(f"{flag}=True (VITS2 extension)")
    if problems:
        raise ValueError(
            "architecture not representable by the reference torch "
            "SynthesizerTrn: " + ", ".join(problems)
        )


def build_reference_generator(params: Params, cfg: ModelConfig):
    """Reference SynthesizerTrn in inference form, carrying `params`.

    eval + dec.remove_weight_norm + forward=infer — the exact module
    state both reference exporters serialize
    (export_torchscript.py:44-50, export_generator.py:41-47)."""
    import torch

    from .weights.torch_export import to_torch_state_dict

    check_exportable(cfg)
    models = _import_piper_train_vits()

    model = models.SynthesizerTrn(
        n_vocab=cfg.num_symbols,
        spec_channels=cfg.spec_channels,
        segment_size=cfg.segment_size // cfg.audio.hop_length,
        inter_channels=cfg.inter_channels,
        hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        kernel_size=cfg.kernel_size,
        p_dropout=cfg.p_dropout,
        resblock=cfg.resblock,
        resblock_kernel_sizes=cfg.resblock_kernel_sizes,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        n_speakers=cfg.num_speakers,
        gin_channels=cfg.gin_channels,
        use_sdp=cfg.use_sdp,
    )
    model.eval()

    sd = to_torch_state_dict(params, cfg, set(model.state_dict().keys()))
    # Non-strict: the posterior encoder / SDP posterior flows exist
    # only in training params; their (torch-initialized) values are
    # dead weight on the inference path.
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False,
    )

    with torch.no_grad():
        model.dec.remove_weight_norm()
    model.forward = model.infer
    return model


def export_torchscript(params: Params, cfg: ModelConfig, output: str) -> None:
    """torch.jit.trace of the generator (reference
    export_torchscript.py:52-71 trace semantics: seed 1234, length-50
    dummy ids, sid 0, the three scale scalars)."""
    import torch

    torch.manual_seed(1234)
    model = build_reference_generator(params, cfg)

    t = 50
    sequences = torch.randint(0, cfg.num_symbols, (1, t), dtype=torch.long)
    dummy = (
        sequences,
        torch.LongTensor([t]),
        torch.LongTensor([0]),
        torch.FloatTensor([0.667]),
        torch.FloatTensor([1.0]),
        torch.FloatTensor([0.8]),
    )
    with torch.no_grad():
        jitted = torch.jit.trace(model, dummy)
    torch.jit.save(jitted, str(output))
    _LOGGER.info("Saved TorchScript model to %s", output)


def export_generator(params: Params, cfg: ModelConfig, output: str) -> None:
    """Pickled inference generator (reference export_generator.py:
    torch.save of the eval/no-weight-norm/forward=infer module)."""
    import torch

    model = build_reference_generator(params, cfg)
    torch.save(model, str(output))
    _LOGGER.info("Exported model to %s", output)

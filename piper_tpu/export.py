"""Voice export CLI.

Counterpart of the reference exporters (export_onnx.py,
export_torchscript.py, export_generator.py): converts any loadable
voice/checkpoint into
  - the native .npz artifact + voice JSON sidecar (the long-term
    serving format of this framework), or
  - a piper-compatible .onnx (--format onnx, onnx_io/graph.py): same
    input/output contract as the reference export (export_onnx.py:
    88-101), so voices trained here run under the original piper
    runtimes (onnxruntime C++/Python), or
  - a TorchScript trace / pickled torch generator (--format
    torchscript|generator, export_torch.py): the reference
    export_torchscript.py / export_generator.py artifacts, runnable
    under piper_train's infer_torchscript/infer_generator (requires
    piper_train importable).

Usage:
  python -m piper_tpu.export --input epoch=...ckpt --config config.json \
      --output voice.npz
  python -m piper_tpu.export --input en_US-lessac-medium.onnx \
      --output voice.npz          # config auto-found at <input>.json
  python -m piper_tpu.export --input voice.npz --format onnx \
      --output voice.onnx         # deploy back into the piper ecosystem
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
from pathlib import Path

_LOGGER = logging.getLogger("piper_tpu.export")


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help=".ckpt (piper_train Lightning), .onnx (piper voice), "
                        "or .npz")
    p.add_argument("--config", help="Voice JSON config (default: <input>.json)")
    p.add_argument("--output", required=True, help="Output path")
    p.add_argument("--format", choices=("npz", "onnx", "torchscript",
                                        "generator"), default="npz",
                   help="Output artifact: native .npz (default), a "
                        "piper-compatible .onnx, a TorchScript trace "
                        "(.ts, needs piper_train importable), or a "
                        "pickled torch generator (.pt, ditto)")
    p.add_argument("--include-posterior", action="store_true",
                   help="Keep the posterior encoder (needed for voice "
                        "conversion; .ckpt inputs only)")
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    from .weights.native import save_native

    input_path = Path(args.input)
    suffix = input_path.suffix.lower()
    if suffix == ".ckpt":
        from .weights.torch_loader import load_torch_checkpoint

        params, cfg = load_torch_checkpoint(
            str(input_path), include_posterior=args.include_posterior
        )
    elif suffix == ".onnx":
        from .config import VoiceConfig
        from .weights.onnx_loader import load_onnx_voice

        base_cfg = None
        cfg_path = args.config or f"{input_path}.json"
        if Path(cfg_path).exists():
            base_cfg = VoiceConfig.from_file(cfg_path).model_config()
        params, cfg = load_onnx_voice(str(input_path), base_cfg)
    elif suffix == ".npz":
        from .weights.native import load_native

        params, cfg = load_native(str(input_path))
    else:
        raise SystemExit(f"unsupported input format: {input_path}")

    if args.format == "onnx":
        from .onnx_io import export_onnx_voice

        export_onnx_voice(params, cfg, args.output)
    elif args.format == "torchscript":
        from .export_torch import export_torchscript

        export_torchscript(params, cfg, args.output)
    elif args.format == "generator":
        from .export_torch import export_generator

        export_generator(params, cfg, args.output)
    else:
        save_native(args.output, params, cfg)
    _LOGGER.info("Wrote %s", args.output)

    # Copy/derive the voice JSON sidecar next to the output.
    out_cfg = Path(f"{args.output}.json")
    src_cfg = Path(args.config) if args.config else Path(f"{input_path}.json")
    if src_cfg.exists():
        shutil.copyfile(src_cfg, out_cfg)
        _LOGGER.info("Wrote %s", out_cfg)
    else:
        _LOGGER.warning(
            "No voice JSON config found at %s — write one next to the "
            "output for serving (phoneme_id_map etc.)", src_cfg,
        )


if __name__ == "__main__":
    main()

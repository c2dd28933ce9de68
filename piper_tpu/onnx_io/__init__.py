"""ONNX interchange for piper_tpu voices.

- `writer`: dependency-free ONNX protobuf serializer + graph builder.
- `graph`: emits the VITS inference graph (piper runtime contract:
  inputs input/input_lengths/scales[/sid], output (B, 1, T_samples) —
  reference export_onnx.py:88-101) from a piper_tpu params pytree, so
  voices trained here run under the original piper runtimes
  (onnxruntime C++/Python).
- `interp`: numpy interpreter for the op subset `graph` emits —
  offline validation (this environment has no onnxruntime) and a
  pure-CPU reference executor.
"""

from .graph import export_onnx_voice  # noqa: F401
